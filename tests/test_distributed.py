"""Distributed-layer tests: central formation, ADMM formation, rendezvous,
dual decomposition."""

import numpy as np
import jax.numpy as jnp
import pytest

from omg_tools_tpu import (Holonomic, Fleet, Environment, Obstacle, Circle,
                           Square, FormationPoint2point,
                           FormationPoint2pointCentral, RendezVous,
                           FormationPoint2pointDualDecomposition, Simulator)
from omg_tools_tpu.environment.shapes import RegularPolyhedron


def make_fleet(N=3, asym=False):
    vehicles = [Holonomic() for _ in range(N)]
    fleet = Fleet(vehicles)
    configuration = RegularPolyhedron(0.2, N, np.pi / 4).vertices.T
    init_positions = np.array([-1.5, -1.5]) + configuration
    if asym:
        init_positions = init_positions + np.arange(N)[:, None] * 0.3
    terminal_positions = np.array([2.0, 2.0]) + configuration
    fleet.set_configuration(configuration.tolist())
    fleet.set_initial_conditions(init_positions.tolist())
    fleet.set_terminal_conditions(terminal_positions.tolist())
    return fleet, vehicles


def test_formation_central():
    fleet, vehicles = make_fleet()
    env = Environment(room={"shape": Square(5.0)})
    env.add_obstacle(Obstacle({"position": [1.5, 0.5]}, shape=Circle(0.4)))
    problem = FormationPoint2pointCentral(fleet, env,
                                          options={"horizon_time": 10})
    problem.set_options({"verbose": 0})
    problem.init()
    tr = problem.transcription
    problem.initialize(0.0)
    for v in vehicles:
        v.predict(0.0, 0.1, 0.01, enforce_states=True)
    problem.reinitialize()
    st = problem._solver(jnp.asarray(problem._x_result),
                         jnp.asarray(problem.pack_parameters(0.0)),
                         *tr.bounds(0.0))
    assert float(st.feas) < 1e-4
    # centers agree along the whole solved horizon (coefficient-wise)
    problem._x_result = np.asarray(st.x)
    cfs = [problem.get_variables(v, "splines_seg0") for v in vehicles]
    centers = [c + np.asarray(v.rel_pos_c)[None, :]
               for c, v in zip(cfs, vehicles)]
    spread = np.max(np.ptp(np.stack(centers), axis=0))
    assert spread < 1e-3


def test_admm_formation_progresses():
    fleet, vehicles = make_fleet()
    env = Environment(room={"shape": Square(5.0)})
    problem = FormationPoint2point(fleet, env,
                                   options={"horizon_time": 10, "rho": 1.0})
    problem.set_options({"verbose": 0})
    problem.init()
    sim = Simulator(problem)
    for _ in range(6):
        sim.update()
    pri, dua = problem.residuals[-1]
    assert pri < 0.05
    states = np.array([v.signals["state"][:, -1] for v in vehicles])
    # fleet advanced toward the goal
    assert np.mean(states) > -1.4
    assert problem.get_interaction_error() < 0.05


def test_rendezvous_consensus():
    N = 3
    vehicles = [Holonomic() for _ in range(N)]
    fleet = Fleet(vehicles)
    configuration = RegularPolyhedron(0.2, N, np.pi / 4).vertices.T
    fleet.set_configuration(configuration.tolist())
    fleet.set_initial_conditions([[-3.0, 1.0], [0.0, -3.0], [3.0, 2.0]])
    for veh in vehicles:
        veh.set_terminal_conditions([0.0, 0.0])
    env = Environment(room={"shape": Square(8.0)})
    problem = RendezVous(fleet, env, options={"horizon_time": 10,
                                              "rho": 0.5})
    problem.set_options({"verbose": 0})
    problem.init()
    problem.initialize(0.0)
    pri0 = problem.residuals[0][0]
    pri_last = problem.residuals[-1][0]
    assert pri_last < 0.5 * pri0   # consensus converging


def test_dd_formation():
    fleet, vehicles = make_fleet(asym=True)
    env = Environment(room={"shape": Square(6.0)})
    problem = FormationPoint2pointDualDecomposition(
        fleet, env, options={"horizon_time": 10, "alpha": 0.3})
    problem.set_options({"verbose": 0})
    problem.init()
    problem.initialize(0.0)
    pris = [p for p, _ in problem.residuals]
    assert pris[-1] < pris[0] + 1e-9   # non-increasing consensus mismatch
