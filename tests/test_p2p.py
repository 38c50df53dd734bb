"""End-to-end point-to-point MPC tests (the readme example configuration,
reference readme.md:195-229) -- shortened closed-loop runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                           Circle, Square, Point2point, Simulator)




def build(moving=False, obstacles=True):
    vehicle = Holonomic()
    vehicle.set_initial_conditions([-1.5, -1.5])
    vehicle.set_terminal_conditions([2.0, 2.0])
    environment = Environment(room={"shape": Square(5.0)})
    if obstacles:
        environment.add_obstacle(Obstacle(
            {"position": [-2.1, -0.5]}, shape=Rectangle(width=3.0, height=0.2)))
        environment.add_obstacle(Obstacle(
            {"position": [1.7, -0.5]}, shape=Rectangle(width=3.0, height=0.2)))
        sim = {}
        if moving:
            sim = {"trajectories": {"velocity": {
                "time": [3.0, 4.0], "values": [[-0.15, 0.0], [0.0, 0.15]]}}}
        environment.add_obstacle(Obstacle(
            {"position": [1.5, 0.5]}, shape=Circle(0.4), simulation=sim))
    problem = Point2point(vehicle, environment, freeT=False)
    problem.set_options({"verbose": 0})
    problem.init()
    return vehicle, environment, problem


def test_transcription_shapes():
    vehicle, environment, problem = build()
    tr = problem.transcription
    # 2 traj splines + 2 slack splines (13 each) + 3 obstacles x (a:2, b:1)
    # hyperplane splines (12 coeffs)
    assert tr.n_x == 4 * 13 + 3 * 3 * 11
    assert tr.n_g > 300
    assert tr.n_p > 30


def test_cold_solve_reaches_feasibility():
    vehicle, environment, problem = build()
    tr = problem.transcription
    problem.initialize(0.0)
    vehicle.predict(0.0, 0.1, 0.01, enforce_states=True)
    problem.reinitialize()
    st = problem._solver(jnp.asarray(problem._x_result),
                         jnp.asarray(problem.pack_parameters(0.0)),
                         *tr.bounds(0.0))
    assert float(st.feas) < 1e-5
    # trajectory starts at start and ends at goal (soft terminal)
    from omg_tools_tpu.ops.spline import sample_spline
    sl, shape = tr.var_slice(vehicle, "splines_seg0")
    cfs = np.asarray(st.x)[sl].reshape(shape)
    pos0 = sample_spline(vehicle.basis, cfs[:, 0], [0.0])[0]
    posT = sample_spline(vehicle.basis, cfs[:, 1], [1.0])[0]
    np.testing.assert_allclose(pos0, -1.5, atol=1e-3)
    np.testing.assert_allclose(posT, 2.0, atol=1e-2)


def test_closed_loop_short():
    """15 MPC steps: monotone progress toward the goal, no collision."""
    vehicle, environment, problem = build()
    sim = Simulator(problem)
    for _ in range(15):
        sim.update()
    S = vehicle.signals["state"]
    d_start = np.linalg.norm(S[:, 0] - vehicle.poseT)
    d_end = np.linalg.norm(S[:, -1] - vehicle.poseT)
    assert d_end < 0.9 * d_start       # clear progress in 1.5 s
    assert d_end < d_start - 0.35
    # static circle obstacle clearance (veh radius .1 + obs radius .4)
    d = np.linalg.norm(S - np.array([1.5, 0.5])[:, None], axis=0)
    assert d.min() > 0.49


def test_no_obstacles_quick_convergence():
    vehicle, environment, problem = build(obstacles=False)
    sim = Simulator(problem)
    for _ in range(12):
        sim.update()
    assert problem.solver_stats["feas"] < 1e-5
    S = vehicle.signals["state"]
    assert np.linalg.norm(S[:, -1] - vehicle.poseT) < \
        np.linalg.norm(S[:, 0] - vehicle.poseT)
