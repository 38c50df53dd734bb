"""Vehicle-zoo smoke tests: every model builds a p2p problem, cold-solves to
feasibility, and its trajectory hits (or approaches) the target."""

import numpy as np
import jax.numpy as jnp
import pytest

from omg_tools_tpu import (Holonomic, Holonomic1D, Holonomic3D,
                           HolonomicOrient, Dubins, Quadrotor, Environment,
                           Obstacle, Circle, Square, Rectangle, Cube, Sphere,
                           Point2point)

pytestmark = pytest.mark.slow


def cold_solve(problem, vehicle):
    problem.set_options({"verbose": 0})
    problem.init()
    tr = problem.transcription
    problem.initialize(0.0)
    vehicle.predict(0.0, 0.1, 0.01, enforce_states=True)
    problem.reinitialize()
    st = problem._solver(jnp.asarray(problem._x_result),
                         jnp.asarray(problem.pack_parameters(0.0)),
                         *tr.bounds(0.0))
    problem._x_result = np.asarray(st.x)
    problem.store(0.0, 0.1, 0.01)
    return st, vehicle.trajectories["state"]


def test_holonomic1d():
    veh = Holonomic1D()
    veh.set_initial_conditions([-1.5])
    veh.set_terminal_conditions([2.0])
    env = Environment(room={"shape": Rectangle(5.0, 0.5)})
    st, S = cold_solve(Point2point(veh, env), veh)
    assert float(st.feas) < 1e-5
    np.testing.assert_allclose(S[0, -1], 2.0, atol=5e-2)


def test_holonomic_orient():
    veh = HolonomicOrient()
    veh.set_initial_conditions([-1.5, -1.5, 0.0])
    veh.set_terminal_conditions([2.0, 2.0, np.pi / 4])
    env = Environment(room={"shape": Square(5.0)})
    env.add_obstacle(Obstacle({"position": [0.5, 0.0]}, shape=Circle(0.3)))
    st, S = cold_solve(Point2point(veh, env), veh)
    assert float(st.feas) < 1e-5
    np.testing.assert_allclose(S[2, -1], np.pi / 4, atol=5e-2)
    np.testing.assert_allclose(S[1, -1], 2.0, atol=0.3)


def test_dubins_freeT():
    veh = Dubins(bounds={"vmax": 0.7, "wmax": np.pi / 3,
                         "wmin": -np.pi / 3})
    veh.define_knots(knot_intervals=5)
    veh.set_initial_conditions([0.0, 0.0, 0.0])
    veh.set_terminal_conditions([3.0, 3.0, 0.0])
    env = Environment(room={"shape": Square(5.0), "position": [1.5, 1.5]})
    env.add_obstacle(Obstacle({"position": [1.0, 1.0]}, shape=Circle(0.5)))
    problem = Point2point(veh, env, freeT=True)
    st, S = cold_solve(problem, veh)
    assert float(st.feas) < 1e-5
    np.testing.assert_allclose(S[:2, -1], [3.0, 3.0], atol=5e-2)
    T = float(problem.get_variables(problem, "T")[0])
    assert 6.0 < T < 15.0
    d = np.linalg.norm(S[:2] - np.array([1.0, 1.0])[:, None], axis=0)
    assert d.min() > 0.58


def test_quadrotor():
    veh = Quadrotor(0.2)
    veh.set_initial_conditions([-2.0, -2.0])
    veh.set_terminal_conditions([2.0, 2.0])
    env = Environment(room={"shape": Square(5.0)})
    env.add_obstacle(Obstacle({"position": [0.0, -0.4]}, shape=Circle(0.4)))
    st, S = cold_solve(Point2point(veh, env), veh)
    assert float(st.feas) < 1e-5
    np.testing.assert_allclose(S[:2, -1], [2.0, 2.0], atol=5e-2)
    # thrust bounds hold along the trajectory
    u1 = veh.trajectories["input"][0]
    assert u1.min() > 1.9 and u1.max() < 15.2


def test_holonomic3d():
    veh = Holonomic3D()
    veh.set_initial_conditions([-1.5, -1.5, -1.5])
    veh.set_terminal_conditions([1.5, 1.5, 1.5])
    env = Environment(room={"shape": Cube(5.0)})
    env.add_obstacle(Obstacle({"position": [0.0, 0.0, 0.0]},
                              shape=Sphere(0.5)))
    st, S = cold_solve(Point2point(veh, env), veh)
    assert float(st.feas) < 1e-5
    d = np.linalg.norm(S, axis=0)
    assert d.min() > 0.58
    np.testing.assert_allclose(S[2, -1], 1.5, atol=0.1)
