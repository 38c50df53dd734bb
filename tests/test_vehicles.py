"""Vehicle-zoo smoke tests: every model builds a p2p problem, cold-solves to
feasibility, and its trajectory hits (or approaches) the target."""

import numpy as np
import jax.numpy as jnp
import pytest

from omg_tools_tpu import (Holonomic, Holonomic1D, Holonomic3D,
                           HolonomicOrient, Dubins, Quadrotor, Environment,
                           Obstacle, Circle, Square, Rectangle, Cube, Sphere,
                           Point2point)




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


@pytest.mark.slow
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


@pytest.mark.slow
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
    veh.define_knots(knot_intervals=6)
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
    veh.define_knots(knot_intervals=6)
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


def test_bicycle_freeT():
    """Bicycle with steering-angle bounds (reference vehicles/bicycle.py:53)."""
    from omg_tools_tpu import Bicycle
    veh = Bicycle(length=0.4, bounds={"vmax": 0.8, "dmax": np.pi / 6,
                                      "dmin": -np.pi / 6})
    veh.define_knots(knot_intervals=5)
    veh.set_initial_conditions([0.0, 0.0, 0.0, 0.0])
    veh.set_terminal_conditions([3.0, 3.0, 0.0])
    env = Environment(room={"shape": Square(5.0), "position": [1.5, 1.5]})
    problem = Point2point(veh, env, freeT=True)
    st, S = cold_solve(problem, veh)
    assert float(st.feas) < 1e-5
    np.testing.assert_allclose(S[:2, -1], [3.0, 3.0], atol=5e-2)
    # steering angle stays within its bounds wherever the vehicle moves
    # (the atan-based recovery is degenerate at v ~ 0, reference
    # bicycle.py splines2signals)
    state = veh.trajectories["state"]
    speed = np.linalg.norm(np.gradient(state[:2], axis=1), axis=0)
    delta = state[3][speed > 0.2 * speed.max()]
    assert np.max(np.abs(delta)) < np.pi / 6 + 5e-2


@pytest.mark.slow
def test_agv_freeT():
    """Rear-wheel-steered AGV (reference vehicles/agv.py:50, TCST'17)."""
    from omg_tools_tpu import AGV
    veh = AGV(length=0.4)
    veh.define_knots(knot_intervals=5)
    veh.set_initial_conditions([0.0, 0.0, 0.0, 0.0])
    veh.set_terminal_conditions([3.0, 3.0, 0.0])
    env = Environment(room={"shape": Square(5.0), "position": [1.5, 1.5]})
    problem = Point2point(veh, env, freeT=True)
    st, S = cold_solve(problem, veh)
    assert float(st.feas) < 1e-5
    np.testing.assert_allclose(S[:2, -1], [3.0, 3.0], atol=5e-2)


@pytest.mark.slow
def test_trailer_freeT():
    """Trailer towed by a Dubins lead vehicle (reference
    vehicles/trailer.py:28-44): the trailer angle spline rides on the
    lead's motion; terminal condition on the hitch angle."""
    from omg_tools_tpu import Trailer, Dubins
    lead = Dubins(Circle(0.2), bounds={"vmax": 0.7, "wmax": np.pi / 3,
                                       "wmin": -np.pi / 3})
    lead.set_initial_conditions([0.0, 0.0, 0.0])
    lead.set_terminal_conditions([2.5, 2.5, 0.0])
    veh = Trailer(lead_veh=lead, shapes=Circle(0.2), l_hitch=0.4)
    veh.define_knots(knot_intervals=5)
    veh.set_initial_conditions([0.0])
    veh.set_terminal_conditions([0.0])
    env = Environment(room={"shape": Square(5.0), "position": [1.5, 1.5]})
    # the trailer NLP (relaxed hitch dynamics + integral positions + free
    # T) needs a deeper cold-solve budget than the default 20x16
    problem = Point2point(veh, env,
                          {"solver_options": {"outer_iter": 60,
                                              "inner_iter": 24}},
                          freeT=True)
    st, S = cold_solve(problem, veh)
    # the relaxed hitch-dynamics equality (eps 1e-3 band, trailer.py) keeps
    # a thin feasible set: 5e-3 scaled violation is the practical optimum
    # for a 60x24 cold solve (the scipy reference needs minutes here)
    assert float(st.feas) < 5e-3
    # lead reaches its goal (rows 3:5 of the combined trailer state are
    # the lead position; the lead is not simulated separately)
    lead_pos = S[3:5, -1]
    np.testing.assert_allclose(lead_pos, [2.5, 2.5], atol=3e-1)


def test_tool_gcode_segment():
    """CNC tool inside a tolerance tube (reference vehicles/tool.py:27-120):
    one straight G-code segment, velocity/acceleration/jerk-bounded."""
    from omg_tools_tpu import Tool, GCodeReader, GCodeProblem
    from omg_tools_tpu.problems.gcodeproblem import (blocks_to_segments,
                                                     split_ring_segments)
    reader = GCodeReader()
    blocks = reader.parse(["G00 X0 Y0 Z0", "G01 X4 Y0 Z0"])
    tool = Tool(tolerance=0.2)
    tool.define_knots(knot_intervals=5)
    tool.set_initial_conditions(blocks[0].start)
    tool.set_terminal_conditions(blocks[-1].end)
    segments = split_ring_segments(
        blocks_to_segments(blocks, tool.tolerance), tolerance=tool.tolerance)
    rooms = [dict(s) for s in segments]
    for room in rooms:
        room.setdefault("position", room["pose"][:2])
    local_env = Environment(room=rooms)
    problem = GCodeProblem(tool, local_env, len(rooms), {"verbose": 0})
    st, S = cold_solve(problem, tool)
    assert float(st.feas) < 1e-4
    # stays inside the Y tolerance tube and reaches the segment end
    assert np.max(np.abs(S[1])) < 0.25
    np.testing.assert_allclose(S[0, -1], 4.0, atol=1e-1)


def test_dubins_substitution_quadratic_structure():
    """The Dubins 'substitution' quadratic lift (w = tg_ha^2 + position
    splines with derivative ties, models/dubins.py) makes the whole
    transcription quadratic: the batched runner detects compact-arrow
    structure with the w lift as its own tail block, and a cold batched
    solve converges."""
    import jax
    import jax.numpy as jnp
    from omg_tools_tpu import Obstacle, Circle, Square, Environment
    vehicle = Dubins(shapes=Circle(0.1), options={"substitution": True},
                     bounds={"vmax": 0.7, "wmax": np.pi / 3.0,
                             "wmin": -np.pi / 3.0})
    vehicle.set_initial_conditions([-1.5, -1.5, 0.0])
    vehicle.set_terminal_conditions([2.0, 2.0, 0.0])
    environment = Environment(room={"shape": Square(5.0)})
    environment.add_obstacle(Obstacle({"position": [0.5, 0.2]},
                                      shape=Circle(0.4)))
    problem = Point2point(vehicle, environment, freeT=False)
    problem.set_options({"verbose": 0})
    problem.init()
    from omg_tools_tpu.problems.batch import BatchedP2PRunner
    from omg_tools_tpu.ops.alm import ALMOptions
    r = BatchedP2PRunner(problem, dtype=jnp.float32,
                         alm_options=ALMOptions(inner_iter=8))
    assert r.structure.startswith("compact-arrow"), r.structure
    ar = r.compact.arrow
    # head = splines + xs + ys; w and the hyperplane/slack blocks are tails
    assert ar.head[1] < r.tr.n_x // 2
    assert len(ar.blocks) >= 3
    x0, p0, state = r.make_batch(np.array([[-1.5, -1.5], [-1.3, -1.6]]),
                                 np.array([[2.0, 2.0], [1.8, 2.1]]))
    st = jax.jit(r.init_solver_state)(x0, p0, r.consts())
    assert float(np.max(np.asarray(st.feas))) < 5e-3
