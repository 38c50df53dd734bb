"""High-level planner tests: A* global planner, multi-frame problem,
scheduler problem, G-code pipeline (reference examples: test_multiframe.py,
schedulerproblem_example*.py, GCode_examples)."""

import numpy as np
import pytest

from omg_tools_tpu import (Holonomic, Environment, Obstacle, Circle,
                           Rectangle, Square, MultiFrameProblem,
                           SchedulerProblem, AStarPlanner, Tool, GCodeReader,
                           GCodeSchedulerProblem, Simulator)

# default tier module; individual hogs carry @pytest.mark.slow


def test_astar_avoids_obstacle():
    env = Environment(room={"shape": Square(10.0)})
    env.add_obstacle(Obstacle({"position": [0.0, 0.0]},
                              shape=Rectangle(width=0.5, height=6.0)))
    planner = AStarPlanner(env, [25, 25], [-4.0, 0.0], [4.0, 0.0],
                           vehicle_size=0.2)
    path = planner.get_path([-4.0, 0.0], [4.0, 0.0])
    assert path is not None and len(path) > 2
    path = np.asarray(path)
    # every waypoint keeps clear of the wall (|x|<0.45 band is blocked)
    on_wall = (np.abs(path[:, 0]) < 0.25) & (np.abs(path[:, 1]) < 3.0)
    assert not on_wall.any()
    assert np.allclose(path[-1], [4.0, 0.0], atol=0.5)


def test_multiframe_two_rooms():
    vehicle = Holonomic()
    vehicle.set_initial_conditions([-3.0, 0.0])
    vehicle.set_terminal_conditions([3.0, 0.0])
    env = Environment(room=[
        {"shape": Rectangle(width=5.0, height=2.0), "position": [-1.5, 0.0]},
        {"shape": Rectangle(width=5.0, height=2.0), "position": [1.5, 0.0]}])
    problem = MultiFrameProblem(vehicle, env, n_frames=2)
    problem.set_options({"verbose": 0})
    problem.init()
    problem.initialize(0.0)
    vehicle.predict(0.0, 0.1, 0.01, enforce_states=True)
    problem.reinitialize()
    problem.solve(0.0, 0.1)
    assert problem.solver_stats["feas"] < 1e-4
    problem.store(0.0, 0.1, 0.01)
    S = vehicle.trajectories["state"]
    np.testing.assert_allclose(S[:, -1], [3.0, 0.0], atol=0.1)
    # trajectory stays inside the union of the two rooms (|y| <= 1)
    assert np.max(np.abs(S[1])) < 1.05


def test_scheduler_frames_and_solve():
    vehicle = Holonomic(shapes=Circle(0.1))
    vehicle.set_initial_conditions([-4.0, -4.0])
    vehicle.set_terminal_conditions([4.0, 4.0])
    env = Environment(room={"shape": Square(10.0)})
    env.add_obstacle(Obstacle({"position": [-2.0, -2.0]},
                              shape=Circle(0.5)))
    problem = SchedulerProblem(vehicle, env, frame_size=4.0,
                               n_cells=[20, 20])
    problem.set_options({"verbose": 0})
    problem.init()
    assert problem.frames
    assert problem.frames[0].point_in_frame([-4.0, -4.0])
    sim = Simulator(problem)
    problem.initialize(0.0)
    for _ in range(2):
        sim.update()
    # progressing toward the first frame goal
    d0 = np.linalg.norm(np.array([-4.0, -4.0]) - problem.frames[0].goal)
    d1 = np.linalg.norm(vehicle.signals["state"][:2, -1]
                        - np.asarray(problem.frames[0].goal))
    assert d1 < d0


@pytest.mark.slow
def test_gcode_pipeline():
    gcode = ["G00 X0 Y0 Z0", "G01 X6 Y0 Z0", "G01 X6 Y4 Z0"]
    reader = GCodeReader()
    blocks = reader.parse(gcode)
    assert len(blocks) >= 2
    tool = Tool(tolerance=0.2)
    tool.define_knots(knot_intervals=5)
    tool.set_initial_conditions(blocks[0].start)
    problem = GCodeSchedulerProblem(tool, blocks, n_segments=2)
    problem.set_options({"verbose": 0})
    problem.init()
    sim = Simulator(problem, sample_time=0.001, update_time=0.01)
    problem.initialize(0.0)
    for _ in range(2):
        sim.update()
    # tool tracks the first segment within tolerance
    pos = tool.signals["state"][:2, -1]
    assert abs(pos[1]) < 0.25          # stays in the Y-tolerance tube
    assert problem.solver_stats["feas"] < 1e-3


@pytest.mark.slow
def test_scheduler_two_frames_corridor():
    """schedulerproblem_example2-style run: long corridor path, 2-frame
    MultiFrameProblem local problems, overlap hand-off, compiled-problem
    reuse (< 3 distinct builds)."""
    # vmax 1.0: the 11.3 m diagonal at the default 0.5 m/s per axis needs
    # >160 periods -- more than this test budget even for a perfect planner
    vehicle = Holonomic(shapes=Circle(0.1),
                        bounds={"vmax": 1.0, "amax": 2.0})
    vehicle.set_initial_conditions([-4.0, -4.0])
    vehicle.set_terminal_conditions([4.0, 4.0])
    env = Environment(room={"shape": Square(10.0)})
    env.add_obstacle(Obstacle({"position": [-2.0, 0.5]},
                              shape=Circle(0.5)))
    env.add_obstacle(Obstacle({"position": [1.5, -1.5]},
                              shape=Circle(0.5)))
    problem = SchedulerProblem(vehicle, env, frame_size=4.0, n_frames=2,
                               n_cells=[20, 20])
    problem.set_options({"verbose": 0})
    problem.init()
    assert len(problem.frames) >= 1
    sim = Simulator(problem)
    problem.initialize(0.0)
    reached = False
    for _ in range(140):
        if sim.update():
            reached = True
            break
    final = vehicle.signals["state"][:2, -1]
    dist = np.linalg.norm(final - np.array([4.0, 4.0]))
    assert reached or dist < 0.5, f"stopped {dist:.2f} m from goal"
    assert problem.cnt_problem_builds < 3, (
        f"{problem.cnt_problem_builds} problem builds -- compiled reuse "
        "regressed")


@pytest.mark.slow
def test_scheduler_moving_obstacle_membership():
    """A moving obstacle crossing into the active frame forces a frame
    rebuild mid-run (reference schedulerproblem.py:138-209 membership
    re-check), and the local problem keeps solving feasibly after it."""
    vehicle = Holonomic(shapes=Circle(0.1),
                        bounds={"vmax": 1.0, "amax": 2.0})
    vehicle.set_initial_conditions([-4.0, -4.0])
    vehicle.set_terminal_conditions([4.0, 4.0])
    env = Environment(room={"shape": Square(10.0)})
    # crosses the vehicle's corridor from the side at 0.5 m/s
    env.add_obstacle(Obstacle({"position": [-1.0, -4.0],
                               "velocity": [-0.35, 0.35]},
                              shape=Circle(0.4)))
    problem = SchedulerProblem(vehicle, env, frame_size=4.0, n_frames=2,
                               n_cells=[20, 20])
    problem.set_options({"verbose": 0})
    problem.init()
    sim = Simulator(problem)
    problem.initialize(0.0)
    switches0 = problem.cnt_frame_switches
    feas_ok = True
    for _ in range(40):
        if sim.update():
            break
        feas_ok &= problem.solver_stats.get("feas", 1.0) < 5e-2
    # the moving obstacle entered/left a frame -> at least one rebuild
    # beyond the initial construction
    assert problem.cnt_frame_switches > switches0
    assert feas_ok
    # still progressing toward the goal
    d = np.linalg.norm(vehicle.signals["state"][:2, -1]
                       - np.array([4.0, 4.0]))
    assert d < np.linalg.norm(np.array([-4.0, -4.0]) - np.array([4.0, 4.0]))


@pytest.mark.slow
def test_scheduler_maze_reaches_goal():
    """The vast-environment maze (examples/gui_examples): a serpentine
    wall maze traversed end-to-end by the corridor scheduler -- the goal
    must actually be reached (the reference's hardest scheduler scenario,
    ref examples/gui_examples/vast_environment_example_maze.py)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "gui_examples"))
    from _environments import maze_gui

    gui = maze_gui(scale=0.4, n_walls=3)   # 12x12 maze, 3 walls
    environment = gui.get_environment()
    veh_size = 0.2
    vehicle = Holonomic(shapes=Circle(radius=veh_size),
                        options={"syslimit": "norm_2"},
                        bounds={"vmax": 3.0, "vmin": -3.0,
                                "amax": 12.0, "amin": -12.0})
    # 5 knot intervals: the multiframe-NLP compile drops from ~4 min to
    # <1 min and warm solves to ~0.6 s on this 2-CPU box; the coarser
    # trajectory still threads every gap (validated end-to-end run:
    # goal reached in ~150 updates, 8 frame switches)
    vehicle.define_knots(knot_intervals=5)
    clicked = gui.get_clicked_positions(margin=veh_size)
    vehicle.set_initial_conditions(clicked[0])
    vehicle.set_terminal_conditions(clicked[1])
    # slot_quantum pads obstacle slots to ONE shared compiled signature
    # (one compile, not one per frame layout); the warm receding solves
    # get a 6x10 ALM budget instead of the 20x16 cold default
    problem = SchedulerProblem(vehicle, environment, frame_type="corridor",
                               n_frames=2, n_cells=[30, 30],
                               slot_quantum=4)
    problem.set_options({"verbose": 0,
                         "solver_options": {"outer_iter": 6,
                                            "inner_iter": 10}})
    problem.init()
    sim = Simulator(problem)
    reached = False
    for _ in range(300):
        if sim.update():
            reached = True
            break
    final = vehicle.signals["pose"][:2, -1]
    goal = np.asarray(clicked[1])
    assert reached or np.linalg.norm(final - goal) < 0.2, \
        f"maze not solved: stopped at {final}, goal {goal}, " \
        f"{problem.cnt_frame_switches} frame switches"
    # the serpentine actually forced frame hopping
    assert problem.cnt_frame_switches >= 3
