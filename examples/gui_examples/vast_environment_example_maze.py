"""Vast environment maze: 30x30 serpentine wall maze, the hardest
scheduler stress test the reference ships (reference
examples/gui_examples/vast_environment_example_maze.py archetype).  The
global A* path snakes through five wall gaps; corridor frames follow it
with L-shape splitting."""
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

from omg_tools_tpu import (Holonomic, Circle, SchedulerProblem,  # noqa: E402
                           Simulator)
from _environments import load_or_create  # noqa: E402
from _smoke import run  # noqa: E402

gui = load_or_create("vast_environment_example_maze")
environment = gui.get_environment()
veh_size = 0.5
vehicle = Holonomic(shapes=Circle(radius=veh_size),
                    options={"syslimit": "norm_2"},
                    bounds={"vmax": 1.5, "vmin": -1.5,
                            "amax": 8.0, "amin": -8.0})
clicked = gui.get_clicked_positions(margin=veh_size)
vehicle.set_initial_conditions(clicked[0])
vehicle.set_terminal_conditions(clicked[1])

problem = SchedulerProblem(vehicle, environment, frame_type="corridor",
                           n_frames=2, n_cells=[60, 60], slot_quantum=4)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem), n_smoke_steps=2)
print("vast_environment_example_maze: final",
      vehicle.signals["pose"][:2, -1],
      "frame switches:", problem.cnt_frame_switches)
