"""Vast environment 2: long walls with offset door gaps -- the scheduler
must hop corridors through the doors (reference
examples/gui_examples/vast_environment_example2.py archetype)."""
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

gui = load_or_create("vast_environment_example2")
environment = gui.get_environment()
veh_size = 0.4
vehicle = Holonomic(shapes=Circle(radius=veh_size),
                    options={"syslimit": "norm_2"},
                    bounds={"vmax": 1.2, "vmin": -1.2,
                            "amax": 8.0, "amin": -8.0})
clicked = gui.get_clicked_positions(margin=veh_size)
vehicle.set_initial_conditions(clicked[0])
vehicle.set_terminal_conditions(clicked[1])

problem = SchedulerProblem(vehicle, environment, frame_type="corridor",
                           n_frames=2, n_cells=[40, 40])
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("vast_environment_example2: final",
      vehicle.signals["pose"][:2, -1],
      "frame switches:", problem.cnt_frame_switches)
