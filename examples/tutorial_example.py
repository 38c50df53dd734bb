"""The canonical 30-line user program (reference readme.md:195-229):
a holonomic vehicle crosses a room with two wall segments and one moving
circular obstacle, solved as receding-horizon spline MPC.

Set OMG_SMOKE=1 to run only a few MPC steps (CI smoke mode).
"""

import os

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                           Circle, Square, Point2point, Simulator)

SMOKE = bool(os.environ.get("OMG_SMOKE"))

vehicle = Holonomic()
vehicle.set_initial_conditions([-1.5, -1.5])
vehicle.set_terminal_conditions([2.0, 2.0])

environment = Environment(room={"shape": Square(5.0)})
environment.add_obstacle(Obstacle({"position": [-2.1, -0.5]},
                                  shape=Rectangle(width=3.0, height=0.2)))
environment.add_obstacle(Obstacle({"position": [1.7, -0.5]},
                                  shape=Rectangle(width=3.0, height=0.2)))
trajectories = {"velocity": {"time": [3.0, 4.0],
                             "values": [[-0.15, 0.0], [0.0, 0.15]]}}
environment.add_obstacle(Obstacle({"position": [1.5, 0.5]},
                                  shape=Circle(0.4),
                                  simulation={"trajectories": trajectories}))

problem = Point2point(vehicle, environment, freeT=False)
problem.set_options({"verbose": 0 if SMOKE else 2})
problem.init()

simulator = Simulator(problem)
if SMOKE:
    problem.initialize(0.0)
    for _ in range(2):
        simulator.update()
else:
    vehicle.plot("input", knots=True, labels=["v_x (m/s)", "v_y (m/s)"])
    problem.plot("scene")
    simulator.run()
    if os.environ.get("OMG_SAVE_PLOTS"):
        problem.save_movie("scene", format="gif", name="tutorial",
                           path="images/")
print("tutorial_example: final position",
      vehicle.signals["pose"][:2, -1])
