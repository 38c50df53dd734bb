"""Holonomic vehicle with orientation spline
(reference examples/p2p_holonomic_orient.py)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (HolonomicOrient, Environment, Obstacle, Circle,
                           Square, Point2point, Simulator)
from _smoke import run

vehicle = HolonomicOrient()
vehicle.set_initial_conditions([-1.5, -1.5, 0.0])
vehicle.set_terminal_conditions([2.0, 2.0, np.pi / 4])
environment = Environment(room={"shape": Square(5.0)})
environment.add_obstacle(Obstacle({"position": [0.5, 0.0]},
                                  shape=Circle(0.3)))
problem = Point2point(vehicle, environment, freeT=False)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("p2p_holonomic_orient: final", vehicle.signals["pose"][:, -1])
