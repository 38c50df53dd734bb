"""Octagonal room with general polyhedron borders
(reference examples/p2p_holonomic_octroom.py)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                           Circle, RegularPolyhedron, Point2point, Simulator)
from _smoke import run

vehicle = Holonomic(options={"safety_distance": 0.1})
vehicle.set_initial_conditions([-1.5, -1.5])
vehicle.set_terminal_conditions([1.0, 1.5])
environment = Environment(room={"shape": RegularPolyhedron(2.5, 8),
                                "draw": True})
rectangle = Rectangle(width=3.0, height=0.2)
environment.add_obstacle(Obstacle({"position": [-2.1, -0.5]}, shape=rectangle))
environment.add_obstacle(Obstacle({"position": [1.7, -0.5]}, shape=rectangle))
environment.add_obstacle(Obstacle(
    {"position": [1.5, 0.5]}, shape=Circle(0.4),
    simulation={"trajectories": {"velocity": {"time": [3.0, 4.0],
                                              "values": [[-0.15, 0.0],
                                                         [0.0, 0.15]]}}}))
problem = Point2point(vehicle, environment, freeT=False)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("p2p_holonomic_octroom: final", vehicle.signals["pose"][:2, -1])
