"""Warehouse navigation: rectangle grid + two moving circles, free-T
(reference examples/p2p_holonomic_warehouse.py)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                           Circle, Point2point, Simulator)
from _smoke import run

vehicle = Holonomic(options={"syslimit": "norm_2", "safety_distance": 0.1})
vehicle.define_knots(knot_intervals=10)
vehicle.set_initial_conditions([0.0, 0.0])
vehicle.set_terminal_conditions([6.0, 3.5])
environment = Environment(room={"shape": Rectangle(width=7.0, height=4.5),
                                "position": [3.0, 1.75]})
rack = Rectangle(width=1.0, height=1.0)
for pos in ([1., 1.], [3., 1.], [5., 1.], [1., 2.5], [3., 2.5], [5., 2.5]):
    environment.add_obstacle(Obstacle({"position": pos}, shape=rack))
environment.add_obstacle(Obstacle(
    {"position": [4.0, 2.5]}, shape=Circle(0.5),
    simulation={"trajectories": {"velocity": {"time": [0, 2],
                                              "values": [[0., 0.], [0., -0.1]]}}}))
environment.add_obstacle(Obstacle(
    {"position": [2.0, 1.0]}, shape=Circle(0.5),
    simulation={"trajectories": {"velocity": {"time": [0, 2],
                                              "values": [[0., 0.], [0., 0.15]]}}}))
problem = Point2point(vehicle, environment, freeT=True)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("p2p_holonomic_warehouse: final", vehicle.signals["pose"][:2, -1])
