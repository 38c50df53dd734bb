"""Planar quadrotor point-to-point (reference examples/p2p_quadrotor.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Quadrotor, Environment, Obstacle, Circle, Square,
                           Point2point, Simulator)
from _smoke import run

vehicle = Quadrotor(0.2)
vehicle.set_initial_conditions([-2.0, -2.0])
vehicle.set_terminal_conditions([2.0, 2.0])
environment = Environment(room={"shape": Square(5.0)})
environment.add_obstacle(Obstacle({"position": [0.0, -0.4]},
                                  shape=Circle(0.4)))
problem = Point2point(vehicle, environment, freeT=False)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("p2p_quadrotor: final", vehicle.signals["pose"][:2, -1])
