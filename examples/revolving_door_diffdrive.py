"""Dubins vehicle through a revolving door (two rotating beams)
(reference examples/revolving_door_diffdrive.py)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
from omg_tools_tpu import (Dubins, Environment, Obstacle, Beam, Square,
                           Point2point, Simulator)
from _smoke import run

vehicle = Dubins(bounds={"vmax": 0.7, "wmin": -30.0, "wmax": 30.0})
vehicle.define_knots(knot_intervals=6)
vehicle.set_initial_conditions([0.0, -2.0, np.pi / 2])
vehicle.set_terminal_conditions([-1.5, 2.0, np.pi / 2])
horizon_time = 15.0
environment = Environment(room={"shape": Square(5.0)})
beam1 = Beam(width=2.2, height=0.2)
environment.add_obstacle(Obstacle({"position": [-2.0, 0.0]}, shape=beam1))
environment.add_obstacle(Obstacle({"position": [2.0, 0.0]}, shape=beam1))
beam2 = Beam(width=1.4, height=0.2)
omega = 0.1 * 2 * np.pi / horizon_time
environment.add_obstacle(Obstacle(
    {"position": [0.0, 0.0], "orientation": np.pi / 4,
     "angular_velocity": omega},
    shape=beam2, options={"horizon_time": horizon_time}))
environment.add_obstacle(Obstacle(
    {"position": [0.0, 0.0], "orientation": 0.5 * np.pi + np.pi / 4,
     "angular_velocity": omega},
    shape=beam2, options={"horizon_time": horizon_time}))
problem = Point2point(vehicle, environment,
                      options={"horizon_time": horizon_time,
                               "hard_term_con": True}, freeT=False)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("revolving_door_diffdrive: final", vehicle.signals["pose"][:2, -1])
