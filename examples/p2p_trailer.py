"""Dubins vehicle towing a trailer (reference examples/p2p_trailer.py)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Dubins, Trailer, Environment, Obstacle, Circle,
                           Square, Point2point, Simulator)
from _smoke import run

lead = Dubins(Circle(0.2), bounds={"vmax": 0.7, "wmax": np.pi / 3,
                                   "wmin": -np.pi / 3})
lead.set_initial_conditions([0.0, 0.0, 0.0])
lead.set_terminal_conditions([2.5, 2.5, 0.0])
vehicle = Trailer(lead_veh=lead, shapes=Circle(0.2), l_hitch=0.4)
vehicle.define_knots(knot_intervals=5)
vehicle.set_initial_conditions([0.0])
vehicle.set_terminal_conditions([0.0])
environment = Environment(room={"shape": Square(5.0), "position": [1.5, 1.5]})
problem = Point2point(vehicle, environment, freeT=True)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("p2p_trailer: final", vehicle.signals["pose"][:2, -1])
