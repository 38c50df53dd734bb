"""AGV with trailer-style steering, free terminal time, coarse knots
(reference examples/p2p_agv2.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import AGV, Environment, Square, Point2point, Simulator
from _smoke import run

vehicle = AGV(length=0.8)
vehicle.define_knots(knot_intervals=5)
vehicle.set_initial_conditions([-1.0, -0.5, 0.0, 0.0])  # x, y, theta, delta
vehicle.set_terminal_conditions([4.0, 2.0, 0.0])

environment = Environment(room={"shape": Square(6.0),
                                "position": [1.5, 1.5]})
problem = Point2point(vehicle, environment, freeT=True)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("agv2: final", vehicle.signals["pose"][:2, -1])
