"""Sequential goals with one vehicle: problem 2 starts from problem 1's end
state (reference examples/p2p_holonomic_multiproblem.py)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Circle, Square,
                           Point2point, Simulator)
from _smoke import run, SMOKE

vehicle = Holonomic()
vehicle.set_initial_conditions([-1.5, -1.5])
vehicle.set_terminal_conditions([0.0, 1.5])
environment = Environment(room={"shape": Square(5.0)})
environment.add_obstacle(Obstacle({"position": [-0.5, 0.0]},
                                  shape=Circle(0.4)))
problem1 = Point2point(vehicle, environment, freeT=False)
problem1.set_options({"verbose": 0})
problem1.init()
simulator = Simulator(problem1)
run(problem1, simulator)
# second task continues from the reached state
vehicle.set_initial_conditions(vehicle.signals["state"][:2, -1])
vehicle.set_terminal_conditions([2.0, -1.0])
problem2 = Point2point(vehicle, environment, freeT=False)
problem2.set_options({"verbose": 0})
problem2.init()
simulator.set_problem(problem2)
run(problem2, simulator)
print("p2p_holonomic_multiproblem: final", vehicle.signals["pose"][:2, -1])
