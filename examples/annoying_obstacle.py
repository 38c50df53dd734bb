"""Sinusoidally weaving obstacle simulated with a custom linear model while
the NLP keeps its constant-acceleration prediction -- prediction/plant
mismatch stress test (reference examples/annoying_obstacle.py)."""
import os, sys
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Circle,
                           Rectangle, Point2point, Simulator)
from _smoke import run

vehicle = Holonomic()
vehicle.set_options({"safety_distance": 0.2, "safety_weight": 1e2})
vehicle.set_initial_conditions([-4.0, 0.0])
vehicle.set_terminal_conditions([4.0, 0.0])

environment = Environment(room={"shape": Rectangle(width=10.0, height=5.0)})
# x drifts linearly, y oscillates: x' = A x on [pos; vel; acc]
wn = 2 * np.pi / 5.0
a1 = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
a2 = np.array([[0.0, 1.0, 0.0], [-wn ** 2, 0.0, 0.0], [0.0, 0.0, 0.0]])
s1 = np.array([[1.0, 0.0], [0.0, 0.0]])
s2 = np.array([[0.0, 0.0], [0.0, 1.0]])
A = np.kron(a1, s1) + np.kron(a2, s2)
environment.add_obstacle(Obstacle(
    {"position": [-3.5, -1.0], "velocity": [0.4, 0.0]}, shape=Circle(0.4),
    simulation={"model": {"A": A}}))

problem = Point2point(vehicle, environment, freeT=False)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("annoying_obstacle: final", vehicle.signals["pose"][:2, -1])
