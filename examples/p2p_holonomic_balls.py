"""3D holonomic dodging moving spheres
(reference examples/p2p_holonomic_balls.py)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
from omg_tools_tpu import (Holonomic3D, Environment, Obstacle, Cuboid, Sphere,
                           Point2point, Simulator)
from _smoke import run

vehicle = Holonomic3D(shapes=Sphere(0.1))
vehicle.set_initial_conditions([-1.5, -1.5, 0.0])
vehicle.set_terminal_conditions([1.5, 1.5, 0.2])
environment = Environment(room={"shape": Cuboid(4.0, 4.0, 2.0),
                                "position": [0.0, 0.0, 0.5]})
environment.add_obstacle(Obstacle({"position": [0.0, 0.0, 0.4]},
                                  shape=Sphere(0.4)))
environment.add_obstacle(Obstacle(
    {"position": [1.0, 1.0, 0.2], "velocity": [-0.1, -0.1, 0.0]},
    shape=Sphere(0.3)))
problem = Point2point(vehicle, environment, freeT=False)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("p2p_holonomic_balls: final", vehicle.signals["pose"][:3, -1])
