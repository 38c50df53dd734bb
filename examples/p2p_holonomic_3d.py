"""3D holonomic point-to-point (reference examples/p2p_holonomic_3d.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Holonomic3D, Environment, Obstacle, Sphere, Cube,
                           Point2point, Simulator)
from _smoke import run

vehicle = Holonomic3D()
vehicle.set_initial_conditions([-1.5, -1.5, -1.5])
vehicle.set_terminal_conditions([1.5, 1.5, 1.5])
environment = Environment(room={"shape": Cube(5.0)})
environment.add_obstacle(Obstacle({"position": [0.0, 0.0, 0.0]},
                                  shape=Sphere(0.5)))
problem = Point2point(vehicle, environment, freeT=False)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("p2p_holonomic_3d: final", vehicle.signals["pose"][:3, -1])
