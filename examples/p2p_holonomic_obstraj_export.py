"""Export the MPC runtime for a problem with a SPLINE-TRAJECTORY obstacle:
the obstacle's motion over the horizon is an arbitrary caller-supplied
coefficient spline, marshalled into the embedded runtime and auto-advanced
each control period (reference examples/p2p_holonomic_obstraj_export.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import numpy as np
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                           Circle, Square, Point2point)

vehicle = Holonomic(options={"safety_distance": 0.1})
vehicle.set_initial_conditions([-1.5, -1.5])
vehicle.set_terminal_conditions([2.0, 2.0])

basis = vehicle.basis
n_b = len(basis)
# drift from (1.5, 0.5) toward (0.5, 0.9) over the horizon
coeffs = np.stack([np.linspace(1.5, 0.5, n_b),
                   np.linspace(0.5, 0.9, n_b)], axis=1)

environment = Environment(room={"shape": Square(5.0)})
environment.add_obstacle(Obstacle({"position": [1.7, -0.5]},
                                  shape=Rectangle(width=3.0, height=0.2)))
obstacle = Obstacle({"position": [1.5, 0.5]}, shape=Circle(0.4))
obstacle.set_options({"spline_traj": True,
                      "spline_params": {"knots": basis.knots,
                                        "degree": basis.degree,
                                        "coeffs": coeffs}})
environment.add_obstacle(obstacle)

problem = Point2point(vehicle, environment, freeT=False)
problem.set_options({"verbose": 0})
problem.init()
problem.export(options={"directory": "export_obstraj"})
print("export written to export_obstraj/  (make obstraj && ./test_obstraj .)")
