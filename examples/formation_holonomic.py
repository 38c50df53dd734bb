"""Distributed ADMM formation of holonomic vehicles
(reference examples/formation_holonomic.py)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Holonomic, Fleet, Environment, Obstacle, Circle,
                           Square, FormationPoint2point, Simulator)
from omg_tools_tpu.environment.shapes import RegularPolyhedron
from _smoke import run

N = 4
vehicles = [Holonomic() for _ in range(N)]
fleet = Fleet(vehicles)
configuration = RegularPolyhedron(0.2, N, np.pi / 4).vertices.T
fleet.set_configuration(configuration.tolist())
fleet.set_initial_conditions((np.array([-1.5, -1.5]) + configuration).tolist())
fleet.set_terminal_conditions((np.array([2.0, 2.0]) + configuration).tolist())
environment = Environment(room={"shape": Square(5.0)})
environment.add_obstacle(Obstacle({"position": [0.2, 0.2]},
                                  shape=Circle(0.3)))
problem = FormationPoint2point(fleet, environment,
                               options={"horizon_time": 10, "rho": 1.0})
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("formation_holonomic: centers",
      [v.signals["pose"][:2, -1] for v in vehicles])
