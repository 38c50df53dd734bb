"""ADMM formation of planar quadrotors
(reference examples/formation_quadrotor.py)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
from omg_tools_tpu import (Quadrotor, Fleet, Environment, Obstacle, Circle,
                           Square, FormationPoint2point, Simulator)
from _smoke import run

N = 3
vehicles = [Quadrotor(0.2) for _ in range(N)]
fleet = Fleet(vehicles)
configuration = [[0.0, -0.3], [0.45, 0.15], [-0.45, 0.15]]
init_positions = (np.array([-1.5, -1.5]) + np.asarray(configuration))
terminal_positions = (np.array([2.0, 2.0]) + np.asarray(configuration))
fleet.set_configuration(configuration)
fleet.set_initial_conditions(init_positions.tolist())
fleet.set_terminal_conditions(terminal_positions.tolist())
environment = Environment(room={"shape": Square(5.0)})
environment.add_obstacle(Obstacle({"position": [0.1, 0.3]},
                                  shape=Circle(0.3)))
problem = FormationPoint2point(fleet, environment,
                               options={"horizon_time": 5.0, "rho": 3.0})
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("formation_quadrotor: centers",
      [np.round(v.signals["pose"][:2, -1], 2) for v in vehicles])
