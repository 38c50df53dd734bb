"""ADMM formation of Dubins vehicles
(reference examples/formation_dubins.py)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
from omg_tools_tpu import (Dubins, Fleet, Environment, Obstacle, Circle,
                           Square, RegularPolyhedron, FormationPoint2point,
                           Simulator)
from _smoke import run

N = 3
vehicles = [Dubins(bounds={"vmax": 1.0, "wmax": np.pi / 6,
                           "wmin": -np.pi / 6}) for _ in range(N)]
fleet = Fleet(vehicles)
configuration = RegularPolyhedron(0.2, N, np.pi).vertices.T
init_positions = np.array([-0.5, -1.5]) + configuration
terminal_positions = np.array([0.5, 1.5]) + configuration
fleet.set_configuration(configuration.tolist())
fleet.set_initial_conditions(
    np.c_[init_positions, (np.pi / 2) * np.ones(N)].tolist())
fleet.set_terminal_conditions(
    np.c_[terminal_positions, (np.pi / 2) * np.ones(N)].tolist())
environment = Environment(room={"shape": Square(5.0)})
problem = FormationPoint2point(fleet, environment,
                               options={"horizon_time": 10, "rho": 1.0})
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("formation_dubins: centers",
      [np.round(v.signals["pose"][:2, -1], 2) for v in vehicles])
