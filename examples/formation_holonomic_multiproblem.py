"""Formation through a field with a scripted obstacle (velocity increments
at t=3 s and 4 s), testing the ADMM loop against plant surprises
(reference examples/formation_holonomic_multiproblem.py)."""
import os, sys
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Holonomic, Fleet, Environment, Obstacle, Circle,
                           Rectangle, Square, RegularPolyhedron,
                           FormationPoint2point, Simulator)
from _smoke import run

N = 4
vehicles = [Holonomic() for _ in range(N)]
fleet = Fleet(vehicles)
configuration = RegularPolyhedron(0.2, N, np.pi / 4.0).vertices.T
fleet.set_configuration(configuration.tolist())
fleet.set_initial_conditions(
    (np.array([-1.5, -1.5]) + configuration).tolist())
fleet.set_terminal_conditions(
    (np.array([2.0, 2.0]) + configuration).tolist())

environment = Environment(room={"shape": Square(5.0)})
rectangle = Rectangle(width=3.0, height=0.2)
environment.add_obstacle(Obstacle({"position": [-2.1, -0.5]},
                                  shape=rectangle))
environment.add_obstacle(Obstacle({"position": [1.7, -0.5]},
                                  shape=rectangle))
trajectories = {"velocity": {"time": [3.0, 4.0],
                             "values": [[-0.15, 0.0], [0.0, 0.15]]}}
environment.add_obstacle(Obstacle({"position": [1.5, 0.5]},
                                  shape=Circle(0.4),
                                  simulation={"trajectories": trajectories}))

problem = FormationPoint2point(fleet, environment,
                               options={"horizon_time": 10.0, "rho": 2.0})
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("formation multiproblem: finals",
      [v.signals["pose"][:2, -1] for v in vehicles][:2], "...")
