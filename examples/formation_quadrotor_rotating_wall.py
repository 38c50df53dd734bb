"""Quadrotor formation passing a revolving beam between two fixed beams
(reference examples/formation_quadrotor_rotating_wall.py)."""
import os, sys
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Quadrotor, Fleet, Environment, Obstacle, Beam,
                           Square, RegularPolyhedron, FormationPoint2point,
                           Simulator)
from _smoke import run

N = 4
vehicles = [Quadrotor(0.2) for _ in range(N)]
fleet = Fleet(vehicles)
configuration = RegularPolyhedron(0.5, N, np.pi).vertices.T
fleet.set_configuration(configuration.tolist())
fleet.set_initial_conditions(
    [np.r_[pos, np.zeros(3)].tolist()
     for pos in (np.array([-4.0, -5.0]) + configuration)])
fleet.set_terminal_conditions((np.array([4.0, 5.0]) + configuration).tolist())

horizon_time = 5.0
environment = Environment(room={"shape": Square(12.0)})
environment.add_obstacle(Obstacle({"position": [-4.0, 0.0]},
                                  shape=Beam(width=4.0, height=0.2)))
environment.add_obstacle(Obstacle({"position": [4.0, 0.0]},
                                  shape=Beam(width=4.0, height=0.2)))
omega = 0.2 * (2 * np.pi / horizon_time)
environment.add_obstacle(Obstacle(
    {"position": [0.0, 0.0], "angular_velocity": omega},
    shape=Beam(width=3.0, height=0.2),
    options={"horizon_time": horizon_time}))

problem = FormationPoint2point(fleet, environment,
                               options={"horizon_time": horizon_time,
                                        "rho": 0.3})
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem))
print("rotating wall: finals",
      [v.signals["pose"][:2, -1] for v in vehicles][:2], "...")
