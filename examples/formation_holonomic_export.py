"""Export the distributed two-phase ADMM formation runtime as embedded C++
(reference examples/formation_holonomic_export.py)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Holonomic, Fleet, Environment, Square,
                           FormationPoint2point)
from omg_tools_tpu.environment.shapes import RegularPolyhedron

N = 4
vehicles = [Holonomic() for _ in range(N)]
fleet = Fleet(vehicles)
configuration = RegularPolyhedron(0.4 * np.sqrt(2), N, np.pi / 4).vertices.T
fleet.set_configuration(configuration.tolist())
fleet.set_initial_conditions(
    (np.array([-1.5, -1.5]) + configuration).tolist())
fleet.set_terminal_conditions(
    (np.array([2.0, 2.0]) + configuration).tolist())
environment = Environment(room={"shape": Square(5.0)})
problem = FormationPoint2point(fleet, environment,
                               options={"horizon_time": 10, "rho": 1.0})
problem.set_options({"verbose": 0})
problem.init()
problem.export({"directory": "export_f"}).run()
print("export written to export_f/ (build: make formation)")
