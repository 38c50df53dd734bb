"""Fleet (model) parallelism: distributed-ADMM formation with vehicles
sharded over a device-mesh ring; neighbor exchange rides the interconnect
via ppermute (the reference's in-process communicate(), admm.py:468-475,
mapped onto ICI)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Holonomic, Fleet, Environment, Square,
                           FormationPoint2point)
from omg_tools_tpu.environment.shapes import RegularPolyhedron
from omg_tools_tpu.parallel.fleet_mesh import (make_mesh_dual_update,
                                               shard_fleet_state)

n_dev = len(jax.devices())
N = max(4, n_dev)
vehicles = [Holonomic() for _ in range(N)]
fleet = Fleet(vehicles)
configuration = RegularPolyhedron(0.2, N, np.pi / 4).vertices.T
fleet.set_configuration(configuration.tolist())
fleet.set_initial_conditions((np.array([-1.5, -1.5]) + configuration).tolist())
fleet.set_terminal_conditions((np.array([2.0, 2.0]) + configuration).tolist())
environment = Environment(room={"shape": Square(5.0)})
problem = FormationPoint2point(fleet, environment,
                               options={"horizon_time": 10, "rho": 1.0})
problem.set_options({"verbose": 0})
problem.init()

mesh = Mesh(np.array(jax.devices()[:min(n_dev, N)]), axis_names=("fleet",))
dual_step = make_mesh_dual_update(problem, mesh, outer_iter=1)
P0 = problem._pack_params(0.0)
X, Pp, Z, L = shard_fleet_state(mesh, "fleet", jnp.asarray(problem.X),
                                jnp.asarray(P0), jnp.asarray(problem.Z),
                                jnp.asarray(problem.L))
for it in range(3):
    X, Z, L, pri, dua = dual_step(X, Pp, Z, L)
print(f"fleet_mesh_admm_tpu: {N} vehicles on {mesh.devices.size} devices, "
      f"residuals pri={float(pri):.2e} dual={float(dua):.2e}")
