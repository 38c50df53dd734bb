"""Fleet (model) parallelism: distributed-ADMM formation with vehicles
sharded over a device-mesh ring; neighbor exchange rides the interconnect
via ppermute (the reference's in-process communicate(), admm.py:468-475,
mapped onto ICI).  Uses the flagship FleetRunner mesh path (the same code
the bench and dryrun_multichip exercise); on a single chip the mesh is the
trivial 1-device ring."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Holonomic, Fleet, Environment, Square,
                           FormationPoint2point)
from omg_tools_tpu.environment.shapes import RegularPolyhedron
from omg_tools_tpu.parallel.fleet_runner import FleetRunner

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
                               options={"horizon_time": 10, "rho": 0.5,
                                        "device_loop": False})
problem.set_options({"verbose": 0})
problem.init()

mesh = Mesh(np.array(jax.devices()[:min(n_dev, N)]), axis_names=("fleet",))
runner = FleetRunner(problem, mesh=mesh)
carry = runner.make_state(0.0)
X0 = jnp.concatenate(carry.X, axis=0)
P0 = jnp.concatenate(carry.Pp, axis=0)
step = runner.mesh_iterate_fn(3)
# pre-place once (host padding + mesh placement), iterate device-side
placed = step.prepare(X0, P0, carry.Z, carry.L)
(_, _, _), (pri, dua) = step.run_placed(placed)
pri, dua = np.asarray(pri), np.asarray(dua)
print(f"fleet_mesh_admm_tpu: {N} vehicles on {mesh.devices.size} devices, "
      f"residuals pri={pri[-1]:.2e} dual={dua[-1]:.2e}")
assert pri[-1] < pri[0], (pri[0], pri[-1])
