"""Inspect the bench problem's constraint structure: row counts per
constraint label, Q tensor sparsity, and per-row variable support — to
decide between sparsity packing / active-set compression for the solver."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from omg_tools_tpu.utils.devices import enable_host_backend
enable_host_backend()
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                           Circle, Square, Point2point)

vehicle = Holonomic()
vehicle.set_initial_conditions([-1.5, -1.5])
vehicle.set_terminal_conditions([2.0, 2.0])
env = Environment(room={"shape": Square(5.0)})
env.add_obstacle(Obstacle({"position": [-2.1, -0.5]},
                          shape=Rectangle(width=3.0, height=0.2)))
env.add_obstacle(Obstacle({"position": [1.7, -0.5]},
                          shape=Rectangle(width=3.0, height=0.2)))
env.add_obstacle(Obstacle({"position": [1.5, 0.5]}, shape=Circle(0.4)))
problem = Point2point(vehicle, env, freeT=False)
problem.set_options({"verbose": 0})
problem.init()
tr = problem.transcription

m, n = len(np.asarray(tr.lb)), tr.n_x
print(f"m={m} n={n} n_p={tr.n_p}")

# row groups
if hasattr(tr, "con_slices"):
    for key, sl in tr.con_slices.items():
        print(f"  rows {sl.start:4d}:{sl.stop:4d}  {key}")
else:
    print("attrs:", [a for a in dir(tr) if "con" in a or "slice" in a])

# variable blocks
if hasattr(tr, "var_slices"):
    for key, (sl, shape) in tr.var_slices.items():
        print(f"  vars {sl.start:4d}:{sl.stop:4d}  {key} {shape}")

from omg_tools_tpu.ops.alm import detect_quadratic_structure
with jax.default_matmul_precision("highest"):
    p_ref = jnp.asarray(problem.pack_parameters(0.0))
    Q = detect_quadratic_structure(tr.constraints, tr.n_x, p_ref,
                                   f=tr.objective)
Q = np.asarray(Q)
nz_rows = np.any(np.abs(Q) > 1e-12, axis=(1, 2))
print(f"Q: {Q.shape}, nonzero rows: {nz_rows.sum()}/{m}")
supp = (np.abs(Q) > 1e-12).any(axis=1) | (np.abs(Q) > 1e-12).any(axis=2)
supp_sizes = supp.sum(axis=1)
print("per-row Q var support: max", supp_sizes.max(),
      "p90", int(np.percentile(supp_sizes[nz_rows], 90)) if nz_rows.any() else 0,
      "median(active)", int(np.median(supp_sizes[nz_rows])) if nz_rows.any() else 0)

# A sparsity at reference point
zero = jnp.zeros(n)
A = np.asarray(jax.jacfwd(tr.constraints)(zero, p_ref))
a_supp = (np.abs(A) > 1e-12).sum(axis=1)
print("A row support: max", a_supp.max(), "median", int(np.median(a_supp)))
# identity-like rows (pure variable bounds)?
ident = sum(1 for k in range(m)
            if (np.abs(A[k]) > 1e-12).sum() == 1 and not nz_rows[k])
print("single-var linear rows (box-like):", ident)
