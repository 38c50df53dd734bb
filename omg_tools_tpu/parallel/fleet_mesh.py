"""Mesh-sharded consensus ADMM: vehicles distributed over device meshes.

The reference's distributed layer communicates by in-process object
references along the fleet graph (reference admm.py:468-475); multi-host
deployments push raw vectors over ROS.  On TPU the fleet axis maps onto a
device-mesh axis: each device owns a contiguous block of vehicles, the
x-updates run vmapped inside shard_map, and the neighbor exchange of shared
coefficients/multipliers is a single `lax.ppermute` ring step over ICI
(the circular fleet graph IS the ring).  Residual reductions ride `psum`.

Entry point: ``make_mesh_dual_update(admm_problem, mesh)`` returns a jitted
function advancing one ADMM iteration for the whole fleet:
    (X, P, Z, L) -> (X, Z, L, pri_res, dual_res)
with X:(N, n_x), P:(N, n_p), Z:(N, n_sh) (edge k = (k, k+1)),
L:(N, 2, n_sh) (slots [next-edge, prev-edge]); all sharded over 'fleet'.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh_dual_update", "shard_fleet_state",
           "build_local_dual_update"]


def shard_fleet_state(mesh, axis, *arrays):
    """Place per-vehicle arrays with the leading axis sharded over the
    given mesh axis."""
    out = []
    for a in arrays:
        spec = P(*((axis,) + (None,) * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def build_local_dual_update(admm_problem, axis: str, n_dev: int,
                            outer_iter: int = 4):
    """The per-device block update for the circular-graph consensus ADMM,
    to be wrapped in a shard_map whose mesh has `axis` of size n_dev.
    Returns (_local, rel) where _local(X, Pp, Z, L, rel_l) advances one
    iteration on a device-local block of vehicles and rel is the (N, n_sh)
    per-vehicle shared-offset table to shard alongside the state."""
    ap = admm_problem
    assert ap.N > 2, "mesh path expects the N>2 circular layout"
    assert len(ap.groups) == 1, "mesh path expects a homogeneous fleet"
    group = ap.groups[0]
    tmpl = group.template
    solver = tmpl._solver
    lb = jnp.asarray(np.asarray(group.lb))
    ub = jnp.asarray(np.asarray(group.ub))
    rho = ap.rho
    S_idx = jnp.asarray(group.S_idx)
    # consensus algebra at t0 = 0 (identity future-piece transform): the
    # mesh path advances whole knot intervals in the init phase
    z_proj = jnp.asarray(ap._projection_for(None))
    rel = jnp.asarray(np.stack([ap._rel_offsets(i) for i in range(ap.N)]))
    assert ap.N % n_dev == 0, "fleet size must divide the mesh axis"
    perm_fwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]  # pull from next
    perm_bwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]  # pull from prev

    def _local(X, Pp, Z, L, rel_l):
        # one device's block of vehicles
        st = jax.vmap(lambda x, p: solver(x, p, lb, ub,
                                          outer_iter=outer_iter))(X, Pp)
        Xn = st.x
        S = Xn[:, S_idx] + rel_l
        # neighbor exchange: s_{i+1} for edge i.  Within the block it's a
        # shift; the block boundary row comes from the next device.
        S_shift = jnp.roll(S, -1, axis=0)
        S_from_next = jax.lax.ppermute(S[:1], axis, perm_fwd)
        S_next = S_shift.at[-1:].set(S_from_next)
        L_prev_shift = jnp.roll(L[:, 1, :], -1, axis=0)
        L_from_next = jax.lax.ppermute(L[:1, 1, :], axis, perm_fwd)
        L_next = L_prev_shift.at[-1:].set(L_from_next)
        avg = 0.5 * (S + L[:, 0, :] / rho + S_next + L_next / rho)
        Zn = avg @ z_proj.T
        # lam update needs z of edge i (local) and edge i-1 (prev device for
        # the first row)
        Z_prev_shift = jnp.roll(Zn, 1, axis=0)
        Z_from_prev = jax.lax.ppermute(Zn[-1:], axis, perm_bwd)
        Z_prev = Z_prev_shift.at[:1].set(Z_from_prev)
        L0 = L[:, 0, :] + rho * (S - Zn)
        L1 = L[:, 1, :] + rho * (S - Z_prev)
        Ln = jnp.stack([L0, L1], axis=1)
        pri = jnp.maximum(jnp.max(jnp.abs(S - Zn)),
                          jnp.max(jnp.abs(S - Z_prev)))
        dua = rho * jnp.max(jnp.abs(Zn - Z))
        pri = jax.lax.pmax(pri, axis)
        dua = jax.lax.pmax(dua, axis)
        return Xn, Zn, Ln, pri, dua

    return _local, rel


def make_mesh_dual_update(admm_problem, mesh: Mesh, axis: str = "fleet",
                          outer_iter: int = 4):
    """Build the sharded one-iteration ADMM update for an initialized
    ADMMProblem (N > 2, circular graph).  N must be divisible by the mesh
    axis size."""
    n_dev = mesh.shape[axis]
    _local, rel = build_local_dual_update(admm_problem, axis, n_dev,
                                          outer_iter=outer_iter)

    sharded = jax.shard_map(
        _local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(), P()))

    def step(X, Pp, Z, L):
        return sharded(X, Pp, Z, L, rel)

    return jax.jit(step)
