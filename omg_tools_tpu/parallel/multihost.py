"""Multi-host (DCN) deployment: the same SPMD program on every host.

The reference scales past one machine by hand-plumbed ROS messaging around
its embedded ADMM runtime (reference export/point2point ADMMPoint2Point +
user-side ROS nodes); there is no framework-level multi-machine program.
Here multi-host is first-class and TPU-pod-shaped: every host runs this
same program under ``jax.distributed``, the global devices form a hybrid
mesh whose **'data' (scenario) axis spans hosts over DCN** and whose
**'fleet' (consensus) axis stays inside one host's ICI domain**, so the
ADMM neighbor exchange (`ppermute`) and residual reductions (`psum`) never
cross the slow network; scenario parallelism has no hot-loop communication
at all, so DCN only carries the initial scatter and final gather.

Three entry points:

- :func:`initialize` -- wire this process into the job
  (``jax.distributed``); env-var driven so the same script runs under any
  launcher.
- :func:`hybrid_mesh` -- build the (data, fleet) mesh with the fleet axis
  guaranteed host-local (devices grouped by ``process_index``).
- :func:`make_hybrid_dual_update` -- a batch of independent fleet-ADMM
  instances: B fleets x N vehicles, B sharded over 'data' (DCN), N over
  'fleet' (ICI).  The per-device block update is the same one the
  single-host mesh path uses (:mod:`.fleet_mesh`), vmapped over the
  device-local slab of fleet instances.

Scenario (pure data) parallelism needs no new machinery: shard the batch
over the flattened ('data', 'fleet') axes with :func:`shard_batch` and jit
the ordinary :class:`~omg_tools_tpu.problems.batch.BatchedP2PRunner`
rollout -- XLA partitions it with zero collectives.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .fleet_mesh import build_local_dual_update

__all__ = ["initialize", "hybrid_mesh", "shard_batch",
           "process_local_batch", "make_hybrid_dual_update",
           "shard_hybrid_state"]


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Join the multi-host job.  Arguments default to the standard
    environment variables (``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``), so one script works under
    any launcher.  A single-process run (no env, no args) is a no-op --
    the same program then executes on the local devices only."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1 or coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def hybrid_mesh(fleet_size=None, data_axis="data", fleet_axis="fleet"):
    """Build the (data, fleet) hybrid mesh.  Devices are grouped by owning
    process (host) and the fleet axis is carved out of each host's local
    devices, so fleet-axis collectives ride ICI, never DCN.

    fleet_size defaults to the per-host device count (one fleet instance
    per host).  It must divide the per-host device count; the data axis
    takes everything else (hosts x leftover local factor)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    by_proc = {}
    for d in devs:
        by_proc.setdefault(d.process_index, []).append(d)
    counts = {len(v) for v in by_proc.values()}
    assert len(counts) == 1, f"heterogeneous hosts: {counts}"
    local = counts.pop()
    n_proc = len(by_proc)
    if fleet_size is None:
        fleet_size = local
    assert local % fleet_size == 0, \
        f"fleet axis {fleet_size} must divide local device count {local}"
    # (hosts, local) -> (hosts * local/fleet, fleet): each data row's fleet
    # block lives inside one host
    grid = np.array([by_proc[p] for p in sorted(by_proc)])
    grid = grid.reshape(n_proc * (local // fleet_size), fleet_size)
    return Mesh(grid, axis_names=(data_axis, fleet_axis))


def _place_global(mesh: Mesh, a, spec):
    """Build a (possibly multi-host) sharded array from a host copy of the
    GLOBAL value.  ``device_put`` would round-trip an allgather to check
    cross-process consistency (and deadlocks if a peer died); the callback
    form hands each addressable device its slice directly."""
    a = np.asarray(a)
    return jax.make_array_from_callback(
        a.shape, NamedSharding(mesh, spec), lambda idx: a[idx])


def shard_batch(mesh: Mesh, tree, batch_axes=None):
    """Shard every array's leading (batch) axis over ALL mesh axes
    (flattened) -- the pure scenario-parallel layout.  Arrays whose leading
    dim does not divide the device count are replicated.  Each process must
    hold the same global value (use :func:`process_local_batch` to scatter
    per-host data instead)."""
    if batch_axes is None:
        batch_axes = tuple(mesh.axis_names)
    n = int(np.prod([mesh.shape[a] for a in batch_axes]))

    def place(a):
        if not hasattr(a, "ndim"):
            return a
        if a.ndim >= 1 and a.shape[0] % n == 0:
            spec = P(batch_axes, *((None,) * (a.ndim - 1)))
        else:
            spec = P()
        return _place_global(mesh, a, spec)

    return jax.tree_util.tree_map(place, tree)


def process_local_batch(mesh: Mesh, global_shape_tree, local_tree,
                        batch_axes=None):
    """Multi-host scatter: assemble globally-sharded arrays from each
    process's LOCAL slice of the scenario batch (each host generates /
    loads only its own scenarios; nothing is broadcast over DCN).

    global_shape_tree gives the full batch sizes; local_tree holds this
    process's rows.  Returns the same pytree as :func:`shard_batch` would,
    built with ``jax.make_array_from_process_local_data``."""
    if batch_axes is None:
        batch_axes = tuple(mesh.axis_names)

    def place(shape, a):
        spec = P(batch_axes, *((None,) * (a.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(a), shape)

    return jax.tree_util.tree_map(place, global_shape_tree, local_tree)


def shard_hybrid_state(mesh: Mesh, *arrays, data_axis="data",
                       fleet_axis="fleet"):
    """Place (B, N, ...) fleet-instance state with B over 'data' and N
    over 'fleet'."""
    out = []
    for a in arrays:
        spec = P(data_axis, fleet_axis, *((None,) * (a.ndim - 2)))
        out.append(_place_global(mesh, a, spec))
    return tuple(out)


def make_hybrid_dual_update(admm_problem, mesh: Mesh, data_axis="data",
                            fleet_axis="fleet", outer_iter: int = 4):
    """One ADMM iteration for a BATCH of independent fleet instances:
    X:(B, N, n_x), P:(B, N, n_p), Z:(B, N, n_sh), L:(B, N, 2, n_sh) with B
    sharded over the DCN 'data' axis and N over the ICI 'fleet' axis.  The
    per-device block update (x-solve, ppermute neighbor exchange,
    z-projection, multiplier step) is exactly the single-host one
    (:func:`.fleet_mesh.build_local_dual_update`) vmapped over the local
    slab of instances -- the ppermute stays on the fleet axis, so nothing
    in the iteration crosses DCN.  Residuals are reduced over BOTH axes
    (one scalar pair for the whole job; the cross-host psum is 2 floats).

    Returns (step, rel) -- call ``step(X, Pp, Z, L, rel_b)`` with
    ``rel_b = jnp.broadcast_to(rel, (B,) + rel.shape)`` sharded like X."""
    n_fleet = mesh.shape[fleet_axis]
    _local, rel = build_local_dual_update(admm_problem, fleet_axis, n_fleet,
                                          outer_iter=outer_iter)

    def _block(X, Pp, Z, L, rel_b):
        # leading dim: this device's slab of fleet instances
        Xn, Zn, Ln, pri, dua = jax.vmap(_local)(X, Pp, Z, L, rel_b)
        pri = jax.lax.pmax(jnp.max(pri), data_axis)
        dua = jax.lax.pmax(jnp.max(dua), data_axis)
        return Xn, Zn, Ln, pri, dua

    spec = P(data_axis, fleet_axis)
    sharded = jax.shard_map(
        _block, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, P(), P()))
    return jax.jit(sharded), rel
