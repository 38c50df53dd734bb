#!/usr/bin/env python
"""Multi-host SPMD launcher: run the SAME script on every host.

    python tools/multihost_launch.py --coordinator host0:8476 \
        --num-processes 4 --process-id $I [--program fleet|rollout]

Each process joins the job via jax.distributed, builds the hybrid
(data, fleet) mesh (fleet axis host-local -> ICI; data axis across hosts
-> DCN; see omg_tools_tpu/parallel/multihost.py), runs the selected
program, and prints one JSON line with process-local checksums so a
harness (tests/test_multihost.py) can verify cross-host agreement against
a single-process reference run.

Programs
--------
fleet    B independent formation-ADMM fleet instances; B over 'data', the
         N vehicles of each instance over 'fleet'.  One dual iteration.
rollout  scenario-parallel batched MPC rollout sharded over all devices.

On CPU (testing) pass --cpu-devices K to give this process K virtual
devices.  On a real pod, run under the cluster launcher with the standard
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars and
omit the flags.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--program", choices=["fleet", "rollout"],
                   default="fleet")
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="force K virtual CPU devices (testing)")
    p.add_argument("--fleet-n", type=int, default=4)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--steps", type=int, default=1)
    return p.parse_args()


def build_formation(N):
    """The canonical regular-polygon formation problem (shared by the
    launcher and the verifying harness so both build identical NLPs)."""
    import numpy as np
    from omg_tools_tpu import (Holonomic, Fleet, Environment, Square,
                               FormationPoint2point)
    from omg_tools_tpu.environment.shapes import RegularPolyhedron
    vehicles = [Holonomic() for _ in range(N)]
    fleet = Fleet(vehicles)
    configuration = RegularPolyhedron(0.2, N, np.pi / 4).vertices.T
    fleet.set_configuration(configuration.tolist())
    fleet.set_initial_conditions(
        (np.array([-1.5, -1.5]) + configuration).tolist())
    fleet.set_terminal_conditions(
        (np.array([2.0, 2.0]) + configuration).tolist())
    environment = Environment(room={"shape": Square(5.0)})
    admm = FormationPoint2point(fleet, environment,
                                options={"horizon_time": 10, "rho": 1.0})
    admm.set_options({"verbose": 0})
    admm.init()
    return admm


def run_fleet(mesh, args):
    """B independent fleet instances over ('data', 'fleet')."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from omg_tools_tpu.parallel.multihost import (make_hybrid_dual_update,
                                                  shard_hybrid_state)
    N = args.fleet_n
    B = args.batch
    admm = build_formation(N)
    grp = admm.groups[0]
    step, rel = make_hybrid_dual_update(admm, mesh, outer_iter=1)
    P0 = admm._pack_params(grp, 0.0)
    # B identical instances (checksum simplicity); real deployments feed
    # per-instance scenario parameters here
    X = jnp.broadcast_to(jnp.asarray(grp.X), (B,) + grp.X.shape)
    Pp = jnp.broadcast_to(jnp.asarray(P0), (B,) + P0.shape)
    Z = jnp.broadcast_to(jnp.asarray(admm.Z), (B,) + admm.Z.shape)
    L = jnp.broadcast_to(jnp.asarray(admm.L), (B,) + admm.L.shape)
    relb = jnp.broadcast_to(rel, (B,) + rel.shape)
    X, Pp, Z, L, relb = shard_hybrid_state(mesh, X, Pp, Z, L, relb)
    Xn, Zn, Ln, pri, dua = step(X, Pp, Z, L, relb)
    jax.block_until_ready(Xn)
    # process-local checksum over addressable shards
    local_sum = float(sum(np.sum(np.asarray(s.data))
                          for s in Xn.addressable_shards))
    return {"pri": float(pri), "dua": float(dua), "x_local_sum": local_sum,
            "x_shape": list(Xn.shape)}


def run_rollout(mesh, args):
    """Scenario-parallel batched MPC over all devices (no hot-loop
    communication; DCN carries only scatter/gather)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from omg_tools_tpu import (Holonomic, Environment, Obstacle, Circle,
                               Square, Point2point)
    from omg_tools_tpu.problems.batch import BatchedP2PRunner
    from omg_tools_tpu.parallel.multihost import shard_batch
    vehicle = Holonomic()
    vehicle.set_initial_conditions([-1.5, -1.5])
    vehicle.set_terminal_conditions([2.0, 2.0])
    environment = Environment(room={"shape": Square(5.0)})
    environment.add_obstacle(Obstacle(
        {"position": [1.5, 0.5]}, shape=Circle(0.4)))
    problem = Point2point(vehicle, environment, freeT=False)
    problem.set_options({"verbose": 0})
    problem.init()
    runner = BatchedP2PRunner(problem, dtype=jnp.float64)
    n_dev = len(jax.devices())
    B = max(args.batch, n_dev)
    rng = np.random.default_rng(0)
    starts = np.tile([-1.5, -1.5], (B, 1)) + rng.uniform(-0.2, 0.2, (B, 2))
    goals = np.tile([2.0, 2.0], (B, 1)) + rng.uniform(-0.2, 0.2, (B, 2))
    x0, p0, state = runner.make_batch(starts, goals)
    consts = jax.tree_util.tree_map(jnp.asarray, runner.consts())
    st = jax.jit(runner.init_solver_state)(x0, p0, consts)
    st, p0, state = shard_batch(mesh, (st, p0, state))
    roll = jax.jit(runner.rollout_fn(args.steps, outer_iter=1))
    carry, states = roll(st, p0, state, consts)
    jax.block_until_ready(states)
    local_sum = float(sum(np.sum(np.asarray(s.data))
                          for s in states.addressable_shards))
    return {"feas_max": float(jnp.max(carry[0].feas)),
            "states_local_sum": local_sum,
            "states_shape": list(states.shape)}


def main():
    args = parse_args()
    if args.cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.cpu_devices}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from omg_tools_tpu.parallel import multihost
    distributed = multihost.initialize(args.coordinator, args.num_processes,
                                       args.process_id)
    if distributed:
        # host-side setup math (transcription probes, warm starts) must run
        # on THIS process's devices -- the global default device is host 0's
        # and its values are non-addressable here
        jax.config.update("jax_default_device", jax.local_devices()[0])
    mesh = multihost.hybrid_mesh(
        fleet_size=args.fleet_n if args.program == "fleet" else None)
    result = run_fleet(mesh, args) if args.program == "fleet" else \
        run_rollout(mesh, args)
    result.update({
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "distributed": distributed,
        "mesh": {a: int(s) for a, s in
                 zip(mesh.axis_names, mesh.devices.shape)},
    })
    print("MULTIHOST_RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
