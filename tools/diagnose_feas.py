#!/usr/bin/env python
"""Which constraint rows carry the residual infeasibility?

Host-CPU diagnosis for the bench parity gate: build the bench problem,
run the scipy reference rollout AND the device ALM rollout (single
scenario, f64) for N steps at several outer_iter settings, and print the
top violated constraint blocks per step in RAW units.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax.numpy as jnp  # noqa: E402

N_STEPS = int(os.environ.get("DIAG_STEPS", "20"))


def row_blocks(tr):
    """(start, stop, label) per constraint block."""
    out = []
    r = 0
    for blk in tr.layout.constraints:
        out.append((r, r + blk.rows, blk.label))
        r += blk.rows
    return out


def top_rows(tr, gv, lb, ub, k=3):
    viol = np.maximum(lb - gv, 0.0) + np.maximum(gv - ub, 0.0)
    idx = np.argsort(viol)[::-1][:k]
    blocks = row_blocks(tr)
    out = []
    for i in idx:
        if viol[i] <= 0:
            break
        label = next(lbl for a, b, lbl in blocks if a <= i < b)
        out.append((label, int(i), float(viol[i])))
    return out


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_problem
    from omg_tools_tpu.problems.batch import BatchedP2PRunner

    problem = build_problem()
    runner = BatchedP2PRunner(problem, dtype=jnp.float64)
    tr = runner.tr
    lb, ub = (np.asarray(a, np.float64) for a in tr.bounds(0.0))

    rng = np.random.default_rng(0)
    starts = np.tile([-1.5, -1.5], (1, 1)) + rng.uniform(-0.3, 0.3, (1, 2))
    goals = np.tile([2.0, 2.0], (1, 1)) + rng.uniform(-0.3, 0.3, (1, 2))
    x0, p0, state = runner.make_batch(starts, goals)
    x0n = np.asarray(x0[0], np.float64)
    p0n = np.asarray(p0[0], np.float64)

    # --- reference rollout, with per-step top violations
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parity import _reference_rollout
    ref_states, _, ref_feas = _reference_rollout(runner, x0n, p0n, N_STEPS)
    print("reference rollout per-step feas:")
    # re-run the parameter trajectory to inspect rows at the worst step
    print("  feas:", np.array2string(np.asarray(ref_feas), precision=5))

    # --- device rollout at several outer_iter, then row-level look at end
    consts = jax.tree_util.tree_map(jnp.asarray, runner.consts())
    for outer in (1, 2, 4):
        st = jax.jit(runner.init_solver_state)(x0, p0, consts)
        roll = jax.jit(runner.rollout_fn(N_STEPS, outer_iter=outer))
        carry, states = roll(st, p0, state, consts)
        stf = carry[0]
        x_fin = np.asarray(stf.x[0], np.float64)
        # evaluate raw constraints at the final solver iterate
        p_fin = np.asarray(carry[1][0], np.float64) \
            if isinstance(carry, tuple) and len(carry) > 1 else p0n
        print(f"outer={outer}: feas={float(stf.feas[0]):.3e} "
              f"feas_raw={float(stf.feas_raw[0]):.3e} "
              f"dev_vs_ref_max={np.max(np.abs(np.asarray(states[0]) - ref_states)):.4f}")
        gv = np.asarray(tr.constraints(jnp.asarray(x_fin),
                                       jnp.asarray(p_fin)), np.float64)
        for label, i, v in top_rows(tr, gv, lb, ub):
            print(f"    row {i:4d} {label:50s} viol {v:.3e}")


if __name__ == "__main__":
    main()
