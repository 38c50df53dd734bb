#!/usr/bin/env python
"""Which constraint pins the feas_raw p99==max cluster?

BENCH_r03 showed the top >=1% of 4096 lanes sharing ONE exact feas_raw
value (4.8e-3) -- this script runs the bench rollout on the chip, pulls
the lanes at/near the max, re-evaluates their constraints on host in f64,
and reports the binding rows per lane (label + raw violation), plus how
many lanes share the max to full precision.

Usage: python tools/diagnose_tail.py           (batch/steps via env:
       DIAG_BATCH=4096 DIAG_STEPS=20)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("DIAG_BATCH", "4096"))
N_STEPS = int(os.environ.get("DIAG_STEPS", "20"))


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("BENCH_BATCH", str(BATCH))
    from parity import build_p2p_holonomic
    from omg_tools_tpu.problems.batch import BatchedP2PRunner

    from omg_tools_tpu.ops.alm import ALMOptions
    problem = build_p2p_holonomic("alm")
    runner = BatchedP2PRunner(problem, dtype=jnp.float32,
                              alm_options=ALMOptions(inner_iter=5))
    rng = np.random.default_rng(0)
    starts = np.tile([-1.5, -1.5], (BATCH, 1)) + rng.uniform(
        -0.2, 0.2, (BATCH, 2))
    goals = np.tile([2.0, 2.0], (BATCH, 1)) + rng.uniform(
        -0.2, 0.2, (BATCH, 2))
    x0, p0, state = runner.make_batch(starts, goals)
    consts = jax.device_put(runner.consts())
    st = jax.jit(runner.init_solver_state)(x0, p0, consts)
    # the bench's full rollout configuration (defaults mirrored)
    roll = jax.jit(runner.rollout_fn(
        N_STEPS, outer_iter=2, rescue_lanes=128, rescue_outer=6,
        recover_tol=0.01, budgets=((3, 8), (1, 7))))
    (stf, pf, _), _ = roll(st, p0, state, consts)
    feas_raw = np.asarray(stf.feas_raw, np.float64)
    x_f = np.asarray(stf.x, np.float64)
    p_f = np.asarray(pf, np.float64)

    p99 = np.percentile(feas_raw, 99)
    mx = feas_raw.max()
    at_max = np.isclose(feas_raw, mx, rtol=0, atol=0)
    near_max = feas_raw >= p99
    print(f"batch {BATCH}: feas_raw p50 {np.median(feas_raw):.3e} "
          f"p99 {p99:.3e} max {mx:.3e}")
    print(f"lanes exactly at max: {int(at_max.sum())}, "
          f"lanes >= p99: {int(near_max.sum())}")

    # host f64 re-evaluation of the binding rows for the worst lanes
    tr = runner.tr
    lb, ub = tr.bounds(0.0)
    lb = np.asarray(lb, np.float64)
    ub = np.asarray(ub, np.float64)
    blocks = []
    r = 0
    for blk in tr.layout.constraints:
        blocks.append((r, r + blk.rows, blk.label))
        r += blk.rows
    # raw-unit violations: undo the row scaling the solver carries
    scale = np.asarray(getattr(runner, "row_scale", None)
                       if getattr(runner, "row_scale", None) is not None
                       else np.ones(tr.n_g), np.float64)
    worst = np.argsort(feas_raw)[::-1][:8]
    from collections import Counter
    labels = Counter()
    for lane in worst:
        gv = np.asarray(tr.constraints(jnp.asarray(x_f[lane]),
                                       jnp.asarray(p_f[lane])), np.float64)
        viol = np.maximum(lb - gv, 0.0) + np.maximum(gv - ub, 0.0)
        i = int(np.argmax(viol))
        label = next(lbl for a, b, lbl in blocks if a <= i < b)
        labels[label] += 1
        print(f"lane {lane:5d} feas_raw {feas_raw[lane]:.6e} "
              f"top row {i:4d} [{label}] viol {viol[i]:.6e} "
              f"(x in [{x_f[lane].min():.3f}, {x_f[lane].max():.3f}])")
    print("binding-block histogram over worst lanes:", dict(labels))


if __name__ == "__main__":
    main()
