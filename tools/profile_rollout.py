#!/usr/bin/env python
"""Profile the batched MPC rollout hot path on the TPU.

Measures (a) the pure lane-batched Cholesky solve, (b) the rollout step
time as a function of the inner-iteration budget -- the slope isolates the
marginal per-inner-iteration cost, the intercept the per-step overhead
(warm-start shift, parameter refresh, convergence bookkeeping).
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from omg_tools_tpu.utils.devices import enable_host_backend  # noqa: E402
enable_host_backend()

BATCH = int(os.environ.get("BENCH_BATCH", "4096"))
N_STEPS = int(os.environ.get("BENCH_STEPS", "10"))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    # -- pure Cholesky ------------------------------------------------------
    from omg_tools_tpu.ops.pallas_kernels import batched_psd_solve
    n = 151
    rng = np.random.default_rng(0)
    A = rng.standard_normal((BATCH, n, n)).astype(np.float32)
    H = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 10 * np.eye(n, dtype=np.float32))
    g = jnp.asarray(rng.standard_normal((BATCH, n)).astype(np.float32))
    f = jax.jit(batched_psd_solve)
    t_chol = timeit(f, H, g)
    print(f"psd_solve B={BATCH} n={n}: {t_chol*1e3:.1f} ms "
          f"({BATCH/t_chol:.0f} solves/s)")

    # -- rollout vs inner budget ---------------------------------------------
    import bench
    from omg_tools_tpu.problems.batch import BatchedP2PRunner
    from omg_tools_tpu.ops.alm import ALMOptions
    problem = bench.build_problem()

    rng = np.random.default_rng(0)
    starts = np.tile([-1.5, -1.5], (BATCH, 1)) + rng.uniform(-0.3, 0.3,
                                                             (BATCH, 2))
    goals = np.tile([2.0, 2.0], (BATCH, 1)) + rng.uniform(-0.3, 0.3,
                                                          (BATCH, 2))
    for inner, outer in [(8, 2), (8, 1), (4, 2), (2, 2), (1, 1)]:
        runner = BatchedP2PRunner(problem, dtype=jnp.float32,
                                  alm_options=ALMOptions(inner_iter=inner))
        x0, p0, state = runner.make_batch(starts, goals)
        consts = jax.device_put(runner.consts())
        init = jax.jit(runner.init_solver_state)
        st = init(x0, p0, consts)
        jax.block_until_ready(st.x)
        roll = jax.jit(runner.rollout_fn(N_STEPS, outer_iter=outer))

        def run(st, p0, state, consts):
            carry, states = roll(st, p0, state, consts)
            return states

        t = timeit(run, st, p0, state, consts)
        carry, states = roll(st, p0, state, consts)
        d0 = np.linalg.norm(starts - goals, axis=1)
        d1 = np.linalg.norm(np.asarray(states)[:, -1] - goals, axis=1)
        prog = float(np.mean((d0 - d1) / d0))
        feas = np.asarray(carry[0].feas)
        print(f"inner={inner} outer={outer}: {t/N_STEPS*1e3:.1f} ms/step "
              f"({BATCH*N_STEPS/t:.0f} solves/s) progress={prog:.3f} "
              f"feas_p50={np.median(feas):.4f} feas_max={feas.max():.4f}")


if __name__ == "__main__":
    main()
