#!/usr/bin/env python
"""Break the compact ALM inner iteration into components and time each on
the TPU (vmapped over the bench batch)."""

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


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import bench
    from omg_tools_tpu.problems.batch import BatchedP2PRunner
    from omg_tools_tpu.ops.compact import CompactWork, resolve_phase
    from omg_tools_tpu.ops.pallas_kernels import psd_solve

    problem = bench.build_problem()
    runner = BatchedP2PRunner(problem, dtype=jnp.float32)
    struct = runner.compact
    print("families:", len(struct.families))
    for f in struct.families:
        print("  rows", f.row_stop - f.row_start, "runs", f.runs,
              "qcols", len(f.qcols), "hasQ", f.has_Q)

    rng = np.random.default_rng(0)
    starts = np.tile([-1.5, -1.5], (BATCH, 1)) + rng.uniform(-0.3, 0.3,
                                                             (BATCH, 2))
    goals = np.tile([2.0, 2.0], (BATCH, 1)) + rng.uniform(-0.3, 0.3,
                                                          (BATCH, 2))
    x0, p0, _ = runner.make_batch(starts, goals)
    C = jax.device_put(runner.consts())
    n = runner.n_x
    m = struct.m

    lam = jnp.zeros((BATCH, m), dtype=jnp.float32)
    rho = jnp.full((BATCH,), 100.0, dtype=jnp.float32)

    with jax.default_matmul_precision("highest"):
        def with_work(fn):
            def wrapped(x, p, lam, rho):
                ct = resolve_phase(struct, C.CT, 0, p)
                work = CompactWork(struct, ct)
                return fn(work, x, lam, rho)
            return jax.jit(jax.vmap(wrapped))

        def f_resolve(x, p, lam, rho):
            ct = resolve_phase(struct, C.CT, 0, p)
            return ct["c"], ct["Af"]
        t = timeit(jax.jit(jax.vmap(f_resolve)), x0, p0, lam, rho)
        print(f"resolve_phase:     {t:.2f} ms")

        t = timeit(with_work(lambda w, x, lam, rho: w.jacobians(x)),
                   x0, p0, lam, rho)
        print(f"jacobians:         {t:.2f} ms")

        t = timeit(with_work(lambda w, x, lam, rho: w.g(x)), x0, p0, lam, rho)
        print(f"jacobians+g:       {t:.2f} ms")

        def f_grad(w, x, lam, rho):
            Jf = w.jacobians(x)
            gv = w.g_from_J(x, Jf)
            y = rho * (gv + lam / rho - jnp.clip(gv + lam / rho, -1.0, 1.0))
            return w.grad(Jf, y)
        t = timeit(with_work(f_grad), x0, p0, lam, rho)
        print(f"jac+g+grad:        {t:.2f} ms")

        def f_hess(w, x, lam, rho):
            Jf = w.jacobians(x)
            active = jnp.ones(m, dtype=x.dtype)
            return w.hessian(Jf, active, rho, 1e-6)
        t = timeit(with_work(f_hess), x0, p0, lam, rho)
        print(f"jac+hessian:       {t:.2f} ms")

        def f_hess_solve(w, x, lam, rho):
            Jf = w.jacobians(x)
            active = jnp.ones(m, dtype=x.dtype)
            H = w.hessian(Jf, active, rho, 1e-6)
            gv = w.g_from_J(x, Jf)
            y = rho * (gv + lam / rho - jnp.clip(gv + lam / rho, -1.0, 1.0))
            grad = w.grad(Jf, y)
            return psd_solve(H + jnp.eye(n, dtype=x.dtype), grad)
        t = timeit(with_work(f_hess_solve), x0, p0, lam, rho)
        print(f"jac+hess+grad+cho: {t:.2f} ms")

        def f_ls(w, x, lam, rho):
            Jf = w.jacobians(x)
            gv = w.g_from_J(x, Jf)
            dx = x * 0.01
            Jd = w.Jd(Jf, dx)
            qd = w.quad_dir(dx)
            cands = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.04, 0.015, 6e-3,
                                 2.5e-3, 1e-3, 4e-4, 1.5e-4], dtype=x.dtype)

            def merit_at(a):
                r = gv + a * Jd + (a * a) * qd + lam / rho
                proj = jnp.clip(r, -1.0, 1.0)
                return 0.5 * rho * jnp.sum((r - proj) ** 2)
            return jax.vmap(merit_at)(cands)
        t = timeit(with_work(f_ls), x0, p0, lam, rho)
        print(f"jac+linesearch:    {t:.2f} ms")


if __name__ == "__main__":
    main()
