#!/usr/bin/env python
"""Time the arrow-mode inner-iteration components on TPU, amortizing the
RPC dispatch floor by iterating each component K times inside one jit."""

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
K = int(os.environ.get("PROFILE_K", "16"))


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
    from omg_tools_tpu.ops.pallas_kernels import psd_solve, psd_solve_multi

    problem = bench.build_problem()
    runner = BatchedP2PRunner(problem, dtype=jnp.float32)
    struct = runner.compact
    ar = struct.arrow
    print("arrow:", ar.head, ar.blocks, "b_max", ar.b_max)

    rng = np.random.default_rng(0)
    starts = np.tile([-1.5, -1.5], (BATCH, 1)) + rng.uniform(-0.3, 0.3,
                                                             (BATCH, 2))
    goals = np.tile([2.0, 2.0], (BATCH, 1)) + rng.uniform(-0.3, 0.3,
                                                          (BATCH, 2))
    x0, p0, _ = runner.make_batch(starts, goals)
    C = jax.device_put(runner.consts())
    m = struct.m

    lam = jnp.zeros((BATCH, m), dtype=jnp.float32)
    rho = jnp.full((BATCH,), 100.0, dtype=jnp.float32)

    with jax.default_matmul_precision("highest"):
        def loopK(fn):
            """fn(work, x, lam, rho) -> array like x; chained K times."""
            def wrapped(x, p, lam, rho):
                ct = resolve_phase(struct, C.CT, 0, p)
                work = CompactWork(struct, ct)

                def body(i, x):
                    return fn(work, x, lam, rho)
                return jax.lax.fori_loop(0, K, body, x)
            return jax.jit(jax.vmap(wrapped))

        def perturb(x, v):
            """fold a scalar of v back into x so the loop isn't DCE'd."""
            return x * (1.0 + 1e-12 * jnp.sum(v))

        base = timeit(loopK(lambda w, x, l, r: x * 1.0000001),
                      x0, p0, lam, rho)
        print(f"loop overhead ({K}x):  {base:.1f} ms")

        t = timeit(loopK(lambda w, x, l, r: perturb(
            x, w.jacobians(x)[0])), x0, p0, lam, rho)
        print(f"jacobians:         {(t - base) / K:.2f} ms/iter")

        t = timeit(loopK(lambda w, x, l, r: perturb(x, w.g(x))),
                   x0, p0, lam, rho)
        print(f"jac+g:             {(t - base) / K:.2f} ms/iter")

        def f_asm(w, x, l, r):
            Jf = w.jacobians(x)
            gv = w.g_from_J(x, Jf)
            y = r * (gv + l / r - jnp.clip(gv + l / r, -1.0, 1.0))
            act = (jnp.abs(y) > 0).astype(x.dtype)
            S, D, Cc, r_h, r_b = w.arrow_system(Jf, y, act, r)
            return perturb(x, S) * (1 + 1e-12 * (jnp.sum(D) + jnp.sum(Cc)
                                                 + jnp.sum(r_h)
                                                 + jnp.sum(r_b)))
        t = timeit(loopK(f_asm), x0, p0, lam, rho)
        print(f"jac+g+arrow_asm:   {(t - base) / K:.2f} ms/iter")

        def f_solve(w, x, l, r):
            Jf = w.jacobians(x)
            gv = w.g_from_J(x, Jf)
            y = r * (gv + l / r - jnp.clip(gv + l / r, -1.0, 1.0))
            act = (jnp.abs(y) > 0).astype(x.dtype)
            S, D, Cc, r_h, r_b = w.arrow_system(Jf, y, act, r)
            h = S.shape[0]
            S = S + 1e-4 * jnp.eye(h, dtype=x.dtype)
            D = D + 1e-4 * jnp.eye(D.shape[1], dtype=x.dtype)[None]
            RHS = jnp.concatenate([jnp.swapaxes(Cc, 1, 2), r_b[:, :, None]],
                                  axis=2)
            W = psd_solve_multi(D, RHS)
            S_t = S - jnp.einsum("khb,kbg->hg", Cc, W[:, :, :h])
            r_t = r_h - jnp.einsum("khb,kb->h", Cc, W[:, :, h])
            dx_h = psd_solve(S_t, r_t)
            dx_b = W[:, :, h] - jnp.einsum("kbh,h->kb", W[:, :, :h], dx_h)
            return perturb(x, w.arrow_scatter(dx_h, dx_b))
        t = timeit(loopK(f_solve), x0, p0, lam, rho)
        print(f"jac+g+asm+solve:   {(t - base) / K:.2f} ms/iter")

        def f_ls(w, x, l, r):
            Jf = w.jacobians(x)
            gv = w.g_from_J(x, Jf)
            dx = x * 0.01
            Jd = w.Jd(Jf, dx)
            qd = w.quad_dir(dx)
            cands = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.04, 0.015, 6e-3,
                                 2.5e-3, 1e-3, 4e-4, 1.5e-4], dtype=x.dtype)

            def merit_at(a):
                rr = gv + a * Jd + (a * a) * qd + l / r
                proj = jnp.clip(rr, -1.0, 1.0)
                return 0.5 * r * jnp.sum((rr - proj) ** 2)
            return perturb(x, jax.vmap(merit_at)(cands))
        t = timeit(loopK(f_ls), x0, p0, lam, rho)
        print(f"jac+g+linesearch:  {(t - base) / K:.2f} ms/iter")


if __name__ == "__main__":
    main()
