"""Honest breakdown of the ALM inner-iteration constituents on the axon
remote TPU.

The axon tunnel's block_until_ready does NOT wait for queued executions, so
per-call host timing lies (microbenchmarks show impossible TF/s).  The only
honest protocol: each op runs inside a device-side lax.scan with a data
dependency across iterations, timed as ONE dispatch.

Run: python tools/profile_step.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 50


def scan_time(make_body, init, n=ITERS):
    """Time one dispatch of a device-side scan: body must return a carry
    with a data dependency on the previous iteration."""
    fn = jax.jit(lambda c: jax.lax.scan(lambda c, _: (make_body(c), None),
                                        c, None, length=n)[0])
    out = jax.block_until_ready(fn(init))   # compile + warm
    t0 = time.time()
    out = jax.block_until_ready(fn(init))
    dt = (time.time() - t0) / n
    return dt * 1e3  # ms per iteration


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    global ITERS
    if len(sys.argv) > 2:
        ITERS = int(sys.argv[2])
    rng = np.random.default_rng(0)
    dt = jnp.float32
    m, n = 671, 151
    s = 16
    print(f"sizes: B={B} m={m} n={n}")

    Q = jnp.asarray(rng.standard_normal((m, n, n)) * 0.01, dtype=dt)
    A = jnp.asarray(rng.standard_normal((m, n)), dtype=dt)
    x0 = jnp.asarray(rng.standard_normal((B, n)), dtype=dt)
    act = jnp.asarray((rng.random((B, m)) > 0.5), dtype=dt)
    y0 = jnp.asarray(rng.standard_normal((B, m)), dtype=dt)
    H0 = jnp.eye(n, dtype=dt)[None] * 10.0 + 0.0 * jnp.zeros((B, n, n), dt)
    H0 = jnp.asarray(H0 + 1e-1 * jnp.einsum(
        "bki,bkj->bij", jnp.asarray(rng.standard_normal((B, 2 * n, n)) * .1,
                                    dtype=dt),
        jnp.asarray(rng.standard_normal((B, 2 * n, n)) * .1, dtype=dt)))
    g0 = jnp.asarray(rng.standard_normal((B, n)), dtype=dt)

    from omg_tools_tpu.ops.pallas_kernels import batched_psd_solve

    with jax.default_matmul_precision("highest"):
        t = scan_time(lambda x: 0.1 * jnp.tanh(
            A[None] + 2.0 * jnp.einsum("kij,bj->bki", Q, x)).sum(axis=1),
            x0)
        print(f"J = A + 2 Q x        : {t:8.3f} ms")

        J0 = A[None] + 2.0 * jnp.einsum("kij,bj->bki", Q, x0)

        def h_body(J):
            H = jnp.einsum("bki,bk,bkj->bij", J, act, J)
            return J + 1e-6 * H.sum(axis=2)[:, : J.shape[1] * 0 + J.shape[1] // J.shape[1], :] if False else J + 1e-6 * jnp.einsum("bij->bi", H)[:, None, :] * 0 + J * 0.999

        # simpler: H feeds back through a cheap reduction into J's scale
        def h_body2(carry):
            J, acc = carry
            H = jnp.einsum("bki,bk,bkj->bij", J, act, J)
            return (J * 0.999, acc + H[:, 0, 0])
        t = scan_time(h_body2, (J0, jnp.zeros(B, dt)))
        print(f"H = J'DJ             : {t:8.3f} ms")

        def grad_body(carry):
            J, acc = carry
            gr = jnp.einsum("bki,bk->bi", J, y0)
            return (J * 0.999, acc + gr[:, 0])
        t = scan_time(grad_body, (J0, jnp.zeros(B, dt)))
        print(f"grad = J'y           : {t:8.3f} ms")

        def chol_body(carry):
            H, g = carry
            dx = batched_psd_solve(H, g, interpret=False)
            return (H, g * 0.9 + 0.1 * dx)
        t = scan_time(chol_body, (H0, g0))
        print(f"pallas psd_solve     : {t:8.3f} ms")

        def xla_chol_body(carry):
            H, g = carry
            dx = jax.vmap(lambda Hi, gi: jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(Hi), gi))(H, g)
            return (H, g * 0.9 + 0.1 * dx)
        t = scan_time(xla_chol_body, (H0, g0))
        print(f"xla cho_solve        : {t:8.3f} ms")

        def qd_body(d):
            q = jnp.einsum("kij,bi,bj->bk", Q, d, d)
            return d * 0.999 + 1e-6 * q[:, :n] * 0 + 1e-9 * q.sum(1, keepdims=True)
        t = scan_time(qd_body, g0)
        print(f"quad_dir d'Qd        : {t:8.3f} ms")

        # packed variants
        idx = jnp.asarray(rng.integers(0, n, (m, s)))
        Qp = jnp.asarray(rng.standard_normal((m, s, s)) * 0.01, dtype=dt)
        Ap = jnp.asarray(rng.standard_normal((m, s)), dtype=dt)

        def packed_J_body(x):
            xg = x[:, idx.reshape(-1)].reshape(B, m, s)
            Jp = Ap[None] + 2.0 * jnp.einsum("kst,bkt->bks", Qp, xg)
            return x * 0.999 + 1e-9 * Jp.sum(axis=(1, 2))[:, None]
        t = scan_time(packed_J_body, x0)
        print(f"packed gather+J      : {t:8.3f} ms")

        Jp0 = Ap[None] + 0.0 * jnp.zeros((B, m, s), dt)

        def packed_qd_body(carry):
            Jp, acc = carry
            q = jnp.einsum("bks,bks->bk", Jp, Jp)   # stand-in m*s flop scale
            return (Jp * 0.999, acc + q[:, 0])
        t = scan_time(packed_qd_body, (Jp0, jnp.zeros(B, dt)))
        print(f"packed rowdots       : {t:8.3f} ms")

    print("device:", jax.devices()[0])


if __name__ == "__main__":
    main()
