"""f32 matmul roofline on the real chip: big 2D GEMM vs batched small GEMM,
at matmul precision highest/high/default, plus the H-build einsum.
Decides whether a Pallas batched-GEMM kernel or a precision drop pays."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    rng = np.random.default_rng(0)
    dt = jnp.float32
    B, m, n = 1024, 671, 151
    # big 2D GEMM, comparable total flops: (4096, 4096) @ (4096, 4096)
    N = 4096
    X = jnp.asarray(rng.standard_normal((N, N)), dtype=dt)
    Y = jnp.asarray(rng.standard_normal((N, N)), dtype=dt)
    J = jnp.asarray(rng.standard_normal((B, m, n)), dtype=dt)
    act = jnp.asarray((rng.random((B, m)) > 0.5), dtype=dt)

    for prec in ("highest", "high", "default"):
        with jax.default_matmul_precision(prec):
            g2d = jax.jit(lambda X, Y: X @ Y)
            t = timeit(g2d, X, Y)
            fl = 2 * N**3
            print(f"2D GEMM {N}^3        prec={prec:8s}: {t*1e3:8.2f} ms "
                  f"{fl/t/1e12:6.1f} TF/s")
            bg = jax.jit(lambda J: jnp.einsum("bki,bkj->bij", J, J))
            t = timeit(bg, J)
            fl = 2 * B * m * n * n
            print(f"batched J'J          prec={prec:8s}: {t*1e3:8.2f} ms "
                  f"{fl/t/1e12:6.1f} TF/s")
            hb = jax.jit(lambda J, act: jnp.einsum("bki,bk,bkj->bij",
                                                   J, act, J))
            t = timeit(hb, J, act)
            print(f"batched J'DJ         prec={prec:8s}: {t*1e3:8.2f} ms "
                  f"{fl/t/1e12:6.1f} TF/s")
    print("device:", jax.devices()[0])


if __name__ == "__main__":
    main()
