"""Microbench the primitives of the planned packed/banded ALM inner step
on the real TPU, at bench-problem sizes (B=1024, m=671, n=151, s=16,
bandwidth w=48):

1. static gather x[idx] -> (B, m, s)
2. packed J: A_p + 2 einsum(Q_p, x_g)
3. H contributions d*Jp*Jp (B, m, s, s) elementwise
4. banded assembly: static-permutation take + sorted segment_sum
5. dense H for comparison (current path)
"""

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
    return (time.time() - t0) / n * 1e3


def main():
    B, m, n, s, w = 1024, 671, 151, 16, 48
    rng = np.random.default_rng(0)
    dt = jnp.float32
    idx = jnp.asarray(rng.integers(0, n, (m, s)))
    Ap = jnp.asarray(rng.standard_normal((m, s)), dtype=dt)
    Qp = jnp.asarray(rng.standard_normal((m, s, s)) * 0.01, dtype=dt)
    x = jnp.asarray(rng.standard_normal((B, n)), dtype=dt)
    d = jnp.asarray(rng.random((B, m)), dtype=dt)

    gather_fn = jax.jit(lambda x: x[:, idx.reshape(-1)].reshape(B, m, s))
    xg = gather_fn(x)

    Jp_fn = jax.jit(lambda xg: Ap[None] + 2.0
                    * jnp.einsum("kst,bkt->bks", Qp, xg))
    Jp = Jp_fn(xg)

    contrib_fn = jax.jit(lambda Jp, d: (d[:, :, None, None]
                                        * Jp[:, :, :, None]
                                        * Jp[:, :, None, :]).reshape(B, -1))
    V = contrib_fn(Jp, d)

    # static banded destinations + sort permutation
    nslots = n * w
    dest = rng.integers(0, nslots, m * s * s)
    perm = np.argsort(dest, kind="stable")
    dest_sorted = jnp.asarray(dest[perm])
    perm = jnp.asarray(perm)

    def assemble(V):
        Vs = V[:, perm]
        return jax.ops.segment_sum(Vs.T, dest_sorted, num_segments=nslots,
                                   indices_are_sorted=True).T

    asm_fn = jax.jit(assemble)
    Hb = asm_fn(V)

    # alternative: padded per-slot gather + sum
    cmax = 32
    slot_src = np.full((nslots, cmax), m * s * s, dtype=np.int64)
    counts = np.zeros(nslots, dtype=np.int64)
    for j, dst in enumerate(dest):
        if counts[dst] < cmax:
            slot_src[dst, counts[dst]] = j
            counts[dst] += 1
    slot_src = jnp.asarray(slot_src.reshape(-1))

    def assemble2(V):
        Vpad = jnp.concatenate([V, jnp.zeros((B, 1), dtype=V.dtype)], axis=1)
        g = Vpad[:, slot_src].reshape(B, nslots, cmax)
        return g.sum(axis=-1)

    asm2_fn = jax.jit(assemble2)
    Hb2 = asm2_fn(V)

    # grad scatter: y*Jp summed into n bins
    destg = rng.integers(0, n, m * s)
    permg = np.argsort(destg, kind="stable")
    destg_sorted = jnp.asarray(destg[permg])
    permg = jnp.asarray(permg)
    y = jnp.asarray(rng.standard_normal((B, m)), dtype=dt)

    def grad_fn(Jp, y):
        V = (y[:, :, None] * Jp).reshape(B, -1)[:, permg]
        return jax.ops.segment_sum(V.T, destg_sorted, num_segments=n,
                                   indices_are_sorted=True).T

    grad_jit = jax.jit(grad_fn)
    gr = grad_jit(Jp, y)

    print(f"sizes: B={B} m={m} n={n} s={s} w={w}  contrib={m*s*s}")
    print(f"gather x[idx]        : {timeit(gather_fn, x):8.3f} ms")
    print(f"packed J             : {timeit(Jp_fn, xg):8.3f} ms")
    print(f"H contributions      : {timeit(contrib_fn, Jp, d):8.3f} ms")
    print(f"assemble segment_sum : {timeit(asm_fn, V):8.3f} ms")
    print(f"assemble slot-gather : {timeit(asm2_fn, V):8.3f} ms")
    print(f"grad segment_sum     : {timeit(grad_jit, Jp, y):8.3f} ms")
    print("device:", jax.devices()[0])


if __name__ == "__main__":
    main()
