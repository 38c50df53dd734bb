"""Sanity-check timing on the axon remote backend: independent repeated
calls vs a dependency chain. If repeats are deduped/pipelined dishonestly,
the chained version is the truth."""

import sys, time
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
N = 4096
X = jnp.asarray(rng.standard_normal((N, N)), dtype=jnp.float32)
Y = jnp.asarray(rng.standard_normal((N, N)), dtype=jnp.float32)

with jax.default_matmul_precision("highest"):
    g = jax.jit(lambda X, Y: X @ Y)
    out = jax.block_until_ready(g(X, Y))

    # independent repeats (same args)
    t0 = time.time()
    for _ in range(20):
        out = g(X, Y)
    jax.block_until_ready(out)
    t_rep = (time.time() - t0) / 20

    # dependency chain (output feeds next call) - cannot be elided
    Z = X
    t0 = time.time()
    for _ in range(20):
        Z = g(Z, Y)
    jax.block_until_ready(Z)
    t_chain = (time.time() - t0) / 20

    # chained, jitted as ONE program with lax.scan (device-side loop)
    def body(Z, _):
        return jnp.tanh(Z @ Y) , None
    scan20 = jax.jit(lambda Z: jax.lax.scan(body, Z, None, length=20)[0])
    out = jax.block_until_ready(scan20(X))
    t0 = time.time()
    out = jax.block_until_ready(scan20(X))
    t_scan = (time.time() - t0) / 20

fl = 2 * N**3
print(f"repeat same args : {t_rep*1e3:8.2f} ms  {fl/t_rep/1e12:6.1f} TF/s")
print(f"dependency chain : {t_chain*1e3:8.2f} ms  {fl/t_chain/1e12:6.1f} TF/s")
print(f"device-side scan : {t_scan*1e3:8.2f} ms  {fl/t_scan/1e12:6.1f} TF/s")
print("device:", jax.devices()[0])
