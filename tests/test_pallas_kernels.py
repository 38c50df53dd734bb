"""Pallas kernel tests (interpret mode on CPU; compiled path exercised by
bench.py on hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omg_tools_tpu.ops.pallas_kernels import batched_psd_solve, psd_solve

pytestmark = pytest.mark.fast


def _spd_batch(B, n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((B, n, n)).astype(dtype)
    H = np.einsum("bij,bkj->bik", A, A) + 3 * np.eye(n, dtype=dtype)
    g = rng.standard_normal((B, n)).astype(dtype)
    return H, g


@pytest.mark.parametrize("B,n", [(3, 8), (5, 23), (2, 151), (130, 17)])
def test_batched_psd_solve_interpret(B, n):
    H, g = _spd_batch(B, n)
    want = np.stack([np.linalg.solve(H[b], g[b]) for b in range(B)])
    got = np.asarray(batched_psd_solve(jnp.asarray(H), jnp.asarray(g),
                                       interpret=True))
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=5e-5 * scale)


def test_psd_solve_unbatched_matches():
    H, g = _spd_batch(1, 31)
    want = np.linalg.solve(H[0], g[0])
    got = np.asarray(psd_solve(jnp.asarray(H[0]), jnp.asarray(g[0])))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_psd_solve_vmap_cpu_fallback():
    # on a CPU backend the custom-vmap rule falls back to XLA cholesky
    H, g = _spd_batch(6, 19)
    want = np.stack([np.linalg.solve(H[b], g[b]) for b in range(6)])
    got = np.asarray(jax.vmap(psd_solve)(jnp.asarray(H), jnp.asarray(g)))
    np.testing.assert_allclose(got, want, atol=5e-5 * np.max(np.abs(want)))


def test_psd_solve_under_jit_and_scan():
    H, g = _spd_batch(4, 13)
    Hj, gj = jnp.asarray(H), jnp.asarray(g)

    @jax.jit
    def run(H, g):
        def body(carry, _):
            dx = jax.vmap(psd_solve)(H, g + carry)
            return carry, dx
        _, out = jax.lax.scan(body, jnp.zeros_like(g[0]), jnp.arange(2))
        return out[-1]

    want = np.stack([np.linalg.solve(H[b], g[b]) for b in range(4)])
    np.testing.assert_allclose(np.asarray(run(Hj, gj)), want,
                               atol=5e-5 * np.max(np.abs(want)))


@pytest.mark.parametrize("B,n,r", [(3, 8, 4), (5, 23, 11), (130, 17, 9)])
def test_batched_psd_solve_multi_interpret(B, n, r):
    from omg_tools_tpu.ops.pallas_kernels import batched_psd_solve_multi
    rng = np.random.default_rng(1)
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    H = np.einsum("bij,bkj->bik", A, A) + 3 * np.eye(n, dtype=np.float32)
    G = rng.standard_normal((B, n, r)).astype(np.float32)
    want = np.stack([np.linalg.solve(H[b], G[b]) for b in range(B)])
    got = np.asarray(batched_psd_solve_multi(jnp.asarray(H), jnp.asarray(G),
                                             interpret=True))
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=5e-5 * scale)
