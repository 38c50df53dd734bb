"""Pallas TPU kernels for the solver hot path.

The ALM inner step solves one dense symmetric-positive-definite system
H dx = grad per scenario per Newton iteration (ops/alm.py:inner_step).  For
the canonical batch (B=256, n=151) XLA's batched Cholesky takes ~24 ms on a
v5e chip -- most of the inner-iteration budget -- because its blocked
LAPACK-style lowering leaves the VPU idle across the small matrices.

This kernel flips the layout: the BATCH lives in the 128-wide lane
dimension, so every Cholesky/substitution step is an elementwise vector op
across 128 scenarios at once (n sequential steps of (n, n, 128) masked
rank-1 updates -- ~n^3 * B VPU flops).  H stays in HBM (pltpu.ANY) and is
DMA'd into a VMEM scratch where it is factored in place; only dx (n, 128)
is written back.  Keeping the factor out of the kernel outputs halves the
HBM traffic and keeps the scoped-VMEM footprint to ONE (n, n, 128) buffer
-- an aliased in/out pair is staged twice by XLA when the call inlines
(unrolled single-tile case), which OOMs VMEM for n ~> 120.

Exposed as :func:`psd_solve`, a ``jax.custom_batching.custom_vmap`` op:
unbatched callers get XLA's cho_solve; vmapped callers (the batched MPC
rollout) dispatch to this kernel on TPU backends and to XLA elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["psd_solve", "batched_psd_solve", "psd_solve_multi",
           "pallas_available"]

_LANES = 128


def _chol_solve_kernel(H_hbm, g_ref, dx_ref, L_ref, z_ref, sem):
    """Factor H (n, n, 128) in a VMEM scratch and solve for dx (n, 128).

    H_hbm lives in HBM/ANY; L_ref/z_ref are VMEM scratch; sem is the DMA
    completion semaphore.
    """
    n = H_hbm.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (n, 1)

    # stage H into VMEM scratch
    copy = pltpu.make_async_copy(H_hbm, L_ref, sem)
    copy.start()
    copy.wait()

    # -- in-place masked right-looking Cholesky --------------------------
    def chol_step(j, _):
        diag = L_ref[pl.ds(j, 1), pl.ds(j, 1), :]          # (1, 1, 128)
        inv = jax.lax.rsqrt(diag[0])                        # (1, 128)
        col = L_ref[:, pl.ds(j, 1), :][:, 0, :] * inv       # (n, 128)
        col = jnp.where(row_iota >= j, col, 0.0)
        L_ref[:, pl.ds(j, 1), :] = col[:, None, :]
        strict = jnp.where(row_iota > j, col, 0.0)          # (n, 128)
        # trailing update: only rows>j, cols>j see nonzero outer product
        L_ref[:, :, :] = L_ref[:, :, :] \
            - strict[:, None, :] * strict[None, :, :]
        return 0

    jax.lax.fori_loop(0, n, chol_step, 0)

    # -- forward substitution: L z = g -----------------------------------
    def fwd_step(i, _):
        row = L_ref[pl.ds(i, 1), :, :][0]                   # (n, 128)
        mask = (row_iota < i).astype(row.dtype)             # (n, 1)
        acc = jnp.sum(row * z_ref[:, :] * mask, axis=0,
                      keepdims=True)                        # (1, 128)
        diag = L_ref[pl.ds(i, 1), pl.ds(i, 1), :][0]        # (1, 128)
        z_ref[pl.ds(i, 1), :] = (g_ref[pl.ds(i, 1), :] - acc) / diag
        return 0

    z_ref[:, :] = jnp.zeros_like(z_ref)
    jax.lax.fori_loop(0, n, fwd_step, 0)

    # -- backward substitution: L^T dx = z --------------------------------
    def bwd_step(t, _):
        i = n - 1 - t
        colT = L_ref[:, pl.ds(i, 1), :][:, 0, :]            # (n, 128) = L[:, i]
        mask = (row_iota > i).astype(colT.dtype)
        acc = jnp.sum(colT * dx_ref[:, :] * mask, axis=0,
                      keepdims=True)                        # (1, 128)
        diag = L_ref[pl.ds(i, 1), pl.ds(i, 1), :][0]
        dx_ref[pl.ds(i, 1), :] = (z_ref[pl.ds(i, 1), :] - acc) / diag
        return 0

    dx_ref[:, :] = jnp.zeros_like(dx_ref)
    jax.lax.fori_loop(0, n, bwd_step, 0)


def _solve_tile(H_t, g_t, interpret):
    """One (n, n, 128) tile: returns dx (n, 128)."""
    n = H_t.shape[0]
    dx = pl.pallas_call(
        _chol_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((n, _LANES), g_t.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, n, _LANES), H_t.dtype),
                        pltpu.VMEM((n, _LANES), g_t.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n ** 3 * _LANES),
            bytes_accessed=int(4 * n * n * _LANES),
            transcendentals=int(n * _LANES)),
    )(H_t, g_t)
    return dx


def _chol_solve_multi_kernel(H_hbm, G_ref, X_ref, L_ref, Z_ref, sem):
    """Factor H (n, n, 128) and solve for X (n, r, 128) with r RHS.

    Same lane-batched layout as :func:`_chol_solve_kernel`; the
    substitutions carry an (n, r, 128) panel instead of a vector.  Used by
    the block-arrow Newton step (ops/compact.detect_arrow), where each tail
    block needs D^-1 [C' | r] -- head-size + 1 right-hand sides."""
    n = H_hbm.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)   # (n, 1)

    copy = pltpu.make_async_copy(H_hbm, L_ref, sem)
    copy.start()
    copy.wait()

    def chol_step(j, _):
        diag = L_ref[pl.ds(j, 1), pl.ds(j, 1), :]           # (1, 1, 128)
        inv = jax.lax.rsqrt(diag[0])                        # (1, 128)
        col = L_ref[:, pl.ds(j, 1), :][:, 0, :] * inv       # (n, 128)
        col = jnp.where(row_iota >= j, col, 0.0)
        L_ref[:, pl.ds(j, 1), :] = col[:, None, :]
        strict = jnp.where(row_iota > j, col, 0.0)
        L_ref[:, :, :] = L_ref[:, :, :] \
            - strict[:, None, :] * strict[None, :, :]
        return 0

    jax.lax.fori_loop(0, n, chol_step, 0)

    # forward substitution: L Z = G, panel at a time
    def fwd_step(i, _):
        row = L_ref[pl.ds(i, 1), :, :][0]                   # (n, 128)
        mask = (row_iota < i).astype(row.dtype)             # (n, 1)
        w = (row * mask)[:, None, :]                        # (n, 1, 128)
        acc = jnp.sum(w * Z_ref[:, :, :], axis=0,
                      keepdims=True)                        # (1, r, 128)
        diag = L_ref[pl.ds(i, 1), pl.ds(i, 1), :][0]        # (1, 128)
        Z_ref[pl.ds(i, 1), :, :] = (G_ref[pl.ds(i, 1), :, :] - acc) \
            / diag[None, :, :]
        return 0

    Z_ref[:, :, :] = jnp.zeros_like(Z_ref)
    jax.lax.fori_loop(0, n, fwd_step, 0)

    # backward substitution: L^T X = Z
    def bwd_step(t, _):
        i = n - 1 - t
        colT = L_ref[:, pl.ds(i, 1), :][:, 0, :]            # (n, 128)
        mask = (row_iota > i).astype(colT.dtype)
        w = (colT * mask)[:, None, :]                       # (n, 1, 128)
        acc = jnp.sum(w * X_ref[:, :, :], axis=0,
                      keepdims=True)                        # (1, r, 128)
        diag = L_ref[pl.ds(i, 1), pl.ds(i, 1), :][0]
        X_ref[pl.ds(i, 1), :, :] = (Z_ref[pl.ds(i, 1), :, :] - acc) \
            / diag[None, :, :]
        return 0

    X_ref[:, :, :] = jnp.zeros_like(X_ref)
    jax.lax.fori_loop(0, n, bwd_step, 0)


def _solve_multi_tile(H_t, G_t, interpret):
    """One (n, n, 128) x (n, r, 128) tile: returns X (n, r, 128)."""
    n = H_t.shape[0]
    r = G_t.shape[1]
    X = pl.pallas_call(
        _chol_solve_multi_kernel,
        out_shape=jax.ShapeDtypeStruct((n, r, _LANES), G_t.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, n, _LANES), H_t.dtype),
                        pltpu.VMEM((n, r, _LANES), G_t.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * (n ** 3 + 2 * n * n * r) * _LANES),
            bytes_accessed=int(4 * n * (n + 2 * r) * _LANES),
            transcendentals=int(n * _LANES)),
    )(H_t, G_t)
    return X


def batched_psd_solve_multi(H, G, interpret=None):
    """Solve H[b] X[b] = G[b] for a batch of SPD systems with r RHS each.

    H: (N, n, n), G: (N, n, r).  Pads n and r to sublane multiples, N to the
    lane tile, and runs the fused multi-RHS Cholesky kernel per tile."""
    H = jnp.asarray(H)
    G = jnp.asarray(G)
    N, n, r = G.shape[0], G.shape[1], G.shape[2]
    if interpret is None:
        interpret = not _is_tpu_backend()
    n_pad = int(-(-n // 8) * 8)
    r_pad = int(-(-r // 8) * 8)
    N_pad = int(-(-N // _LANES) * _LANES)
    eye_tail = jnp.eye(n_pad, dtype=H.dtype)[None, n:, :]
    Hp = jnp.zeros((N_pad, n_pad, n_pad), dtype=H.dtype)
    Hp = Hp.at[:N, :n, :n].set(H)
    Hp = Hp.at[:, n:, :].set(jnp.broadcast_to(eye_tail,
                                              (N_pad, n_pad - n, n_pad)))
    Hp = Hp.at[N:].set(jnp.eye(n_pad, dtype=H.dtype)[None])
    Gp = jnp.zeros((N_pad, n_pad, r_pad), dtype=G.dtype)
    Gp = Gp.at[:N, :n, :r].set(G)

    Ht = jnp.moveaxis(Hp, 0, -1)          # (n_pad, n_pad, N_pad)
    Gt = jnp.moveaxis(Gp, 0, -1)          # (n_pad, r_pad, N_pad)

    tiles = N_pad // _LANES
    if tiles == 1:
        X_t = _solve_multi_tile(Ht, Gt, interpret)
    else:
        Ht = Ht.reshape(n_pad, n_pad, tiles, _LANES)
        Gt = Gt.reshape(n_pad, r_pad, tiles, _LANES)
        X_tiles = jax.lax.map(
            lambda args: _solve_multi_tile(args[0], args[1], interpret),
            (jnp.moveaxis(Ht, 2, 0), jnp.moveaxis(Gt, 2, 0)))
        X_t = jnp.moveaxis(X_tiles, 0, 2).reshape(n_pad, r_pad, N_pad)
    X = jnp.moveaxis(X_t, -1, 0)[:N, :n, :r]
    return X


@jax.custom_batching.custom_vmap
def psd_solve_multi(D, G):
    """Solve the SPD systems D[k] X[k] = G[k] (k small tail blocks, r RHS).

    Unbatched: XLA Cholesky per block.  Under vmap on a TPU backend the
    (batch, k) axes flatten into the lane dimension of the fused multi-RHS
    Pallas kernel."""
    return jax.vmap(lambda Di, Gi: jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(Di), Gi))(D, G)


@psd_solve_multi.def_vmap
def _psd_solve_multi_vmap_rule(axis_size, in_batched, D, G):
    D_b, G_b = in_batched
    if not D_b:
        D = jnp.broadcast_to(D, (axis_size,) + D.shape)
    if not G_b:
        G = jnp.broadcast_to(G, (axis_size,) + G.shape)
    B, k = D.shape[0], D.shape[1]
    Df = D.reshape((B * k,) + D.shape[2:])
    Gf = G.reshape((B * k,) + G.shape[2:])
    if _is_tpu_backend() and _fits_vmem(D.shape[-1], G.shape[-1]):
        Xf = batched_psd_solve_multi(Df, Gf, interpret=False)
    else:
        Xf = jax.vmap(lambda Di, Gi: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Di), Gi))(Df, Gf)
    return Xf.reshape(D.shape[0], k, G.shape[2], G.shape[3]), True


def _is_tpu_backend():
    try:
        dev = jax.devices()[0]
        plat = getattr(dev, "platform", "")
        return plat in ("tpu", "axon") or "TPU" in str(dev.device_kind)
    except Exception:
        return False


def _fits_vmem(n, r=1):
    """The lane-batched kernel keeps (n, n, 128) + (n, r, 128) f32 VMEM
    scratch; beyond ~12 MB (v5e scoped-vmem limit 16 MB minus in/out
    buffers) XLA's batched Cholesky takes over (larger matrices amortize
    its blocking well anyway)."""
    n_pad = -(-n // 8) * 8
    r_pad = -(-r // 8) * 8
    return 4 * _LANES * (n_pad * n_pad + 2 * n_pad * r_pad) < 12 * 2 ** 20


def batched_psd_solve(H, g, interpret=None):
    """Solve H[b] dx[b] = g[b] for a batch of SPD matrices.

    H: (B, n, n), g: (B, n).  Pads n to a multiple of 8 (sublane tile) and B
    to a multiple of 128 (lane tile), transposes the batch into the lane
    dimension, and runs the fused Cholesky+substitution kernel per tile."""
    H = jnp.asarray(H)
    g = jnp.asarray(g)
    B, n = g.shape
    if interpret is None:
        interpret = not _is_tpu_backend()
    n_pad = int(-(-n // 8) * 8)
    B_pad = int(-(-B // _LANES) * _LANES)
    eye_tail = jnp.eye(n_pad, dtype=H.dtype)[None, n:, :]
    Hp = jnp.zeros((B_pad, n_pad, n_pad), dtype=H.dtype)
    Hp = Hp.at[:B, :n, :n].set(H)
    # padded rows/cols get an identity diagonal so rsqrt stays finite
    Hp = Hp.at[:, n:, :].set(jnp.broadcast_to(eye_tail,
                                              (B_pad, n_pad - n, n_pad)))
    Hp = Hp.at[B:].set(jnp.eye(n_pad, dtype=H.dtype)[None])
    gp = jnp.zeros((B_pad, n_pad), dtype=g.dtype)
    gp = gp.at[:B, :n].set(g)

    Ht = jnp.moveaxis(Hp, 0, -1)          # (n_pad, n_pad, B_pad)
    gt = jnp.moveaxis(gp, 0, -1)          # (n_pad, B_pad)

    tiles = B_pad // _LANES
    if tiles == 1:
        dx_t = _solve_tile(Ht, gt, interpret)
    else:
        Ht = Ht.reshape(n_pad, n_pad, tiles, _LANES)
        gt = gt.reshape(n_pad, tiles, _LANES)
        dx_tiles = jax.lax.map(
            lambda args: _solve_tile(args[0], args[1], interpret),
            (jnp.moveaxis(Ht, 2, 0), jnp.moveaxis(gt, 1, 0)))
        dx_t = jnp.moveaxis(dx_tiles, 0, 1).reshape(n_pad, B_pad)
    dx = jnp.moveaxis(dx_t, -1, 0)[:B, :n]
    return dx


@jax.custom_batching.custom_vmap
def psd_solve(H, g):
    """Solve the SPD system H dx = g.

    Unbatched: XLA Cholesky.  Under vmap on a TPU backend: the Pallas
    lane-batched kernel (the ALM hot path, see module docstring)."""
    cho = jax.scipy.linalg.cho_factor(H)
    return jax.scipy.linalg.cho_solve(cho, g)


@psd_solve.def_vmap
def _psd_solve_vmap_rule(axis_size, in_batched, H, g):
    H_b, g_b = in_batched
    if not H_b:
        H = jnp.broadcast_to(H, (axis_size,) + H.shape)
    if not g_b:
        g = jnp.broadcast_to(g, (axis_size,) + g.shape)
    if _is_tpu_backend() and H.ndim == 3 and _fits_vmem(H.shape[-1]):
        out = batched_psd_solve(H, g, interpret=False)
    else:
        out = jax.vmap(lambda Hi, gi: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Hi), gi))(H, g)
    return out, True


def pallas_available():
    """True when the fast path will engage (TPU backend present)."""
    return _is_tpu_backend()
