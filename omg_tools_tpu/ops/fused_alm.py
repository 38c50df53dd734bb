"""Fused ALM inner loop: one Pallas kernel per outer round.

The round-4 roofline (BASELINE.md appendix) showed the batched rollout is
assembly-latency-bound: each inner Newton iteration of the compact-arrow
path costs ~31 ms at B=4096 because XLA materializes every per-family
intermediate (per-lane Jacobians, Gauss-Newton blocks, the arrow scatter
chain) to HBM -- tens of GB of traffic per iteration for ~2M MACs of
per-lane arithmetic.  This module fuses the ENTIRE inner loop -- family
Jacobian/constraint evaluation, arrow-system assembly, the lane-batched
block Cholesky + Schur solve, and the exact-quadratic Armijo line search
-- into a single Pallas kernel over 128-lane tiles.  All state (x, lam,
rho, resolved constraint tensors) stays VMEM-resident across all inner
iterations; per-outer-round HBM traffic collapses to reading/writing the
~1 MB lane state per tile.

Key structural facts exploited (see ops/compact.py):
- constraint families fall into three kinds:
    'const': A shared across lanes (velocity/acceleration/terminal rows)
             -- g/gradient become (m_f, n_f) x (n_f, 128) MXU matmuls and
             the Gauss-Newton block H = A' D A becomes a precomputed
             P[(r,s),k] @ d matmul (P built host-side per phase);
    'param': A = A0 + TA.pq varies per lane but not per iteration
             (collision rows: obstacle state enters the Jacobian);
    'quad':  J = A + 2 Q x  (hyperplane-norm and vehicle-side collision
             rows) -- the Q contraction is a (m_f*n_f, n_f) @ (n_f, 128)
             MXU matmul with the batch in the lane dimension;
- per-obstacle families share identical tensors (same structure, different
  parameters), so unique-tensor tables cut shared VMEM ~3x;
- the block-arrow Newton solve runs in-kernel with the masked lane-batched
  Cholesky (same scheme as ops/pallas_kernels.py), in the factored form
  S_t = S - Y'Y with Y = L^-1 [C' | r_b]: the C blocks are assembled
  directly transposed (H is symmetric) and never stored twice.

Reference anchor: this kernel replaces the role of Ipopt's iteration at
ref problems/problem.py:113 for the batched rollout path.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedPlan", "make_fused_kernel"]

_LANES = 128


class _FamPlan(NamedTuple):
    kind: str                 # 'const' | 'param' | 'quad'
    row_start: int
    row_stop: int
    runs: Tuple[Tuple[int, int], ...]
    segs: Tuple[Tuple[int, int, int, int], ...]
    iA: int                   # unique-A table index
    iTA: int                  # unique-TA table index (-1: none)
    iQ: int                   # unique-Qflat table index (-1: none)
    iP: int                   # unique-P table index (-1: non-const)
    qpos: Tuple[int, ...]     # qcols as positions within pcols


def _dedup(arrays):
    """Return (unique_list, index_per_input) by array equality."""
    uniq, idx = [], []
    for a in arrays:
        found = -1
        for j, u in enumerate(uniq):
            if u.shape == a.shape and np.array_equal(u, a):
                found = j
                break
        if found < 0:
            uniq.append(a)
            found = len(uniq) - 1
        idx.append(found)
    return uniq, idx


class FusedPlan:
    """Host-side preparation of the fused-kernel operands for one
    :class:`ops.compact.CompactStructure` with a detected arrow."""

    def __init__(self, struct):
        assert struct.arrow is not None, "fused kernel needs the arrow"
        self.struct = struct
        ar = struct.arrow
        self.head = ar.head
        self.blocks = ar.blocks
        self.n_x = struct.n_x
        self.m = struct.m
        t = struct.tensors
        self.pcols = np.asarray(t["pcols"], dtype=np.int64)
        self.n_v = len(self.pcols)
        self.spk = np.asarray(t["c0"]).shape[0]

        pos_of = {int(c): i for i, c in enumerate(self.pcols)}

        A_for, TA_for, Q_for, P_for = [], [], [], []
        fams: List[_FamPlan] = []
        for i, fam in enumerate(struct.families):
            A0c = np.asarray(t["A0c"][i])          # (spk, m_f, n_f)
            TAc = t["TAc"][i]
            Qc = t["Qc"][i]
            segs = ar.fam_segments[i]
            if Qc is not None:
                kind = "quad"
            elif TAc is not None:
                kind = "param"
            else:
                kind = "const"
            iA = len(A_for)
            A_for.append(A0c)
            iTA = -1
            if TAc is not None:
                iTA = len(TA_for)
                TA_for.append(np.asarray(TAc))
            iQ = -1
            if Qc is not None:
                Qc = np.asarray(Qc)
                m_f, n_f = Qc.shape[0], Qc.shape[1]
                iQ = len(Q_for)
                # flat (m_f*n_f, n_f) layout: t1 = Qflat @ xf is an MXU
                # matmul with the lanes in the 128-wide minor dimension
                Q_for.append(np.ascontiguousarray(
                    Qc.reshape(m_f * n_f, n_f)))
            iP = -1
            if kind == "const":
                # P[ph, (r,s), k] = A[ph,k,r] * A[ph,k,s]: H = P @ (d*rho)
                iP = len(P_for)
                P_for.append(np.ascontiguousarray(
                    np.einsum("pkr,pks->prsk", A0c, A0c).reshape(
                        A0c.shape[0], A0c.shape[2] * A0c.shape[2],
                        A0c.shape[1])))
            qpos = tuple(pos_of[int(c)] for c in fam.qcols)
            fams.append(_FamPlan(kind, fam.row_start, fam.row_stop,
                                 fam.runs, segs, iA, iTA, iQ, iP, qpos))

        # dedup unique tensor tables (per-obstacle families share tensors)
        self.uA, a_map = _dedup(A_for)
        self.uTA, ta_map = _dedup(TA_for)
        self.uQ, q_map = _dedup(Q_for)
        self.uP, p_map = _dedup(P_for)
        self.fams = [f._replace(
            iA=a_map[f.iA],
            iTA=-1 if f.iTA < 0 else ta_map[f.iTA],
            iQ=-1 if f.iQ < 0 else q_map[f.iQ],
            iP=-1 if f.iP < 0 else p_map[f.iP]) for f in fams]
        self.c0 = np.asarray(t["c0"])
        self.C1 = np.asarray(t["C1"])
        self.f0 = np.asarray(t["f0"])
        self.gf = np.asarray(t["gf"])

    # -- device operand preparation ----------------------------------------
    def shared(self, dtype):
        """Device pytree of the kernel's shared operands (phase axes kept;
        slice with :meth:`slice_phase` per solve)."""
        as_dt = lambda a: jnp.asarray(a, dtype=dtype)   # noqa: E731
        return {
            "ph": {
                "uA": tuple(as_dt(a) for a in self.uA),
                "uTA": tuple(as_dt(a) for a in self.uTA),
                "uP": tuple(as_dt(a) for a in self.uP),
                "c0": as_dt(self.c0),
                "C1": as_dt(self.C1),
                "f0": as_dt(self.f0),
                "gf": as_dt(self.gf),
            },
            "q": tuple(as_dt(a) for a in self.uQ),
        }

    @staticmethod
    def slice_phase(shared, phase):
        """Resolve the discrete in-knot phase (traced scalar ok)."""
        ph = jax.tree_util.tree_map(
            lambda a: jnp.take(a, phase, axis=0), shared["ph"])
        return {"ph": ph, "q": shared["q"]}

    def vmem_estimate(self):
        """Rough f32 VMEM footprint (bytes) of one kernel tile: shared
        operands + lane state + assembly scratch + the largest family
        transients.  Used to gate the fused path before Mosaic would hit
        the 16 MB scoped-vmem limit."""
        fl = 4 * _LANES
        shared = 4 * (sum(a[0].size for a in self.uA)
                      + sum(a[0].size for a in self.uTA)
                      + sum(a.size for a in self.uQ)
                      + sum(a[0].size for a in self.uP)
                      + self.C1[0].size + self.c0[0].size + 2 * self.m)
        state = fl * (2 * self.n_x + 3 * self.m + self.n_v + 4)
        h = self.head[1]
        assembly = fl * (h * h + sum(b * b + b * (h + 1)
                                     for (_, b) in self.blocks))
        trans = 0
        for f in self.fams:
            n_f = sum(sz for (_, sz) in f.runs)
            m_f = f.row_stop - f.row_start
            sz = n_f * n_f + (0 if f.kind == "const" else 2 * m_f * n_f)
            trans = max(trans, fl * sz)
        return 2 * shared + 2 * state + assembly + trans + fl * 3 * self.m


# -- in-kernel numerics (lane-last layout, masked lane-batched) -------------

def _masked_chol(L_ref, n):
    """In-place masked lane-batched Cholesky of L_ref (n, n, 128)
    (ops/pallas_kernels.py scheme: the batch lives in the lane dim)."""
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def step(j, _):
        diag = L_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        inv = jax.lax.rsqrt(diag[0])
        col = L_ref[:, pl.ds(j, 1), :][:, 0, :] * inv
        col = jnp.where(row_iota >= j, col, 0.0)
        L_ref[:, pl.ds(j, 1), :] = col[:, None, :]
        strict = jnp.where(row_iota > j, col, 0.0)
        L_ref[:, :, :] = L_ref[:, :, :] \
            - strict[:, None, :] * strict[None, :, :]
        return 0

    jax.lax.fori_loop(0, n, step, 0)


def _fwd_subst_panel(L_ref, M_ref, n, r):
    """In-place forward substitution  M <- L^-1 M  (M: (n, r, 128))."""
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def step(i, _):
        row = L_ref[pl.ds(i, 1), :, :][0]                 # (n, 128)
        mask = (row_iota < i).astype(row.dtype)
        w = (row * mask)[:, None, :]                      # (n, 1, 128)
        acc = jnp.sum(w * M_ref[:, :, :], axis=0, keepdims=True)
        diag = L_ref[pl.ds(i, 1), pl.ds(i, 1), :][0]      # (1, 128)
        M_ref[pl.ds(i, 1), :, :] = (M_ref[pl.ds(i, 1), :, :] - acc) \
            / diag[None, :, :]
        return 0

    jax.lax.fori_loop(0, n, step, 0)


def _fwd_subst_vec(L_ref, z, n):
    """Solve L x = z for one RHS (z: (n, 128) value), returns x."""
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def step(i, x):
        row = L_ref[pl.ds(i, 1), :, :][0]
        mask = (row_iota < i).astype(row.dtype)
        acc = jnp.sum(row * x * mask, axis=0, keepdims=True)
        diag = L_ref[pl.ds(i, 1), pl.ds(i, 1), :][0]
        num = jax.lax.dynamic_slice_in_dim(z, i, 1, axis=0) - acc
        return jax.lax.dynamic_update_slice_in_dim(x, num / diag, i, axis=0)

    return jax.lax.fori_loop(0, n, step, jnp.zeros_like(z))


def _bwd_subst_vec(L_ref, z, n):
    """Solve L' x = z for one RHS (z: (n, 128) value), returns x."""
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def step(t, x):
        i = n - 1 - t
        colT = L_ref[:, pl.ds(i, 1), :][:, 0, :]          # (n, 128)
        mask = (row_iota > i).astype(colT.dtype)
        acc = jnp.sum(colT * x * mask, axis=0, keepdims=True)
        diag = L_ref[pl.ds(i, 1), pl.ds(i, 1), :][0]
        num = jax.lax.dynamic_slice_in_dim(z, i, 1, axis=0) - acc
        return jax.lax.dynamic_update_slice_in_dim(x, num / diag, i, axis=0)

    return jax.lax.fori_loop(0, n, step, jnp.zeros_like(z))


def _diag3(val, n):
    """Diagonal of an (n, n, 128) value -> (n, 128)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    return jnp.sum(jnp.where(ri == ci, val, 0.0), axis=1)


def _eye3(n, dtype):
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    return jnp.where(ri == ci, jnp.ones((), dtype), jnp.zeros((), dtype))


def make_fused_kernel(plan: FusedPlan, opt, n_inner: int,
                      interpret: bool = False):
    """Build the batched fused-inner-loop function.

    Returns ``fn(shared_ph, xT, lamT, rhoT, pvT, lbc, ubc)`` with lane-last
    layouts xT (n, B), lamT (m, B), rhoT (1, B), pvT (n_v, B) and shared
    scaled/permuted bounds lb/ub (m,); B must be a multiple of 128.
    Output: (xT_new, gvT, statT) with gv the constraint value at the final
    iterate (exact-quadratic update) and stat the last iteration's gradient
    inf-norm, mirroring ops/alm.inner_step_compact.
    """
    fams = plan.fams
    n = plan.n_x
    m = plan.m
    n_v = plan.n_v
    h0, h = plan.head
    blocks = plan.blocks
    k_blk = len(blocks)
    cands = tuple(float(a) for a in opt.ls_candidates)
    armijo = float(opt.armijo)
    max_step = float(opt.max_step)
    gn_rel = float(opt.gn_delta_rel)
    delta = float(opt.delta)

    n_uA = len(plan.uA)
    n_uTA = len(plan.uTA)
    n_uQ = len(plan.uQ)
    n_uP = len(plan.uP)
    n_shared = n_uA + n_uTA + n_uQ + n_uP + 5    # + c0, C1, gf, lb, ub

    def kern(*refs):
        ins = refs[:n_shared + 4]
        x_out, gv_out, stat_out = refs[n_shared + 4:n_shared + 7]
        scr = refs[n_shared + 7:]
        uA = ins[:n_uA]
        uTA = ins[n_uA:n_uA + n_uTA]
        uQ = ins[n_uA + n_uTA:n_uA + n_uTA + n_uQ]
        uP = ins[n_uA + n_uTA + n_uQ:n_uA + n_uTA + n_uQ + n_uP]
        c0_ref, C1_ref, gf_ref, lb_ref, ub_ref = \
            ins[n_uA + n_uTA + n_uQ + n_uP:n_shared]
        x_ref, lam_ref, rho_ref, pv_ref = ins[n_shared:]
        cv = scr[0]
        S = scr[1]
        D_refs = list(scr[2:2 + k_blk])
        M_refs = list(scr[2 + k_blk:2 + 2 * k_blk])
        grad_ref = scr[2 + 2 * k_blk]
        dt = x_ref.dtype

        # resolved constraint constants c(p) = c0 + C1 pv (once per tile)
        cv[:, :] = c0_ref[:, :] + jnp.dot(C1_ref[:, :], pv_ref[:, :],
                                          preferred_element_type=dt)
        x_out[:, :] = x_ref[:, :]
        rho = rho_ref[0:1, :]                      # (1, 128)
        lam_over_rho = lam_ref[:, :] / rho         # (m, 128)
        lb = lb_ref[:, :]                          # (m, 1), broadcasts
        ub = ub_ref[:, :]
        gfv = gf_ref[:, :]                         # (n, 1)

        def gather(vec, runs):
            parts = [vec[s:s + sz, :] for (s, sz) in runs]
            return parts[0] if len(parts) == 1 else \
                jnp.concatenate(parts, axis=0)

        def fam_A(f):
            """Per-lane A (m_f, n_f, 128) -- or lane-free (m_f, n_f, 1)
            when the family has no parameter-dependent Jacobian."""
            A = uA[f.iA][:, :][:, :, None]         # (m_f, n_f, 1)
            if f.iTA >= 0:
                TA = uTA[f.iTA][:, :, :]           # (m_f, n_f, n_q)
                pq = jnp.concatenate(
                    [pv_ref[q:q + 1, :] for q in f.qpos], axis=0)
                m_f, n_f, n_q = TA.shape
                TAp = jnp.dot(TA.reshape(m_f * n_f, n_q), pq,
                              preferred_element_type=dt)
                A = A + TAp.reshape(m_f, n_f, _LANES)
            return A

        def body(it, carry):
            x = x_out[:, :]                        # (n, 128)

            # -- pass 1: constraint values g(x), multiplier estimate -------
            gv_parts = [None] * len(fams)
            for fi, f in enumerate(fams):
                xf = gather(x, f.runs)             # (n_f, 128)
                rows = cv[f.row_start:f.row_stop, :]
                if f.kind == "const":
                    A2 = uA[f.iA][:, :]            # (m_f, n_f) shared
                    gv_parts[fi] = rows + jnp.dot(
                        A2, xf, preferred_element_type=dt)
                else:
                    A = fam_A(f)
                    if f.iQ >= 0:
                        Qf = uQ[f.iQ][:, :]
                        m_f = f.row_stop - f.row_start
                        n_f = xf.shape[0]
                        t1 = jnp.dot(Qf, xf, preferred_element_type=dt)
                        # g = c + A x + x'Qx = c + (A + t1) x
                        A = A + t1.reshape(m_f, n_f, _LANES)
                    gv_parts[fi] = rows + jnp.sum(A * xf[None, :, :], axis=1)
            gv = jnp.concatenate(gv_parts, axis=0)          # (m, 128)
            r = gv + lam_over_rho
            proj = jnp.clip(r, lb, ub)
            y_hat = rho * (r - proj)                        # (m, 128)
            dw = jnp.where(jnp.abs(y_hat) > 0.0, rho, 0.0)  # active * rho

            # -- pass 2: arrow-system assembly -----------------------------
            S[:, :, :] = jnp.zeros((h, h, _LANES), dt)
            r_h = jnp.broadcast_to(gfv[h0:h0 + h, :], (h, _LANES))
            for bi, (s, sz) in enumerate(blocks):
                M_refs[bi][:, :, :] = jnp.concatenate(
                    [jnp.zeros((sz, h, _LANES), dt),
                     jnp.broadcast_to(gfv[s:s + sz, :],
                                      (sz, _LANES))[:, None, :]], axis=1)
                D_refs[bi][:, :, :] = jnp.zeros((sz, sz, _LANES), dt)

            for fi, f in enumerate(fams):
                y_f = y_hat[f.row_start:f.row_stop, :]      # (m_f, 128)
                d_f = dw[f.row_start:f.row_stop, :]
                n_f = sum(szr for (_, szr) in f.runs)
                m_f = f.row_stop - f.row_start
                if f.kind == "const":
                    A2 = uA[f.iA][:, :]
                    g_f = jnp.dot(A2.T, y_f, preferred_element_type=dt)
                    Hf = jnp.dot(uP[f.iP][:, :], d_f,
                                 preferred_element_type=dt)
                    H = Hf.reshape(n_f, n_f, _LANES)
                else:
                    xf = gather(x_out[:, :], f.runs)
                    A = fam_A(f)
                    if f.iQ >= 0:
                        Qf = uQ[f.iQ][:, :]
                        t1 = jnp.dot(Qf, xf, preferred_element_type=dt)
                        J = A + 2.0 * t1.reshape(m_f, n_f, _LANES)
                    else:
                        J = jnp.broadcast_to(A, (m_f, n_f, _LANES))
                    g_f = jnp.sum(J * y_f[:, None, :], axis=0)
                    Jw = J * d_f[:, None, :]

                    def haccum(k, acc):
                        return acc + Jw[k][:, None, :] * J[k][None, :, :]
                    H = jax.lax.fori_loop(
                        0, m_f, haccum, jnp.zeros((n_f, n_f, _LANES), dt))

                for (oa, sa, ta, pa) in f.segs:
                    gseg = g_f[oa:oa + sa, :]
                    if ta < 0:
                        # value .at[].add lowers to scatter_add whose empty
                        # index vector pallas cannot capture; static pad+add
                        # is equivalent and scatter-free
                        r_h = r_h + jnp.pad(gseg,
                                            ((pa, h - pa - sa), (0, 0)))
                    else:
                        M_refs[ta][pa:pa + sa, h:h + 1, :] = \
                            M_refs[ta][pa:pa + sa, h:h + 1, :] \
                            + gseg[:, None, :]
                    for (ob, sb, tb, pb) in f.segs:
                        if ta >= 0 and tb < 0:
                            continue               # mirror of (head, block)
                        if ta < 0 and tb < 0:
                            S[pa:pa + sa, pb:pb + sb, :] = \
                                S[pa:pa + sa, pb:pb + sb, :] \
                                + H[oa:oa + sa, ob:ob + sb, :]
                        elif ta < 0:
                            # C' accumulated pre-transposed (H symmetric)
                            M_refs[tb][pb:pb + sb, pa:pa + sa, :] = \
                                M_refs[tb][pb:pb + sb, pa:pa + sa, :] \
                                + H[ob:ob + sb, oa:oa + sa, :]
                        else:
                            D_refs[ta][pa:pa + sa, pb:pb + sb, :] = \
                                D_refs[ta][pa:pa + sa, pb:pb + sb, :] \
                                + H[oa:oa + sa, ob:ob + sb, :]

            # full gradient gf + J'y (for slope/stat/fallback)
            grad_ref[:, :] = jnp.broadcast_to(gfv, (n, _LANES))
            grad_ref[h0:h0 + h, :] = r_h
            for bi, (s, sz) in enumerate(blocks):
                grad_ref[s:s + sz, :] = M_refs[bi][:, h:h + 1, :][:, 0, :]

            # -- ridge ----------------------------------------------------
            dmax = jnp.max(jnp.abs(_diag3(S[:, :, :], h)), axis=0,
                           keepdims=True)
            for bi, (s, sz) in enumerate(blocks):
                dmax = jnp.maximum(dmax, jnp.max(
                    jnp.abs(_diag3(D_refs[bi][:, :, :], sz)), axis=0,
                    keepdims=True))
            ridge = gn_rel * jnp.maximum(dmax, 1.0) + delta     # (1, 128)
            S[:, :, :] = S[:, :, :] + _eye3(h, dt) * ridge[None, :, :]

            # -- factor tail blocks, Y = L^-1 [C' | r_b], Schur ------------
            S_t = S[:, :, :]
            r_t = r_h
            for bi, (s, sz) in enumerate(blocks):
                D_refs[bi][:, :, :] = D_refs[bi][:, :, :] \
                    + _eye3(sz, dt) * ridge[None, :, :]
                _masked_chol(D_refs[bi], sz)
                _fwd_subst_panel(D_refs[bi], M_refs[bi], sz, h + 1)
                Y = M_refs[bi][:, :, :]            # (sz, h+1, 128)

                def schur(k, acc):
                    yk = Y[k]                      # (h+1, 128)
                    return acc + yk[:h, None, :] * yk[None, :, :]
                G = jax.lax.fori_loop(
                    0, sz, schur, jnp.zeros((h, h + 1, _LANES), dt))
                S_t = S_t - G[:, :h, :]
                r_t = r_t - G[:, h, :]

            # -- head solve + back-substitution ---------------------------
            S[:, :, :] = S_t
            _masked_chol(S, h)
            z_h = _fwd_subst_vec(S, r_t, h)
            dx_h = _bwd_subst_vec(S, z_h, h)       # (h, 128)

            dx = jnp.zeros((n, _LANES), dt)
            dx = dx.at[h0:h0 + h, :].set(dx_h)
            for bi, (s, sz) in enumerate(blocks):
                Y = M_refs[bi][:, :, :]
                t_b = Y[:, h, :] - jnp.sum(
                    Y[:, :h, :] * dx_h[None, :, :], axis=1)   # (sz, 128)
                dx_b = _bwd_subst_vec(D_refs[bi], t_b, sz)
                dx = dx.at[s:s + sz, :].set(dx_b)
            dx = -dx

            # -- fallback + trust region ----------------------------------
            grad = grad_ref[:, :]
            finite = jnp.all(jnp.isfinite(dx), axis=0, keepdims=True)
            gnorm2 = jnp.sqrt(jnp.sum(grad * grad, axis=0, keepdims=True))
            dx = jnp.where(finite, dx, -grad / jnp.maximum(gnorm2, 1.0))
            dx_norm = jnp.max(jnp.abs(dx), axis=0, keepdims=True)
            dx = dx * jnp.minimum(1.0, max_step
                                  / jnp.maximum(dx_norm, 1e-12))

            # -- exact-quadratic Armijo line search ------------------------
            slope = jnp.sum(grad * dx, axis=0, keepdims=True)   # (1, 128)
            Jd_parts = [None] * len(fams)
            qd_parts = [None] * len(fams)
            for fi, f in enumerate(fams):
                df_f = gather(dx, f.runs)
                m_f = f.row_stop - f.row_start
                n_f = df_f.shape[0]
                if f.kind == "const":
                    A2 = uA[f.iA][:, :]
                    Jd_parts[fi] = jnp.dot(A2, df_f,
                                           preferred_element_type=dt)
                else:
                    A = fam_A(f)
                    if f.iQ >= 0:
                        xf = gather(x_out[:, :], f.runs)
                        Qf = uQ[f.iQ][:, :]
                        t2 = jnp.dot(Qf, df_f, preferred_element_type=dt)
                        t2 = t2.reshape(m_f, n_f, _LANES)
                        t1 = jnp.dot(Qf, xf, preferred_element_type=dt)
                        J = A + 2.0 * t1.reshape(m_f, n_f, _LANES)
                        Jd_parts[fi] = jnp.sum(J * df_f[None, :, :], axis=1)
                        qd_parts[fi] = jnp.sum(t2 * df_f[None, :, :], axis=1)
                    else:
                        Jd_parts[fi] = jnp.sum(A * df_f[None, :, :], axis=1)
            Jd = jnp.concatenate(Jd_parts, axis=0)              # (m, 128)
            qd = jnp.concatenate(
                [qp if qp is not None else
                 jnp.zeros((f.row_stop - f.row_start, _LANES), dt)
                 for qp, f in zip(qd_parts, fams)], axis=0)

            df_obj = jnp.sum(gfv * dx, axis=0, keepdims=True)   # (1, 128)

            def penalty(gvc):
                rr = gvc + lam_over_rho
                pp = jnp.clip(rr, lb, ub)
                return 0.5 * rho * jnp.sum((rr - pp) ** 2, axis=0,
                                           keepdims=True)

            m0 = penalty(gv)           # f0 + gf.x cancels in the comparison
            alpha = jnp.zeros((1, _LANES), dt)
            found = jnp.zeros((1, _LANES), jnp.bool_)
            for a in cands:
                mv = a * df_obj + penalty(gv + a * Jd + (a * a) * qd)
                ok = jnp.isfinite(mv) & (mv <= m0 + armijo * a * slope)
                alpha = jnp.where(ok & jnp.logical_not(found), a, alpha)
                found = found | ok

            x_out[:, :] = x_out[:, :] + alpha * dx
            gv_out[:, :] = gv + alpha * Jd + (alpha * alpha) * qd
            stat_out[:, :] = jnp.max(jnp.abs(grad), axis=0, keepdims=True)
            return carry

        jax.lax.fori_loop(0, n_inner, body, jnp.zeros((), jnp.int32))

    # -- pallas_call wiring ------------------------------------------------
    def fn(shared_ph, xT, lamT, rhoT, pvT, lbc, ubc):
        B = xT.shape[1]
        assert B % _LANES == 0, B
        tiles = B // _LANES
        dt = xT.dtype
        ph = shared_ph["ph"]
        shared_ops = (list(ph["uA"]) + list(ph["uTA"])
                      + list(shared_ph["q"]) + list(ph["uP"])
                      + [ph["c0"].reshape(m, 1), ph["C1"],
                         ph["gf"].reshape(n, 1),
                         lbc.reshape(m, 1), ubc.reshape(m, 1)])

        def shared_spec(a):
            return pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                                memory_space=pltpu.VMEM)

        def lane_spec(rows):
            return pl.BlockSpec((rows, _LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        in_specs = [shared_spec(a) for a in shared_ops] + \
            [lane_spec(n), lane_spec(m), lane_spec(1), lane_spec(n_v)]
        out_specs = (lane_spec(n), lane_spec(m), lane_spec(1))
        out_shape = (jax.ShapeDtypeStruct((n, B), dt),
                     jax.ShapeDtypeStruct((m, B), dt),
                     jax.ShapeDtypeStruct((1, B), dt))
        scratch = ([pltpu.VMEM((m, _LANES), dt),           # cv
                    pltpu.VMEM((h, h, _LANES), dt)]        # S
                   + [pltpu.VMEM((sz, sz, _LANES), dt) for (_, sz) in blocks]
                   + [pltpu.VMEM((sz, h + 1, _LANES), dt)
                      for (_, sz) in blocks]
                   + [pltpu.VMEM((n, _LANES), dt)])        # grad

        return pl.pallas_call(
            kern,
            grid=(tiles,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*shared_ops, xT, lamT, rhoT, pvT)

    return fn
