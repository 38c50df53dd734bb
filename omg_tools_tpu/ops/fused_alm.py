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
    """In-place lane-batched Cholesky of L_ref (n, n, 128), statically
    unrolled: each step's rank-1 update touches only the trailing
    (n-j-1)^2 submatrix (the masked fori version updates the full matrix
    every step -- 3x the flops; static slices make the mask unnecessary
    and every access aligned to the actual triangle)."""
    for j in range(n):
        diag = L_ref[j:j + 1, j:j + 1, :]
        inv = jax.lax.rsqrt(diag[0])
        col = L_ref[j:, j:j + 1, :][:, 0, :] * inv        # (n-j, 128)
        L_ref[j:, j:j + 1, :] = col[:, None, :]
        if j + 1 < n:
            strict = col[1:]                              # (n-j-1, 128)
            L_ref[j + 1:, j + 1:, :] = L_ref[j + 1:, j + 1:, :] \
                - strict[:, None, :] * strict[None, :, :]


def _fwd_subst_panel(L_ref, M_ref, n, r):
    """In-place forward substitution  M <- L^-1 M  (M: (n, r, 128)),
    statically unrolled over rows (triangular work, no masking)."""
    for i in range(n):
        diag = L_ref[i:i + 1, i:i + 1, :][0]              # (1, 128)
        if i > 0:
            row = L_ref[i:i + 1, :i, :][0]                # (i, 128)
            acc = jnp.sum(row[:, None, :] * M_ref[:i, :, :], axis=0,
                          keepdims=True)                  # (1, r, 128)
            M_ref[i:i + 1, :, :] = (M_ref[i:i + 1, :, :] - acc) \
                / diag[None, :, :]
        else:
            M_ref[i:i + 1, :, :] = M_ref[i:i + 1, :, :] / diag[None, :, :]


def _fwd_subst_col(L_ref, P_ref, n, col):
    """In-place forward substitution of ONE panel column:
    P[:, col] <- L^-1 P[:, col]  (static col and rows -- Mosaic has no
    dynamic_slice on values, and static triangular slices halve the
    flops vs the masked full-row scheme)."""
    for i in range(n):
        diag = L_ref[i:i + 1, i:i + 1, :][0]
        x_i = P_ref[i:i + 1, col:col + 1, :][:, 0, :]
        if i > 0:
            row = L_ref[i:i + 1, :i, :][0]                # (i, 128)
            x = P_ref[:i, col:col + 1, :][:, 0, :]        # (i, 128)
            acc = jnp.sum(row * x, axis=0, keepdims=True)
            x_i = x_i - acc
        P_ref[i:i + 1, col:col + 1, :] = (x_i / diag)[:, None, :]


def _bwd_subst_col(L_ref, P_ref, n, col):
    """In-place backward substitution of ONE panel column:
    P[:, col] <- L'^-1 P[:, col] (statically unrolled)."""
    for t in range(n):
        i = n - 1 - t
        diag = L_ref[i:i + 1, i:i + 1, :][0]
        x_i = P_ref[i:i + 1, col:col + 1, :][:, 0, :]
        if i + 1 < n:
            colT = L_ref[i + 1:, i:i + 1, :][:, 0, :]     # (n-i-1, 128)
            x = P_ref[i + 1:, col:col + 1, :][:, 0, :]
            acc = jnp.sum(colT * x, axis=0, keepdims=True)
            x_i = x_i - acc
        P_ref[i:i + 1, col:col + 1, :] = (x_i / diag)[:, None, :]


def _gram_rows(Y, n_rows):
    """Row-wise Gram accumulation G[r, c, l] = sum_k Y[k, r, l] Y[k, c, l]
    for the first ``n_rows`` columns r, as a static Python loop (Mosaic
    has no dynamic value indexing; the per-row slice is static)."""
    rows = [jnp.sum(Y[:, r:r + 1, :] * Y, axis=0) for r in range(n_rows)]
    return jnp.stack(rows, axis=0)                       # (n_rows, r, 128)


def _jtdj_rows(J, Jw, n_f):
    """H[r, s, l] = sum_k Jw[k, r, l] J[k, s, l] via a static row loop."""
    rows = [jnp.sum(Jw[:, r:r + 1, :] * J, axis=0) for r in range(n_f)]
    return jnp.stack(rows, axis=0)                       # (n_f, n_f, 128)


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
    # fold same-size tail blocks along the LANE dimension: one Cholesky /
    # substitution sweep per size group processes all its blocks at once
    # (k_g x 128 lanes wide), amortizing the sequential triangular steps
    # that dominate the factor section
    _sizes = {}
    for _bi, (_s, _sz) in enumerate(blocks):
        _sizes.setdefault(_sz, []).append(_bi)
    groups = [(sz, tuple(bis)) for sz, bis in _sizes.items()]
    blk_slot = {}
    for _gi, (_sz, _bis) in enumerate(groups):
        for _slot, _bi in enumerate(_bis):
            blk_slot[_bi] = (_gi, _slot)
    n_grp = len(groups)
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
        D_refs = list(scr[2:2 + n_grp])            # per size group, wide
        M_refs = list(scr[2 + n_grp:2 + 2 * n_grp])
        grad_ref = scr[2 + 2 * n_grp]
        Wh = scr[3 + 2 * n_grp]
        dt = x_ref.dtype

        def dotf(a, b):
            # f32 MXU passes pinned to HIGHEST: constraint Jacobians feed
            # an ill-conditioned Cholesky; bf16 multiplies are too lossy
            # (see ops/alm.py solve docstring)
            return jnp.dot(a, b, preferred_element_type=dt,
                           precision=jax.lax.Precision.HIGHEST)

        def _wide(bi):
            """(group ref index, lane offset) of block bi."""
            gi, slot = blk_slot[bi]
            return gi, slot * _LANES

        # resolved constraint constants c(p) = c0 + C1 pv (once per tile)
        cv[:, :] = c0_ref[:, :] + dotf(C1_ref[:, :], pv_ref[:, :])
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
                TAp = dotf(TA.reshape(m_f * n_f, n_q), pq)
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
                    gv_parts[fi] = rows + dotf(A2, xf)
                else:
                    A = fam_A(f)
                    if f.iQ >= 0:
                        Qf = uQ[f.iQ][:, :]
                        m_f = f.row_stop - f.row_start
                        n_f = xf.shape[0]
                        t1 = dotf(Qf, xf)
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
            for gi, (sz, bis) in enumerate(groups):
                W = len(bis) * _LANES
                M_refs[gi][:, :, :] = jnp.zeros((sz, h + 2, W), dt)
                D_refs[gi][:, :, :] = jnp.zeros((sz, sz, W), dt)
            for bi, (s, sz) in enumerate(blocks):
                gi, off = _wide(bi)
                M_refs[gi][:, h:h + 1, off:off + _LANES] = \
                    jnp.broadcast_to(gfv[s:s + sz, :],
                                     (sz, _LANES))[:, None, :]

            for fi, f in enumerate(fams):
                y_f = y_hat[f.row_start:f.row_stop, :]      # (m_f, 128)
                d_f = dw[f.row_start:f.row_stop, :]
                n_f = sum(szr for (_, szr) in f.runs)
                m_f = f.row_stop - f.row_start
                if f.kind == "const":
                    A2 = uA[f.iA][:, :]
                    g_f = dotf(A2.T, y_f)
                    Hf = dotf(uP[f.iP][:, :], d_f)
                    H = Hf.reshape(n_f, n_f, _LANES)
                else:
                    xf = gather(x_out[:, :], f.runs)
                    A = fam_A(f)
                    if f.iQ >= 0:
                        Qf = uQ[f.iQ][:, :]
                        t1 = dotf(Qf, xf)
                        J = A + 2.0 * t1.reshape(m_f, n_f, _LANES)
                    else:
                        J = jnp.broadcast_to(A, (m_f, n_f, _LANES))
                    g_f = jnp.sum(J * y_f[:, None, :], axis=0)
                    Jw = J * d_f[:, None, :]
                    H = _jtdj_rows(J, Jw, n_f)

                for (oa, sa, ta, pa) in f.segs:
                    gseg = g_f[oa:oa + sa, :]
                    if ta < 0:
                        # value .at[].add lowers to scatter_add whose empty
                        # index vector pallas cannot capture; static pad+add
                        # is equivalent and scatter-free
                        r_h = r_h + jnp.pad(gseg,
                                            ((pa, h - pa - sa), (0, 0)))
                    else:
                        gi, off = _wide(ta)
                        M_refs[gi][pa:pa + sa, h:h + 1, off:off + _LANES] = \
                            M_refs[gi][pa:pa + sa, h:h + 1,
                                       off:off + _LANES] + gseg[:, None, :]
                    for (ob, sb, tb, pb) in f.segs:
                        if ta >= 0 and tb < 0:
                            continue               # mirror of (head, block)
                        if ta < 0 and tb < 0:
                            S[pa:pa + sa, pb:pb + sb, :] = \
                                S[pa:pa + sa, pb:pb + sb, :] \
                                + H[oa:oa + sa, ob:ob + sb, :]
                        elif ta < 0:
                            # C' accumulated pre-transposed (H symmetric)
                            gi, off = _wide(tb)
                            M_refs[gi][pb:pb + sb, pa:pa + sa,
                                       off:off + _LANES] = \
                                M_refs[gi][pb:pb + sb, pa:pa + sa,
                                           off:off + _LANES] \
                                + H[ob:ob + sb, oa:oa + sa, :]
                        else:
                            gi, off = _wide(ta)
                            D_refs[gi][pa:pa + sa, pb:pb + sb,
                                       off:off + _LANES] = \
                                D_refs[gi][pa:pa + sa, pb:pb + sb,
                                           off:off + _LANES] \
                                + H[oa:oa + sa, ob:ob + sb, :]

            # full gradient gf + J'y (for slope/stat/fallback)
            grad_ref[:, :] = jnp.broadcast_to(gfv, (n, _LANES))
            grad_ref[h0:h0 + h, :] = r_h
            for bi, (s, sz) in enumerate(blocks):
                gi, off = _wide(bi)
                grad_ref[s:s + sz, :] = \
                    M_refs[gi][:, h:h + 1, off:off + _LANES][:, 0, :]

            # -- ridge ----------------------------------------------------
            dmax = jnp.max(jnp.abs(_diag3(S[:, :, :], h)), axis=0,
                           keepdims=True)
            for gi, (sz, bis) in enumerate(groups):
                dg = jnp.max(jnp.abs(_diag3(D_refs[gi][:, :, :], sz)),
                             axis=0, keepdims=True)      # (1, W)
                for slot in range(len(bis)):
                    dmax = jnp.maximum(
                        dmax, dg[:, slot * _LANES:(slot + 1) * _LANES])
            ridge = gn_rel * jnp.maximum(dmax, 1.0) + delta     # (1, 128)
            S[:, :, :] = S[:, :, :] + _eye3(h, dt) * ridge[None, :, :]

            # -- factor tail groups, Y = L^-1 [C' | r_b], Schur ------------
            S_t = S[:, :, :]
            r_t = r_h
            for gi, (sz, bis) in enumerate(groups):
                k_g = len(bis)
                ridge_w = jnp.concatenate([ridge] * k_g, axis=1) \
                    if k_g > 1 else ridge
                D_refs[gi][:, :, :] = D_refs[gi][:, :, :] \
                    + _eye3(sz, dt) * ridge_w[None, :, :]
                _masked_chol(D_refs[gi], sz)
                _fwd_subst_panel(D_refs[gi], M_refs[gi], sz, h + 1)
                Y = M_refs[gi][:, :, :]            # (sz, h+2, W)
                G = _gram_rows(Y[:, :h + 1, :], h)  # (h, h+1, W)
                for slot in range(k_g):
                    off = slot * _LANES
                    S_t = S_t - G[:, :h, off:off + _LANES]
                    r_t = r_t - G[:, h, off:off + _LANES]

            # -- head solve + back-substitution ---------------------------
            S[:, :, :] = S_t
            _masked_chol(S, h)
            Wh[:, :, :] = r_t[:, None, :]
            _fwd_subst_col(S, Wh, h, 0)
            _bwd_subst_col(S, Wh, h, 0)
            dx_h = Wh[:, :, :][:, 0, :]            # (h, 128)

            for gi, (sz, bis) in enumerate(groups):
                k_g = len(bis)
                dx_h_w = jnp.concatenate([dx_h] * k_g, axis=1) \
                    if k_g > 1 else dx_h
                Y = M_refs[gi][:, :, :]
                t_w = Y[:, h, :] - jnp.sum(
                    Y[:, :h, :] * dx_h_w[None, :, :], axis=1)   # (sz, W)
                # back-substitute in the work column h+1 of the panel
                M_refs[gi][:, h + 1:h + 2, :] = t_w[:, None, :]
                _bwd_subst_col(D_refs[gi], M_refs[gi], sz, h + 1)
            pieces = [(h0, dx_h)]
            for bi, (s, sz) in enumerate(blocks):
                gi, off = _wide(bi)
                pieces.append((s, M_refs[gi][:, h + 1:h + 2,
                                             off:off + _LANES][:, 0, :]))
            # head + blocks tile [0, n) (detect_arrow covers leftovers),
            # so dx assembles as an ordered concat -- no value scatter,
            # which Mosaic cannot lower
            pieces.sort(key=lambda sp: sp[0])
            dx = -jnp.concatenate([pc for (_, pc) in pieces], axis=0)

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
                    Jd_parts[fi] = dotf(A2, df_f)
                else:
                    A = fam_A(f)
                    if f.iQ >= 0:
                        xf = gather(x_out[:, :], f.runs)
                        Qf = uQ[f.iQ][:, :]
                        t2 = dotf(Qf, df_f)
                        t2 = t2.reshape(m_f, n_f, _LANES)
                        t1 = dotf(Qf, xf)
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
                   + [pltpu.VMEM((sz, sz, len(bis) * _LANES), dt)
                      for (sz, bis) in groups]
                   + [pltpu.VMEM((sz, h + 2, len(bis) * _LANES), dt)
                      for (sz, bis) in groups]             # [C' | r_b | w]
                   + [pltpu.VMEM((n, _LANES), dt),         # grad
                      pltpu.VMEM((h, 1, _LANES), dt)])     # head work col

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
