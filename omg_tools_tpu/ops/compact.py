"""Family-compacted constraint evaluation for the batched ALM solver.

Spline MPC transcriptions are extremely sparse: every constraint row
touches only the few coefficients inside one basis-function support
(reference omgtools constraints are written per spline coefficient,
spline.py:419-487), so the dense quadratic form g = c + A x + x'Qx wastes
~25x FLOPs and ~30x HBM/transfer bytes at bench sizes (m=671, n=151:
186/671 quadratic rows, row support <= 10, A row support <= 6).

This module compacts the structure ONCE at setup (host, cached):

- constraint rows are grouped into **families** -- define_constraint blocks
  (transcription ``_ConBlock``s) merged when they share the same variable
  support -- and globally re-ordered so each family is a contiguous row
  slice;
- each family's variable support is covered by a few **contiguous runs**
  of the variable vector (variable blocks are contiguous by construction,
  and every family touches whole blocks: its own slack/hyperplane block
  plus the vehicle spline block), so gathers/scatters become static slice
  reads and slice adds -- no scatter ops, which are slow on TPU;
- per family the affine/quadratic tensors are compacted to the support:
  A0c (spk, m_f, n_f), TAc (spk, m_f, n_f, n_qf) over the family's
  parameter support, Qc (m_f, n_f, n_f).

At runtime the ALM inner iteration evaluates J, g, grad, the active-set
Gauss-Newton Hessian, and the line-search directional terms family-by-
family with small dense einsums plus slice assembly into the (n, n)
Hessian for the lane-batched Cholesky kernel.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CompactStructure", "build_compact", "resolve_phase",
           "CompactWork"]


class FamilyStatic(NamedTuple):
    """Static (trace-time) description of one constraint family."""
    row_start: int          # rows in PERMUTED row space
    row_stop: int
    runs: Tuple[Tuple[int, int], ...]   # (start, size) variable runs
    qcols: Tuple[int, ...]  # parameter columns entering A (empty: constant)
    has_Q: bool


class ArrowStatic(NamedTuple):
    """Block-arrow partition of the variable space (see ``detect_arrow``).

    head: (start, size) — the coupling variable block (vehicle splines);
    blocks: ((start, size), ...) — pairwise-uncoupled tail blocks;
    fam_segments: per family, a tuple of
        (fam_col_off, size, target, tgt_off) segments mapping the family's
        LOCAL column range [fam_col_off, fam_col_off+size) to target -1
        (head, local offset tgt_off) or block index >= 0 (local tgt_off).
    """
    head: Tuple[int, int]
    blocks: Tuple[Tuple[int, int], ...]
    fam_segments: Tuple[Tuple[Tuple[int, int, int, int], ...], ...]
    fam_block: Tuple[int, ...]   # the single block each family touches (-1: none)
    b_max: int                   # padded tail-block size


class CompactStructure:
    """Host-side compacted problem structure + device tensors.

    ``tensors`` (all with a leading phase axis where applicable):
      c0 (spk, m), C1 (spk, m, n_p), f0 (spk,), gf (spk, n) -- full-row
      constants in permuted row order, row/objective scaling baked in;
      per family: A0c, TAc (or None), Qc (or None).
    """

    def __init__(self, families: List[FamilyStatic], row_perm: np.ndarray,
                 tensors: dict, n_x: int, n_p: int,
                 arrow: Optional[ArrowStatic] = None):
        self.families = families
        self.row_perm = np.asarray(row_perm)
        self.inv_perm = np.argsort(self.row_perm)
        self.tensors = tensors      # host numpy
        self.n_x = n_x
        self.n_p = n_p
        self.m = len(self.row_perm)
        self.arrow = arrow

    def device_tensors(self, dtype):
        """Device pytree (tuples/arrays only) to thread as a jit argument."""
        t = self.tensors
        fams = tuple(
            (jnp.asarray(t["A0c"][k], dtype=dtype),
             None if t["TAc"][k] is None else jnp.asarray(t["TAc"][k],
                                                          dtype=dtype),
             None if t["Qc"][k] is None else jnp.asarray(t["Qc"][k],
                                                         dtype=dtype))
            for k in range(len(self.families)))
        return {"c0": jnp.asarray(t["c0"], dtype=dtype),
                "C1": jnp.asarray(t["C1"], dtype=dtype),
                "f0": jnp.asarray(t["f0"], dtype=dtype),
                "gf": jnp.asarray(t["gf"], dtype=dtype),
                "pcols": jnp.asarray(t.get("pcols",
                                           np.arange(t["C1"].shape[-1])),
                                     dtype=jnp.int32),
                "fams": fams}

    def nbytes(self):
        total = 0
        for arr in jax.tree_util.tree_leaves(self.tensors):
            if hasattr(arr, "nbytes"):
                total += arr.nbytes
        return total


def _runs_from_support(cols: np.ndarray, gap: int = 8,
                       n: Optional[int] = None):
    """Cover a sorted index set by contiguous runs, merging gaps <= gap."""
    cols = np.unique(cols)
    if len(cols) == 0:
        return ((0, 0),)
    runs = []
    start = prev = int(cols[0])
    for c in cols[1:]:
        c = int(c)
        if c - prev <= gap:
            prev = c
            continue
        runs.append((start, prev - start + 1))
        start = prev = c
    runs.append((start, prev - start + 1))
    if n is not None:
        runs = [(s, min(sz, n - s)) for (s, sz) in runs]
    return tuple(runs)


def detect_arrow(families: List[FamilyStatic], n: int,
                 head: Tuple[int, int]) -> Optional[ArrowStatic]:
    """Detect a block-arrow partition of the variable space.

    ``head`` is the coupling block (the vehicle spline coefficients: every
    constraint touches them).  The remaining variables (hyperplane
    coefficients per obstacle, slack splines) split into tail blocks that
    are pairwise uncoupled: each family's support must lie inside
    head + (at most) one tail block.  Then the Gauss-Newton system is
    block-arrow and the Newton step reduces to small per-block factorizations
    plus a head-sized Schur solve (~20x fewer flops than the dense system at
    bench sizes).  Returns None when the structure does not hold (the solver
    falls back to the dense lane-batched Cholesky)."""
    h0, h1 = head[0], head[0] + head[1]

    def split_interval(s, e):
        """Split [s, e) at the head boundaries -> (lo, head-part, hi)."""
        parts = []
        if s < h0:
            parts.append((s, min(e, h0), False))
        if max(s, h0) < min(e, h1):
            parts.append((max(s, h0), min(e, h1), True))
        if e > h1:
            parts.append((max(s, h1), e, False))
        return parts

    # per-family non-head intervals
    fam_tail: List[List[Tuple[int, int]]] = []
    for fam in families:
        tails = []
        for (s, sz) in fam.runs:
            for (a, b, in_head) in split_interval(s, s + sz):
                if not in_head and b > a:
                    tails.append((a, b))
        fam_tail.append(tails)

    # union-find over tail intervals: intervals of one family merge; then
    # overlapping intervals across families merge
    intervals = []
    owner = []
    for fi, tails in enumerate(fam_tail):
        for (a, b) in tails:
            intervals.append([a, b])
            owner.append(fi)
    parent = list(range(len(intervals)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i, j):
        parent[find(i)] = find(j)

    for i in range(len(intervals)):
        for j in range(i + 1, len(intervals)):
            same_family = owner[i] == owner[j]
            overlap = (intervals[i][0] < intervals[j][1]
                       and intervals[j][0] < intervals[i][1])
            if same_family or overlap:
                union(i, j)
    groups: dict = {}
    for i in range(len(intervals)):
        groups.setdefault(find(i), []).append(i)

    # blocks = contiguous hulls of each group (internal gaps are variables
    # no family touches -- absorbing them only adds ridge diagonal)
    blocks = []
    for members in groups.values():
        lo = min(intervals[i][0] for i in members)
        hi = max(intervals[i][1] for i in members)
        blocks.append((lo, hi))
    blocks.sort()
    # hulls may have merged overlapping groups; coalesce
    merged = []
    for (lo, hi) in blocks:
        if merged and lo < merged[-1][1]:
            merged[-1] = (merged[-1][0], max(hi, merged[-1][1]))
        else:
            merged.append((lo, hi))
    blocks = merged
    # leftover variables untouched by any family -> own blocks (diag-only)
    covered = np.zeros(n, dtype=bool)
    covered[h0:h1] = True
    for (lo, hi) in blocks:
        if lo < h1 and hi > h0:
            return None    # block overlaps head: not arrow
        covered[lo:hi] = True
    i = 0
    while i < n:
        if not covered[i]:
            j = i
            while j < n and not covered[j]:
                j += 1
            blocks.append((i, j))
            i = j
        else:
            i += 1
    blocks.sort()
    if not blocks:
        return None

    def block_of(a, b):
        for bi, (lo, hi) in enumerate(blocks):
            if a >= lo and b <= hi:
                return bi
        return None

    # per-family segment maps + single-block check
    fam_segments = []
    fam_block = []
    for fam, tails in zip(families, fam_tail):
        segs = []
        blk = -1
        off = 0
        ok = True
        for (s, sz) in fam.runs:
            for (a, b, in_head) in split_interval(s, s + sz):
                if b <= a:
                    continue
                if in_head:
                    segs.append((off, b - a, -1, a - h0))
                else:
                    bi = block_of(a, b)
                    if bi is None or (blk not in (-1, bi)):
                        ok = False
                        break
                    blk = bi
                    segs.append((off, b - a, bi, a - blocks[bi][0]))
                off += b - a
            if not ok:
                break
        if not ok:
            return None
        fam_segments.append(tuple(segs))
        fam_block.append(blk)

    b_max = max(hi - lo for (lo, hi) in blocks)
    return ArrowStatic(
        head=(h0, h1 - h0),
        blocks=tuple((lo, hi - lo) for (lo, hi) in blocks),
        fam_segments=tuple(fam_segments),
        fam_block=tuple(fam_block),
        b_max=int(b_max))


def build_compact(con_blocks, Q, c0, C1, A0, TA, f0, gf,
                  row_scale=None, obj_scale=1.0, gap=8,
                  tol=1e-12, head=None, p_cols=None) -> CompactStructure:
    """Build the compacted structure from dense host tensors.

    con_blocks: [(offset, rows)] from the transcription layout.
    Q: (m, n, n) or None rows allowed; c0/C1/A0/TA with leading phase axis
    (spk, ...); TA may be None (A constant in p).
    p_cols: full-p indices of the columns C1/TA are restricted to (the
    varying parameters); default = all of p.
    """
    A0 = np.asarray(A0)
    spk, m, n = A0.shape
    n_pc = np.asarray(C1).shape[-1]
    p_cols = np.arange(n_pc) if p_cols is None else np.asarray(p_cols)
    n_p = int(p_cols.max()) + 1 if len(p_cols) else 0
    Q = None if Q is None else np.asarray(Q)
    TA = None if TA is None else np.asarray(TA)

    # -- per-block supports -------------------------------------------------
    blocks = []
    for (off, rows) in con_blocks:
        rr = np.arange(off, off + rows)
        sup = np.zeros(n, dtype=bool)
        sup |= (np.abs(A0[:, rr, :]) > tol).any(axis=(0, 1))
        if TA is not None:
            sup |= (np.abs(TA[:, rr, :, :]) > tol).any(axis=(0, 1, 3))
        if Q is not None:
            qs = (np.abs(Q[rr]) > tol)
            sup |= qs.any(axis=(0, 2)) | qs.any(axis=(0, 1))
        runs = _runs_from_support(np.where(sup)[0], gap=gap, n=n)
        blocks.append((off, rows, runs))

    # -- merge blocks sharing a run signature into families -----------------
    fam_map = {}
    for off, rows, runs in blocks:
        fam_map.setdefault(runs, []).append((off, rows))
    families_rows = []
    for runs, members in fam_map.items():
        rr = np.concatenate([np.arange(o, o + r) for (o, r) in members])
        families_rows.append((runs, np.sort(rr)))

    # -- global row permutation ---------------------------------------------
    row_perm = np.concatenate([rr for (_, rr) in families_rows]) \
        if families_rows else np.zeros(0, dtype=int)
    assert len(row_perm) == m, (len(row_perm), m)

    d = np.ones(m) if row_scale is None else np.asarray(row_scale)

    # permuted + scaled full-row constants
    c0p = (c0 * d[None, :])[:, row_perm]
    C1p = (C1 * d[None, :, None])[:, row_perm, :]
    f0s = np.asarray(f0) * obj_scale
    gfs = np.asarray(gf) * obj_scale

    families: List[FamilyStatic] = []
    A0c_list, TAc_list, Qc_list = [], [], []
    row_off = 0
    for runs, rr in families_rows:
        cols = np.concatenate([np.arange(s, s + sz) for (s, sz) in runs])
        m_f = len(rr)
        drr = d[rr]
        A0c = (A0[:, rr, :] * drr[None, :, None])[:, :, cols]
        TAc = None
        if TA is not None:
            TAf = TA[:, rr, :, :][:, :, cols, :] * drr[None, :, None, None]
            qnz = np.where((np.abs(TAf) > tol).any(axis=(0, 1, 2)))[0]
            if len(qnz):
                TAc = np.ascontiguousarray(TAf[:, :, :, qnz])
        else:
            qnz = np.zeros(0, dtype=int)
        Qc = None
        if Q is not None:
            Qf = Q[rr] * drr[:, None, None]
            if (np.abs(Qf) > tol).any():
                Qc = np.ascontiguousarray(Qf[:, cols, :][:, :, cols])
        families.append(FamilyStatic(
            row_start=row_off, row_stop=row_off + m_f, runs=runs,
            qcols=tuple(int(p_cols[q])
                        for q in (qnz if TAc is not None else ())),
            has_Q=Qc is not None))
        A0c_list.append(A0c)
        TAc_list.append(TAc)
        Qc_list.append(Qc)
        row_off += m_f

    tensors = {"c0": c0p, "C1": C1p, "f0": f0s, "gf": gfs,
               "pcols": np.asarray(p_cols, dtype=np.int32),
               "A0c": A0c_list, "TAc": TAc_list, "Qc": Qc_list}
    arrow = None
    if head is not None:
        arrow = detect_arrow(families, n, head)
    return CompactStructure(families, row_perm, tensors, n_x=n, n_p=n_p,
                            arrow=arrow)


# -- runtime -----------------------------------------------------------------

def resolve_phase(struct: CompactStructure, dt_tensors, phase, p):
    """Phase- and parameter-resolved per-solve tensors (traced; unbatched
    p -- vmap lifts the batch axis).  Returns the ``ct`` argument for the
    compact ALM evaluator: full-row constants plus per-family A matrices."""
    c = jnp.take(dt_tensors["c0"], phase, axis=0) \
        + jnp.take(dt_tensors["C1"], phase, axis=0) @ p[dt_tensors["pcols"]]
    f0 = jnp.take(dt_tensors["f0"], phase, axis=0)
    gfv = jnp.take(dt_tensors["gf"], phase, axis=0)
    Af, Qf = [], []
    for fam, (A0c, TAc, Qc) in zip(struct.families, dt_tensors["fams"]):
        A = jnp.take(A0c, phase, axis=0)
        if TAc is not None:
            qsel = jnp.asarray(np.asarray(fam.qcols, dtype=np.int32))
            A = A + jnp.take(TAc, phase, axis=0) @ p[qsel]
        Af.append(A)
        Qf.append(Qc)
    return {"c": c, "f0": f0, "gf": gfv, "Af": tuple(Af), "Qf": tuple(Qf)}


class CompactWork:
    """Per-solve evaluator bound to (static structure, resolved tensors).

    All methods are per-scenario (unbatched) and vmap-lifted by callers;
    every gather/scatter is a static slice read / slice add.
    """

    def __init__(self, struct: CompactStructure, ct):
        self.struct = struct
        self.ct = ct

    # -- pieces --------------------------------------------------------------
    def _xf(self, x, fam: FamilyStatic):
        return jnp.concatenate([jax.lax.dynamic_slice_in_dim(x, s, sz)
                                for (s, sz) in fam.runs]) \
            if len(fam.runs) > 1 else \
            jax.lax.dynamic_slice_in_dim(x, fam.runs[0][0], fam.runs[0][1])

    def jacobians(self, x):
        """Per-family J_f (m_f, n_f)."""
        Jf = []
        for fam, A, Qc in zip(self.struct.families, self.ct["Af"],
                              self.ct["Qf"]):
            xf = self._xf(x, fam)
            if Qc is not None:
                A = A + 2.0 * jnp.einsum("krt,t->kr", Qc, xf)
            Jf.append(A)
        return Jf

    def g_from_J(self, x, Jf):
        """g (m,) in permuted row order: c + 0.5 (A + J) x per family."""
        parts = []
        for fam, A, J in zip(self.struct.families, self.ct["Af"], Jf):
            xf = self._xf(x, fam)
            parts.append(0.5 * ((A + J) @ xf))
        return self.ct["c"] + jnp.concatenate(parts)

    def g(self, x):
        return self.g_from_J(x, self.jacobians(x))

    def f(self, x):
        return self.ct["f0"] + self.ct["gf"] @ x

    def gf(self, x):
        return self.ct["gf"]

    def _rows(self, vec, fam: FamilyStatic):
        return jax.lax.dynamic_slice_in_dim(vec, fam.row_start,
                                            fam.row_stop - fam.row_start)

    def grad(self, Jf, y):
        """gf + J' y via per-family slice adds."""
        out = self.ct["gf"]
        for fam, J in zip(self.struct.families, Jf):
            gfam = J.T @ self._rows(y, fam)          # (n_f,)
            off = 0
            for (s, sz) in fam.runs:
                out = jax.lax.dynamic_update_slice_in_dim(
                    out, jax.lax.dynamic_slice_in_dim(out, s, sz)
                    + jax.lax.dynamic_slice_in_dim(gfam, off, sz), s, axis=0)
                off += sz
        return out

    def hessian(self, Jf, active, rho, ridge):
        """rho J' D J + ridge I assembled by family-block slice adds."""
        n = self.struct.n_x
        H = ridge * jnp.eye(n, dtype=Jf[0].dtype)
        for fam, J in zip(self.struct.families, Jf):
            d = self._rows(active, fam) * rho
            Hf = J.T @ (d[:, None] * J)              # (n_f, n_f)
            offs_a = 0
            for (sa, sza) in fam.runs:
                offs_b = 0
                for (sb, szb) in fam.runs:
                    blk = jax.lax.dynamic_slice(
                        Hf, (offs_a, offs_b), (sza, szb))
                    cur = jax.lax.dynamic_slice(H, (sa, sb), (sza, szb))
                    H = jax.lax.dynamic_update_slice(H, cur + blk, (sa, sb))
                    offs_b += szb
                offs_a += sza
        return H

    def arrow_system(self, Jf, y, active, rho):
        """Assemble the block-arrow Gauss-Newton system directly in block
        form (no (n, n) buffer): returns
            S (h, h), D (k, b, b), C (k, h, b), r_h (h,), r_b (k, b)
        where [S, C; C', blockdiag(D)] [dx_h; dx_b] = [r_h; r_b] is the
        (unregularized) Newton system and r is the FULL gradient gf + J'y
        split into head/block pieces.  Tail blocks are padded to b_max with
        unit diagonal."""
        ar = self.struct.arrow
        h0, h = ar.head
        k = len(ar.blocks)
        bm = ar.b_max
        dt = Jf[0].dtype
        S = jnp.zeros((h, h), dtype=dt)
        D = [jnp.zeros((bm, bm), dtype=dt) for _ in range(k)]
        C = [jnp.zeros((h, bm), dtype=dt) for _ in range(k)]
        gf = self.ct["gf"]
        r_h = jax.lax.dynamic_slice_in_dim(gf, h0, h)
        r_b = [jnp.zeros((bm,), dtype=dt) for _ in range(k)]
        for bi, (s, sz) in enumerate(ar.blocks):
            r_b[bi] = r_b[bi].at[:sz].set(
                jax.lax.dynamic_slice_in_dim(gf, s, sz))
        for fam, segs, J in zip(self.struct.families, ar.fam_segments, Jf):
            yv = self._rows(y, fam)
            d = self._rows(active, fam) * rho
            g_f = J.T @ yv                              # (n_f,)
            H_f = J.T @ (d[:, None] * J)                # (n_f, n_f)
            for (oa, sa, ta, pa) in segs:
                gseg = jax.lax.dynamic_slice_in_dim(g_f, oa, sa)
                if ta < 0:
                    r_h = r_h.at[pa:pa + sa].add(gseg)
                else:
                    r_b[ta] = r_b[ta].at[pa:pa + sa].add(gseg)
                for (ob, sb, tb, pb) in segs:
                    if ta >= 0 and tb < 0:
                        continue      # transpose of a (head, block) pair
                    blk = jax.lax.dynamic_slice(H_f, (oa, ob), (sa, sb))
                    if ta < 0 and tb < 0:
                        S = S.at[pa:pa + sa, pb:pb + sb].add(blk)
                    elif ta < 0:
                        C[tb] = C[tb].at[pa:pa + sa, pb:pb + sb].add(blk)
                    else:
                        D[ta] = D[ta].at[pa:pa + sa, pb:pb + sb].add(blk)
        # pad diagonals of the tail blocks stay positive definite
        for bi, (s, sz) in enumerate(ar.blocks):
            if sz < bm:
                pad = jnp.concatenate([jnp.zeros(sz, dtype=dt),
                                       jnp.ones(bm - sz, dtype=dt)])
                D[bi] = D[bi] + jnp.diag(pad)
        return (S, jnp.stack(D), jnp.stack(C), r_h, jnp.stack(r_b))

    def arrow_scatter(self, dx_h, dx_b):
        """Reassemble the full dx (n,) from head/block pieces."""
        ar = self.struct.arrow
        h0, h = ar.head
        dx = jnp.zeros(self.struct.n_x, dtype=dx_h.dtype)
        dx = dx.at[h0:h0 + h].set(dx_h)
        for bi, (s, sz) in enumerate(ar.blocks):
            dx = dx.at[s:s + sz].set(dx_b[bi, :sz])
        return dx

    def Jd(self, Jf, dx):
        """J dx (m,) for the line search."""
        parts = []
        for fam, J in zip(self.struct.families, Jf):
            parts.append(J @ self._xf(dx, fam))
        return jnp.concatenate(parts)

    def quad_dir(self, dx):
        """d' Q d (m,) for the exact quadratic line search."""
        parts = []
        for fam, Qc in zip(self.struct.families, self.ct["Qf"]):
            if Qc is None:
                parts.append(jnp.zeros(fam.row_stop - fam.row_start,
                                       dtype=dx.dtype))
            else:
                df = self._xf(dx, fam)
                parts.append(jnp.einsum("krt,r,t->k", Qc, df, df))
        return jnp.concatenate(parts)
