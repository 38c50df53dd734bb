"""Traced / parameterized spline-coefficient transforms (device side).

The receding-horizon machinery needs basis transforms whose *shift amount is
a runtime value* (a traced JAX scalar), not a host constant:

- ``shiftfirstknot_T(t)``: re-express a spline on knots whose first
  degree+1 entries move to ``t`` -- the "penalize only the future piece"
  transform used inside the ADMM x-update objective (reference:
  /root/reference/omgtools/basics/spline_extra.py:220-255 builds it
  symbolically in CasADi; /root/reference/omgtools/problems/admm.py:86-88
  applies it to x, z, lambda) and for dual-spline transforms
  (optilayer.py:492-503).

- ``shift_spline_T(t)``: re-express the remaining piece [t, end] in a fresh
  equidistant clamped basis (reference spline_extra.py:88-99), used by
  free-T problems every control period (point2point.py:354-368).

TPU-native mechanism: each transform family is precomputed ON THE HOST as a
matrix-valued polynomial in the shift parameter,

    T(t) = sum_j  u^j * C[j],     u = (t - t_lo) / (t_hi - t_lo),

so the traced evaluation is one tiny einsum -- no control flow, no
collocation solves in the compiled graph, vmap/scan friendly.  For
``shiftfirstknot_T`` the polynomial is EXACT: the transform is a composition
of degree+1 Boehm knot-insertion steps whose weights are affine in t, hence
polynomial of degree <= degree+1 (fit through degree+2 Chebyshev samples
reproduces it to machine precision).  For ``shift_spline_T`` the entries are
rational in t; a Chebyshev fit of configurable order is used as a surrogate
(the transform itself is the reference's *approximate* re-basing, and the
fit error is validated at build time).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .basis import Basis

__all__ = [
    "TransformPoly", "fit_transform_poly", "eval_transform",
    "shiftfirstknot_poly", "shiftfirstknot_T", "shift_knot1_fwd",
    "shift_knot1_bwd", "eval_basis_traced", "greville_traced",
    "shift_spline_T_traced",
]


class TransformPoly(NamedTuple):
    """Matrix-valued polynomial T(t) = sum_j u^j C[j], u normalized."""
    C: np.ndarray        # (order+1, n_out, n_in) monomial coeffs in u
    t_lo: float
    t_hi: float
    fit_err: float       # max abs deviation at validation points


def fit_transform_poly(make_T, t_lo: float, t_hi: float,
                       order: int) -> TransformPoly:
    """Fit T(t) (a host function returning an (n_out, n_in) matrix) by a
    degree-``order`` matrix polynomial in the normalized coordinate
    u = (t - t_lo)/(t_hi - t_lo), interpolating at order+1 Chebyshev nodes.
    Exact when every entry of T is a polynomial of degree <= order in t."""
    k = np.arange(order + 1)
    u_nodes = 0.5 * (1.0 - np.cos(np.pi * (k + 0.5) / (order + 1)))
    t_nodes = t_lo + (t_hi - t_lo) * u_nodes
    samples = np.stack([np.asarray(make_T(float(t)), dtype=np.float64)
                        for t in t_nodes])                 # (K, n_out, n_in)
    V = np.vander(u_nodes, order + 1, increasing=True)     # (K, K)
    C = np.linalg.solve(V, samples.reshape(order + 1, -1))
    C = C.reshape(order + 1, *samples.shape[1:])
    C[np.abs(C) < 1e-12] = 0.0
    # validate at off-node points, strictly inside the interval: at the
    # endpoints make_T can be degenerate (e.g. shiftfirstknot at exactly the
    # first interior knot makes the target basis multiplicity degree+2); the
    # polynomial is the correct continuous limit there
    u_val = np.linspace(0.0, 1.0, 2 * order + 5)[1:-1]
    err = 0.0
    for u in u_val:
        t = t_lo + (t_hi - t_lo) * u
        pred = np.einsum("j,jab->ab", u ** np.arange(order + 1), C)
        err = max(err, float(np.max(np.abs(
            pred - np.asarray(make_T(float(t)), dtype=np.float64)))))
    return TransformPoly(C=C, t_lo=float(t_lo), t_hi=float(t_hi),
                         fit_err=err)


def eval_transform(tp: TransformPoly, t, C_dev=None):
    """Traced evaluation: T(t) as a jnp (n_out, n_in) matrix.  ``t`` may be
    a traced scalar.  Pass ``C_dev`` (a device copy of ``tp.C``) to avoid
    re-uploading the coefficient stack inside jit regions."""
    import jax.numpy as jnp
    C = jnp.asarray(tp.C) if C_dev is None else C_dev
    denom = tp.t_hi - tp.t_lo
    u = (jnp.asarray(t, dtype=C.dtype) - tp.t_lo) / (denom if denom else 1.0)
    order = C.shape[0] - 1
    pows = u ** jnp.arange(order + 1, dtype=C.dtype)
    return jnp.einsum("j,jab->ab", pows, C)


# -- shiftfirstknot ---------------------------------------------------------

def shiftfirstknot_poly(basis: Basis, t_hi: float = None) -> TransformPoly:
    """Exact matrix polynomial for ``basis.shiftfirstknot_T(t)`` with
    t in [knots[0], t_hi] (default: the first interior knot -- the valid
    range for per-period shifts; the first knot never advances past the
    first interval before a shiftoverknot happens)."""
    def compute():
        d = basis.degree
        t_lo = float(basis.knots[0])
        hi = float(basis.knots[d + 1]) if t_hi is None else float(t_hi)
        tp = fit_transform_poly(
            lambda t: basis.shiftfirstknot_T(t) if t > t_lo
            else np.eye(len(basis)), t_lo, hi, order=d + 1)
        if tp.fit_err > 1e-8:
            raise RuntimeError(
                f"shiftfirstknot_T is not polynomial on this basis "
                f"(fit_err={tp.fit_err:.2e}) -- non-equidistant head knots?")
        return tp
    return basis._memoized(("shiftfirstknot_poly", t_hi), compute)


def shiftfirstknot_T(basis: Basis, t, C_dev=None):
    """Traced T(t): (n, n) jnp matrix (reference spline_extra.py:220-255)."""
    return eval_transform(shiftfirstknot_poly(basis), t, C_dev)


def shift_knot1_fwd(coeffs, basis: Basis, t, C_dev=None):
    """Traced analog of reference spline_extra.shift_knot1_fwd: coefficients
    of the spline re-expressed on [t, end] knots.  ``coeffs`` may be (n,) or
    (n, k) (several splines sharing the basis)."""
    T = shiftfirstknot_T(basis, t, C_dev)
    return T @ coeffs


def shift_knot1_bwd(coeffs, basis: Basis, t, C_dev=None):
    """Traced inverse transform (reference spline_extra.py:207-217): undo a
    first-knot shift.  T(t) acts only on the first degree+1 coefficients
    (upper-triangular head block), so the inverse is one small triangular
    solve."""
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl
    d = basis.degree
    T = shiftfirstknot_T(basis, t, C_dev)
    head = T[:d + 1, :d + 1]
    c_head = jnp.atleast_2d(jnp.asarray(coeffs).T).T[:d + 1]
    y = jsl.solve_triangular(head, c_head, lower=False)
    out = jnp.asarray(coeffs).at[:d + 1].set(
        y.reshape(jnp.asarray(coeffs)[:d + 1].shape))
    return out


# -- traced Cox-de Boor (traced knots AND points) ----------------------------

def eval_basis_traced(knots, degree: int, x):
    """Branch-free Cox-de Boor returning the (len(x), n_basis) collocation
    matrix with BOTH ``knots`` and ``x`` traceable jnp arrays.  Matches
    ops/basis.eval_basis_matrix for clamped bases (left-closed on the first
    degree+1 indicator functions); zero-width spans contribute zero.

    This is what makes *symbolic-in-t* spline machinery possible on device:
    knot vectors that depend on runtime scalars (shift amounts, free motion
    times) stay inside the jit graph instead of forcing host rebuilds (the
    reference leans on CasADi symbolics for this, spline_extra.py:28-55)."""
    import jax.numpy as jnp
    knots = jnp.asarray(knots)
    x = jnp.atleast_1d(jnp.asarray(x))
    nk = knots.shape[0]
    d = int(degree)
    lo = knots[:-1]                                 # (nk-1,)
    hi = knots[1:]
    xe = x[:, None]
    closed_left = jnp.arange(nk - 1) < d + 1        # clamped-head convention
    left_ok = jnp.where(closed_left[None, :], xe >= lo[None, :],
                        xe > lo[None, :])
    b = (left_ok & (xe <= hi[None, :])).astype(x.dtype)   # (npts, nk-1)
    for r in range(1, d + 1):
        den1 = knots[r:nk - 1] - knots[:nk - 1 - r]        # (nk-1-r,)
        den2 = knots[r + 1:nk] - knots[1:nk - r]
        w1 = jnp.where(den1 > 1e-14,
                       (xe - knots[None, :nk - 1 - r])
                       / jnp.where(den1 > 1e-14, den1, 1.0)[None, :], 0.0)
        w2 = jnp.where(den2 > 1e-14,
                       (knots[None, r + 1:nk] - xe)
                       / jnp.where(den2 > 1e-14, den2, 1.0)[None, :], 0.0)
        b = w1 * b[:, :nk - 1 - r] + w2 * b[:, 1:nk - r]
    return b


def greville_traced(knots, degree: int):
    """Greville abscissae of a traced knot vector (reference spline.py:196)."""
    import jax.numpy as jnp
    knots = jnp.asarray(knots)
    n = knots.shape[0] - degree - 1
    if degree == 0:
        return 0.5 * (knots[:-1] + knots[1:])
    idx = jnp.arange(n)[:, None] + 1 + jnp.arange(degree)[None, :]
    return jnp.mean(knots[idx], axis=1)


# -- shift_spline (free-T re-basing), fully traced ---------------------------

def shift_spline_T_traced(basis: Basis, t):
    """Traced, exact analog of ``basis.shift_spline_T(t)``: the transform
    re-expressing the spline piece on [t, end] in a fresh equidistant
    clamped basis over [t, end] (reference spline_extra.py:88-99).  ``t`` is
    a traced scalar in basis-domain units; entries of T(t) are only
    piecewise-smooth in t, so no polynomial surrogate exists -- instead the
    target knots/Greville points (affine in t) and both collocation matrices
    are built inside the trace and one (n, n) solve produces T."""
    import jax.numpy as jnp
    d, n = basis.degree, len(basis)
    n_knots = n - d + 1
    k_end = float(basis.knots[-1])
    t = jnp.asarray(t)
    interior = t + (k_end - t) * jnp.linspace(0.0, 1.0, n_knots)
    knots2 = jnp.concatenate([jnp.full(d, t), interior, jnp.full(d, k_end)])
    g = greville_traced(knots2, d)
    # nudge coincident greville points apart (degenerate only at t == k_end),
    # then clip back into the basis domain (a point past k_end would zero
    # its collocation row)
    g = jnp.maximum.accumulate(g + jnp.arange(n) * 1e-12)
    g = jnp.clip(g, knots2[0], k_end)
    B_t = eval_basis_traced(knots2, d, g)                 # (n, n) target
    E_s = eval_basis_traced(jnp.asarray(basis.knots), d, g)  # (n, n) source
    return jnp.linalg.solve(B_t, E_s)
