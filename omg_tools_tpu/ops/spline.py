"""JAX-traceable B-spline objects.

A ``BSpline`` is a pytree pairing a static host-side :class:`~.basis.Basis`
with a JAX coefficient array.  All spline algebra (sum, product, derivative,
integral, evaluation) is expressed as constant-matrix contractions against
matrices computed once by the basis engine, so everything composes with
``jit`` / ``vmap`` / ``grad`` and lowers to MXU-friendly dense linear algebra.

This replaces the reference's CasADi-symbolic spline arithmetic
(/root/reference/omgtools/basics/spline.py:365-512) -- the "core trick" of
imposing constraints on spline *coefficients* carries over unchanged, with JAX
tracing in place of CasADi MX graphs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .basis import Basis

__all__ = [
    "BSpline", "eval_basis_traced", "evalspline", "running_integral",
    "definite_integral", "sample_spline",
]


def eval_basis_traced(basis: Basis, t):
    """Cox-de Boor basis values at a traced scalar ``t``.

    Returns a (len(basis),) jnp vector.  The recursion is unrolled at trace
    time (degree and knots are static); this is the traced analog of the
    reference's symbolic ``evalspline`` (spline_extra.py:28-55).
    """
    # python-float knots stay weakly typed so the traced dtype is preserved
    k = [float(v) for v in basis.knots]
    d = basis.degree
    t = jnp.asarray(t)
    nk = len(k)
    b = []
    for i in range(nk - 1):
        if i < d + 1 and k[0] == k[i]:
            b.append(((t >= k[i]) & (t <= k[i + 1])).astype(t.dtype))
        else:
            b.append(((t > k[i]) & (t <= k[i + 1])).astype(t.dtype))
    for deg in range(1, d + 1):
        nb = []
        for i in range(nk - deg - 1):
            val = jnp.zeros_like(t)
            denom = k[i + deg] - k[i]
            if denom != 0.0:
                val = (t - k[i]) * b[i] / denom
            denom = k[i + deg + 1] - k[i + 1]
            if denom != 0.0:
                val = val + (k[i + deg + 1] - t) * b[i + 1] / denom
            nb.append(val)
        b = nb
    return jnp.stack(b, axis=-1)


@jax.tree_util.register_pytree_node_class
class BSpline:
    """Spline with static basis and traced coefficients (shape (..., n))."""

    def __init__(self, basis: Basis, coeffs):
        self.basis = basis
        self.coeffs = coeffs if isinstance(coeffs, jax.Array) else jnp.asarray(coeffs)

    def tree_flatten(self):
        return (self.coeffs,), self.basis

    @classmethod
    def tree_unflatten(cls, basis, children):
        obj = object.__new__(cls)
        obj.basis = basis
        obj.coeffs = children[0]
        return obj

    def __len__(self):
        return len(self.basis)

    def __repr__(self):
        return f"BSpline({self.basis!r}, coeffs shape {jnp.shape(self.coeffs)})"

    # -- evaluation --------------------------------------------------------
    def __call__(self, x):
        """Evaluate at static numpy points (returns (..., len(x))) or at a
        traced scalar (returns (...,))."""
        if isinstance(x, (jax.Array,)) or (hasattr(x, "aval")):
            bvals = eval_basis_traced(self.basis,
                                      jnp.asarray(x, dtype=self.coeffs.dtype))
            return jnp.einsum("...i,i->...", self.coeffs, bvals)
        x_arr = np.atleast_1d(np.asarray(x, dtype=np.float64))
        E = self.basis.eval(x_arr)  # (len(x), n)
        out = jnp.einsum("ti,...i->...t", jnp.asarray(E, dtype=self.coeffs.dtype),
                         self.coeffs)
        if np.isscalar(x) or np.ndim(x) == 0:
            return out[..., 0]
        return out

    # -- algebra -----------------------------------------------------------
    def __add__(self, other):
        if isinstance(other, BSpline):
            if other.basis is self.basis:
                return BSpline(self.basis, self.coeffs + other.coeffs)
            basis = self.basis + other.basis
            Ts = jnp.asarray(basis.transform(self.basis), dtype=self.coeffs.dtype)
            To = jnp.asarray(basis.transform(other.basis), dtype=self.coeffs.dtype)
            return BSpline(basis, jnp.einsum("qi,...i->...q", Ts, self.coeffs)
                           + jnp.einsum("qi,...i->...q", To, other.coeffs))
        # scalar (partition of unity): add to every coefficient
        return BSpline(self.basis, self.coeffs + other)

    __radd__ = __add__

    def __neg__(self):
        return BSpline(self.basis, -self.coeffs)

    def __sub__(self, other):
        return self + (-other if isinstance(other, BSpline) else -1 * other)

    def __rsub__(self, other):
        return (-self) + other

    def __mul__(self, other):
        if isinstance(other, BSpline):
            prod, W = self.basis.product_tensor(other.basis)
            Wj = jnp.asarray(W, dtype=self.coeffs.dtype)
            coeffs = jnp.einsum("qij,...i,...j->...q", Wj, self.coeffs, other.coeffs)
            return BSpline(prod, coeffs)
        return BSpline(self.basis, self.coeffs * other)

    __rmul__ = __mul__

    def __pow__(self, p: int):
        if not isinstance(p, int) or p < 1:
            raise TypeError("exponent must be a positive integer")
        out = self
        for _ in range(p - 1):
            out = out * self
        return out

    # -- calculus ----------------------------------------------------------
    def derivative(self, o: int = 1) -> "BSpline":
        if o == 0:
            return self
        Bd, P = self.basis.derivative(o)
        Pj = jnp.asarray(P, dtype=self.coeffs.dtype)
        return BSpline(Bd, jnp.einsum("qi,...i->...q", Pj, self.coeffs))

    def integral(self):
        w = jnp.asarray(self.basis.integral_weights(), dtype=self.coeffs.dtype)
        return jnp.einsum("...i,i->...", self.coeffs, w)

    def insert_knots(self, knots) -> "BSpline":
        T, basis = self.basis.knot_insertion_T(knots)
        Tj = jnp.asarray(T, dtype=self.coeffs.dtype)
        return BSpline(basis, jnp.einsum("qi,...i->...q", Tj, self.coeffs))

    def scale(self, factor, shift=0.0) -> "BSpline":
        return BSpline(self.basis.scale(factor, shift), self.coeffs)

    def crop(self, a: float, b: float) -> "BSpline":
        T, sub = self.basis.interval_T(a, b)
        Tj = jnp.asarray(T, dtype=self.coeffs.dtype)
        return BSpline(sub, jnp.einsum("qi,...i->...q", Tj, self.coeffs))


class Nurbs:
    """Rational spline: numerator/denominator coefficient pairs on one basis
    (reference spline.py:509-564).  Produced by BSpline division; evaluation
    and sampling divide pointwise; products keep rational form."""

    def __init__(self, basis, coeffs, weights):
        self.basis = basis
        self.coeffs = jnp.asarray(coeffs)
        self.weights = jnp.asarray(weights)

    def numerator(self) -> BSpline:
        return BSpline(self.basis, self.coeffs * self.weights)

    def denominator(self) -> BSpline:
        return BSpline(self.basis, self.weights)

    def __call__(self, x):
        return self.numerator()(x) / self.denominator()(x)

    def __mul__(self, other):
        if isinstance(other, Nurbs):
            num = self.numerator() * other.numerator()
            den = self.denominator() * other.denominator()
            return Nurbs(num.basis, num.coeffs / den.coeffs, den.coeffs)
        if isinstance(other, BSpline):
            num = self.numerator() * other
            den = self.denominator() * BSpline(
                other.basis, jnp.ones(len(other.basis),
                                      dtype=self.coeffs.dtype))
            return Nurbs(num.basis, num.coeffs / den.coeffs, den.coeffs)
        return Nurbs(self.basis, self.coeffs * other, self.weights)

    __rmul__ = __mul__


def spline_div(num: BSpline, den: BSpline) -> Nurbs:
    """BSpline division -> NURBS (reference spline.py:458-462)."""
    basis = num.basis + den.basis
    Tn = jnp.asarray(basis.transform(num.basis), dtype=num.coeffs.dtype)
    Td = jnp.asarray(basis.transform(den.basis), dtype=den.coeffs.dtype)
    n = jnp.einsum("qi,...i->...q", Tn, num.coeffs)
    w = jnp.einsum("qi,...i->...q", Td, den.coeffs)
    return Nurbs(basis, n / w, w)


BSpline.__truediv__ = lambda self, other: (
    spline_div(self, other) if isinstance(other, BSpline)
    else BSpline(self.basis, self.coeffs / other))


class TensorBSpline:
    """2-D tensor-product spline (reference spline.py:567-680): coefficient
    grid ``(len(basis_u), len(basis_v))``, evaluated as two small matmuls."""

    def __init__(self, bases, coeffs):
        self.basis = list(bases)
        if len(self.basis) != 2:
            raise ValueError("TensorBSpline supports 2 dimensions")
        self.coeffs = jnp.asarray(coeffs)

    def __call__(self, u, v):
        Eu = jnp.asarray(self.basis[0].eval(np.atleast_1d(u)),
                         dtype=self.coeffs.dtype)
        Ev = jnp.asarray(self.basis[1].eval(np.atleast_1d(v)),
                         dtype=self.coeffs.dtype)
        out = jnp.einsum("ui,vj,...ij->...uv", Eu, Ev, self.coeffs)
        if np.ndim(u) == 0 and np.ndim(v) == 0:
            return out[..., 0, 0]
        return out

    def __add__(self, other):
        if isinstance(other, TensorBSpline):
            if other.basis[0] is self.basis[0] \
                    and other.basis[1] is self.basis[1]:
                return TensorBSpline(self.basis, self.coeffs + other.coeffs)
            bu = self.basis[0] + other.basis[0]
            bv = self.basis[1] + other.basis[1]
            out = jnp.zeros((len(bu), len(bv)), dtype=self.coeffs.dtype)
            for s in (self, other):
                Tu = jnp.asarray(bu.transform(s.basis[0]),
                                 dtype=s.coeffs.dtype)
                Tv = jnp.asarray(bv.transform(s.basis[1]),
                                 dtype=s.coeffs.dtype)
                out = out + jnp.einsum("ui,vj,ij->uv", Tu, Tv, s.coeffs)
            return TensorBSpline([bu, bv], out)
        return TensorBSpline(self.basis, self.coeffs + other)

    __radd__ = __add__

    def __mul__(self, other):
        if isinstance(other, TensorBSpline):
            pu, Wu = self.basis[0].product_tensor(other.basis[0])
            pv, Wv = self.basis[1].product_tensor(other.basis[1])
            coeffs = jnp.einsum(
                "qik,rjl,ij,kl->qr",
                jnp.asarray(Wu, dtype=self.coeffs.dtype),
                jnp.asarray(Wv, dtype=self.coeffs.dtype),
                self.coeffs, other.coeffs)
            return TensorBSpline([pu, pv], coeffs)
        return TensorBSpline(self.basis, self.coeffs * other)

    __rmul__ = __mul__

    def derivative(self, o, axis):
        Bd, P = self.basis[axis].derivative(o)
        Pj = jnp.asarray(P, dtype=self.coeffs.dtype)
        if axis == 0:
            coeffs = jnp.einsum("qi,ij->qj", Pj, self.coeffs)
            return TensorBSpline([Bd, self.basis[1]], coeffs)
        coeffs = jnp.einsum("qj,ij->iq", Pj, self.coeffs)
        return TensorBSpline([self.basis[0], Bd], coeffs)


def circle_arc_splines(sweep: float):
    """Quadratic-NURBS arc: (cos, sin, weight) numerator/denominator BSplines
    on [0, 1] covering a rotation of ``sweep`` radians from angle 0
    (the construction behind reference obstacle.py:300-332: quarter-circle
    NURBS segments, cropped to the horizon).  Returns (cos_num, sin_num, w)
    such that cos(sweep*u) = cos_num(u)/w(u), sin likewise."""
    if sweep <= 0:
        raise ValueError("sweep must be positive")
    quarter = 0.5 * np.pi
    n_q = int(np.ceil(sweep / quarter))
    # basis over n_q quarters in u' in [0, n_q*quarter/sweep]
    u_ends = np.array([(k + 1) * quarter / sweep for k in range(n_q)])
    knots = np.r_[np.zeros(3),
                  np.repeat(u_ends[:-1], 2) if n_q > 1 else np.array([]),
                  np.full(3, u_ends[-1])]
    basis = Basis(knots, 2)
    c = np.sqrt(2.0) / 2.0
    cos_pat = np.array([1, c, 0, -c, -1, -c, 0, c])
    sin_pat = np.array([0, c, 1, c, 0, -c, -1, -c])
    w_pat = np.array([1, c, 1, c, 1, c, 1, c])
    n = len(basis)
    cos_cfs = np.array([cos_pat[k % 8] for k in range(n)])
    sin_cfs = np.array([sin_pat[k % 8] for k in range(n)])
    w_cfs = np.array([w_pat[k % 8] for k in range(n)])
    if u_ends[-1] > 1.0 + 1e-12:
        T, basis = basis.interval_T(0.0, 1.0)
        cos_cfs, sin_cfs, w_cfs = T @ cos_cfs, T @ sin_cfs, T @ w_cfs
    return (BSpline(basis, cos_cfs), BSpline(basis, sin_cfs),
            BSpline(basis, w_cfs))


def evalspline(s: BSpline, t):
    """Evaluate spline at traced scalar t (reference: spline_extra.py:28-55)."""
    bvals = eval_basis_traced(s.basis, jnp.asarray(t, dtype=s.coeffs.dtype))
    return jnp.einsum("...i,...i->...", s.coeffs, jnp.broadcast_to(bvals, s.coeffs.shape))


def running_integral(s: BSpline) -> BSpline:
    """Antiderivative spline (reference: spline_extra.py:58-76)."""
    int_basis, L = s.basis.running_integral()
    Lj = jnp.asarray(L, dtype=s.coeffs.dtype)
    return BSpline(int_basis, jnp.einsum("qi,...i->...q", Lj, s.coeffs))


def definite_integral(s: BSpline, a, b):
    """Integral of s over [a, b]; a and b may be traced scalars
    (reference: spline_extra.py:79-85)."""
    R = running_integral(s)
    return evalspline(R, b) - evalspline(R, a)


def sample_spline(basis_or_spline, coeffs_or_time, time=None):
    """Host-side dense sampling: sample_spline(spline, t) or
    sample_spline(basis, coeffs, t).  Returns numpy array (..., len(t))."""
    if time is None:
        s, t = basis_or_spline, coeffs_or_time
        basis, coeffs = s.basis, np.asarray(s.coeffs)
    else:
        basis, coeffs, t = basis_or_spline, np.asarray(coeffs_or_time), time
    E = basis.eval(np.asarray(t))
    return np.einsum("ti,...i->...t", E, coeffs)
