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
