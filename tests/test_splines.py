"""Unit tests for the spline kernel engine.

Ground truth is scipy.interpolate.splev -- the same oracle the reference uses
for its own sampling (reference: basics/spline_extra.py:406-410).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.interpolate import splev

from omg_tools_tpu.ops.basis import Basis, clamped_basis, clamped_knots
from omg_tools_tpu.ops.spline import (
    BSpline, evalspline, running_integral, definite_integral, sample_spline,
    eval_basis_traced)

pytestmark = pytest.mark.fast

RNG = np.random.default_rng(0)


def rand_spline(n_int=10, degree=3):
    basis = clamped_basis(n_int, degree)
    return basis, RNG.standard_normal(len(basis))


def splev_ref(basis, coeffs, x, der=0):
    return splev(x, (basis.knots, np.asarray(coeffs, dtype=np.float64), basis.degree), der=der)


def test_eval_matches_splev():
    basis, c = rand_spline()
    x = np.linspace(0, 1, 211)
    ours = basis.eval(x) @ c
    np.testing.assert_allclose(ours, splev_ref(basis, c, x), atol=1e-12)


def test_eval_endpoint_and_partition_of_unity():
    basis = clamped_basis(7, 3)
    x = np.linspace(0, 1, 101)
    E = basis.eval(x)
    np.testing.assert_allclose(E.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(E[0], np.eye(len(basis))[0], atol=1e-12)
    np.testing.assert_allclose(E[-1], np.eye(len(basis))[-1], atol=1e-12)


def test_derivative_matrix():
    basis, c = rand_spline()
    # stay off the knots: the 3rd derivative of a cubic is discontinuous
    # there and our left-continuity convention differs from splev's
    x = np.linspace(0.003, 0.997, 97)
    x = x[np.abs(x[:, None] - basis.knots[None, :]).min(axis=1) > 1e-9]
    for o in (1, 2, 3):
        Bd, P = basis.derivative(o)
        ours = Bd.eval(x) @ (P @ c)
        np.testing.assert_allclose(ours, splev_ref(basis, c, x, der=o),
                                   atol=1e-9)


def test_transform_exact_embedding():
    src = clamped_basis(5, 3)
    tgt = src.insert_knots([0.15, 0.55])
    c = RNG.standard_normal(len(src))
    T = tgt.transform(src)
    x = np.linspace(0, 1, 301)
    np.testing.assert_allclose(tgt.eval(x) @ (T @ c), src.eval(x) @ c,
                               atol=1e-9)


def test_product_tensor():
    # hyperplane-style basis (environment.py:107-112 builds exactly this)
    b1 = Basis(np.r_[0.0, clamped_knots(10, 3)[3:-3], 1.0], 1)
    b2 = clamped_basis(10, 3)     # trajectory basis
    c1 = RNG.standard_normal(len(b1))
    c2 = RNG.standard_normal(len(b2))
    prod, W = b1.product_tensor(b2)
    cp = np.einsum("qij,i,j->q", W, c1, c2)
    x = np.linspace(0, 1, 301)
    np.testing.assert_allclose(prod.eval(x) @ cp,
                               (b1.eval(x) @ c1) * (b2.eval(x) @ c2),
                               atol=1e-8)


def test_square_spline_jax():
    basis, c = rand_spline(6, 3)
    s = BSpline(basis, jnp.asarray(c, dtype=jnp.float64)
                if jax.config.jax_enable_x64 else jnp.asarray(c))
    sq = s * s
    x = np.linspace(0, 1, 101)
    np.testing.assert_allclose(np.asarray(sq(x)),
                               (basis.eval(x) @ c) ** 2, rtol=2e-5, atol=1e-5)


def test_integral_weights():
    basis, c = rand_spline()
    w = basis.integral_weights()
    x = np.linspace(0, 1, 20001)
    val = np.trapezoid(basis.eval(x) @ c, x)
    np.testing.assert_allclose(w @ c, val, atol=1e-6)


def test_running_integral():
    basis, c = rand_spline(8, 3)
    ib, L = basis.running_integral()
    ci = L @ c
    xf = np.linspace(0, 1, 20001)
    vals = basis.eval(xf) @ c
    cum = np.concatenate([[0.0], np.cumsum((vals[1:] + vals[:-1]) * 0.5
                                           * np.diff(xf))])
    x = xf[::400]
    np.testing.assert_allclose(ib.eval(x) @ ci, cum[::400], atol=1e-6)


def test_eval_basis_traced_matches_numpy():
    basis, c = rand_spline()
    for t in [0.0, 0.03, 0.5, 0.77, 1.0]:
        traced = np.asarray(eval_basis_traced(basis, jnp.asarray(t)))
        np.testing.assert_allclose(traced, basis.eval([t])[0], atol=1e-6)


def test_evalspline_jit():
    basis, c = rand_spline()
    s = BSpline(basis, jnp.asarray(c))
    f = jax.jit(lambda t: evalspline(s, t))
    for t in [0.0, 0.08, 0.93]:
        np.testing.assert_allclose(float(f(t)), float(basis.eval([t]) @ c),
                                   rtol=1e-5, atol=1e-5)


def test_definite_integral_traced():
    basis, c = rand_spline()
    s = BSpline(basis, jnp.asarray(c))
    val = jax.jit(lambda a: definite_integral(s, a, 1.0))(jnp.asarray(0.25))
    x = np.linspace(0.25, 1.0, 20001)
    ref = np.trapezoid(basis.eval(x) @ c, x)
    np.testing.assert_allclose(float(val), ref, rtol=1e-4, atol=1e-5)


def test_shiftoverknot():
    """New spline equals old spline advanced by one knot interval, with
    polynomial extrapolation of the last piece."""
    basis, c = rand_spline(10, 3)
    T = basis.shiftoverknot_T()
    c2 = T @ c
    delta = 0.1
    x = np.linspace(0, 1 - delta, 101)
    np.testing.assert_allclose(basis.eval(x) @ c2,
                               splev_ref(basis, c, x + delta), atol=1e-8)
    # beyond: matches Taylor extension of last segment
    xe = np.array([1 - delta + 0.03, 1.0])
    rows = basis.extrapolation_rows(xe + delta)
    np.testing.assert_allclose(basis.eval(xe) @ c2, rows @ c, atol=1e-8)


def test_shiftfirstknot():
    basis, c = rand_spline(10, 3)
    t_shift = 0.047
    T = basis.shiftfirstknot_T(t_shift)
    c2 = T @ c
    knots2 = np.array(basis.knots)
    knots2[:basis.degree + 1] = t_shift
    b2 = Basis(knots2, basis.degree)
    x = np.linspace(t_shift, 1, 101)
    np.testing.assert_allclose(b2.eval(x) @ c2, splev_ref(basis, c, x),
                               atol=1e-8)


def test_shift_spline_rebasing():
    # shift_spline is approximate by design (knot positions change,
    # reference spline_extra.py:88-91) -- use a smooth spline like the MPC
    # warm starts it is applied to
    basis = clamped_basis(10, 3)
    g = basis.greville()
    c = np.sin(2.1 * g) + 0.3 * g ** 2
    t_shift = 0.13
    T = basis.shift_spline_T(t_shift)
    c2 = T @ c
    n_knots = len(basis) - basis.degree + 1
    knots2 = np.r_[t_shift * np.ones(basis.degree),
                   np.linspace(t_shift, 1, n_knots), np.ones(basis.degree)]
    b2 = Basis(knots2, basis.degree)
    # approximate transform: interior agreement to reasonable tolerance
    x = np.linspace(t_shift + 0.01, 0.99, 50)
    ref = splev_ref(basis, c, x)
    ours = b2.eval(x) @ c2
    assert np.max(np.abs(ours - ref)) < 0.05 * max(1.0, np.max(np.abs(ref)))


def test_interval_T():
    basis, c = rand_spline(10, 3)
    T, sub = basis.interval_T(0.2, 0.7)
    x = np.linspace(0.2, 0.7, 101)
    np.testing.assert_allclose(sub.eval(x) @ (T @ c), splev_ref(basis, c, x),
                               atol=1e-8)


def test_knot_insertion_T():
    basis, c = rand_spline(6, 3)
    T, nb = basis.knot_insertion_T([0.25, 0.25, 0.6])
    x = np.linspace(0, 1, 211)
    np.testing.assert_allclose(nb.eval(x) @ (T @ c), splev_ref(basis, c, x),
                               atol=1e-8)


def test_spline_addition_different_bases():
    b1, c1 = rand_spline(5, 2)
    b2, c2 = rand_spline(10, 3)
    s = BSpline(b1, jnp.asarray(c1)) + BSpline(b2, jnp.asarray(c2))
    x = np.linspace(0, 1, 101)
    np.testing.assert_allclose(np.asarray(s(x)),
                               b1.eval(x) @ c1 + b2.eval(x) @ c2,
                               rtol=1e-5, atol=1e-5)


def test_basis_interning():
    a = clamped_basis(10, 3)
    b = Basis(clamped_knots(10, 3), 3)
    assert a is b
