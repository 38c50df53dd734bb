"""Traced spline transforms (ops/spline_jax) vs the numeric host engine.

Covers the reference's symbolic-in-t machinery: shiftfirstknot_T fwd/bwd
(spline_extra.py:220-255), the future-piece property used by ADMM
(admm.py:86-88), traced Cox-de Boor with traced knots, and the traced
free-T re-basing shift_spline_T (spline_extra.py:88-99)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omg_tools_tpu.ops.basis import clamped_basis, Basis
from omg_tools_tpu.ops import spline_jax as sj

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("n_int,degree", [(10, 3), (8, 2), (6, 4)])
def test_shiftfirstknot_matches_numeric(n_int, degree):
    basis = clamped_basis(n_int, degree)
    tp = sj.shiftfirstknot_poly(basis)
    assert tp.fit_err < 1e-10
    t_hi = float(basis.knots[degree + 1])
    for t in (0.0, 0.3 * t_hi, 0.7 * t_hi, 0.999 * t_hi):
        T_num = basis.shiftfirstknot_T(t) if t > 0 else np.eye(len(basis))
        T_tr = np.asarray(sj.shiftfirstknot_T(basis, t))
        np.testing.assert_allclose(T_tr, T_num, atol=1e-10)


def test_shiftfirstknot_future_piece_values():
    """The transformed spline agrees with the original on [t, 1] -- the
    property the ADMM future-piece penalty relies on."""
    basis = clamped_basis(10, 3)
    rng = np.random.default_rng(0)
    coeffs = rng.standard_normal((len(basis), 2))
    t = 0.06
    knots2 = np.array(basis.knots)
    knots2[:basis.degree + 1] = t
    target = Basis(knots2, basis.degree)
    xs = np.linspace(t, 1.0, 41)
    v_orig = basis.eval(xs) @ coeffs
    v_shift = target.eval(xs) @ np.asarray(
        sj.shift_knot1_fwd(coeffs, basis, t))
    np.testing.assert_allclose(v_shift, v_orig, atol=1e-10)


def test_shift_knot1_roundtrip():
    basis = clamped_basis(10, 3)
    rng = np.random.default_rng(1)
    coeffs = rng.standard_normal((len(basis), 3))
    fwd = sj.shift_knot1_fwd(coeffs, basis, 0.05)
    back = np.asarray(sj.shift_knot1_bwd(np.asarray(fwd), basis, 0.05))
    np.testing.assert_allclose(back, coeffs, atol=1e-9)


def test_shiftfirstknot_jit_vmap():
    basis = clamped_basis(10, 3)
    f = jax.jit(jax.vmap(lambda t: sj.shiftfirstknot_T(basis, t)))
    ts = jnp.asarray([0.0, 0.02, 0.05, 0.09])
    out = np.asarray(f(ts))
    for k, t in enumerate(np.asarray(ts)):
        ref = basis.shiftfirstknot_T(float(t)) if t > 0 else np.eye(len(basis))
        np.testing.assert_allclose(out[k], ref, atol=1e-8)


def test_eval_basis_traced_matches_host():
    for n_int, degree in [(10, 3), (7, 2), (5, 5)]:
        basis = clamped_basis(n_int, degree)
        xs = np.linspace(0, 1, 73)
        host = basis.eval(xs)
        traced = np.asarray(sj.eval_basis_traced(
            jnp.asarray(basis.knots), degree, jnp.asarray(xs)))
        np.testing.assert_allclose(traced, host, atol=1e-12)


def test_greville_traced_matches_host():
    basis = clamped_basis(9, 3)
    np.testing.assert_allclose(
        np.asarray(sj.greville_traced(jnp.asarray(basis.knots), 3)),
        basis.greville(), atol=1e-12)


def test_shift_spline_T_traced_matches_host():
    for degree in (2, 3):
        basis = clamped_basis(10, degree)
        f = jax.jit(lambda t, b=basis: sj.shift_spline_T_traced(b, t))
        for t in (0.01, 0.12, 0.33, 0.49):
            np.testing.assert_allclose(np.asarray(f(t)),
                                       basis.shift_spline_T(t), atol=1e-8)
