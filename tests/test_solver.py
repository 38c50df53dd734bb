"""Interior-point solver tests on small reference NLPs (scipy as oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omg_tools_tpu.ops.solver import make_ip_solver, IPOptions, BIG

pytestmark = pytest.mark.fast


def test_qp_inequality():
    # min x^2 + y^2  s.t. x + y >= 1  -> (0.5, 0.5)
    f = lambda x, p: x @ x
    g = lambda x, p: jnp.array([x[0] + x[1]])
    solve = make_ip_solver(f, g, 2, np.array([1.0]), np.array([BIG]))
    st = solve(jnp.zeros(2), jnp.zeros(1), jnp.array([1.0]), jnp.array([BIG]))
    np.testing.assert_allclose(np.asarray(st.x), [0.5, 0.5], atol=1e-4)
    assert float(st.kkt_err) < 1e-4


def test_qp_equality():
    f = lambda x, p: x @ x + p[0] * x[0]
    g = lambda x, p: jnp.array([x[0] + x[1]])
    solve = make_ip_solver(f, g, 2, np.array([1.0]), np.array([1.0]))
    st = solve(jnp.zeros(2), jnp.array([0.0]), jnp.array([1.0]),
               jnp.array([1.0]))
    np.testing.assert_allclose(np.asarray(st.x), [0.5, 0.5], atol=1e-4)


def test_box_active_upper():
    # min (x-2)^2 s.t. 0 <= x <= 1 -> x = 1
    f = lambda x, p: (x[0] - 2.0) ** 2
    g = lambda x, p: jnp.array([x[0]])
    lb, ub = np.array([0.0]), np.array([1.0])
    solve = make_ip_solver(f, g, 1, lb, ub)
    st = solve(jnp.array([0.5]), jnp.zeros(1), jnp.asarray(lb), jnp.asarray(ub))
    np.testing.assert_allclose(np.asarray(st.x), [1.0], atol=1e-4)


def test_hs071():
    # classic Hock-Schittkowski 71:
    # min x0*x3*(x0+x1+x2) + x2
    # s.t. x0*x1*x2*x3 >= 25 ; x0^2+..+x3^2 = 40 ; 1 <= x <= 5
    def f(x, p):
        return x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]

    def g(x, p):
        return jnp.concatenate([
            jnp.array([jnp.prod(x), x @ x]), x])
    lb = np.array([25.0, 40.0, 1, 1, 1, 1])
    ub = np.array([BIG, 40.0, 5, 5, 5, 5])
    solve = make_ip_solver(f, g, 4, lb, ub,
                           IPOptions(max_iter=80, tol=1e-6))
    x0 = jnp.array([1.0, 5.0, 5.0, 1.0])
    st = solve(x0, jnp.zeros(1), jnp.asarray(lb), jnp.asarray(ub))
    # known solution
    ref = np.array([1.0, 4.742994, 3.821150, 1.379408])
    np.testing.assert_allclose(np.asarray(st.x), ref, atol=2e-3)


def test_vmap_batch():
    # batch of shifted QPs: min (x-c)^2 s.t. x >= 0
    f = lambda x, p: jnp.sum((x - p) ** 2)
    g = lambda x, p: x
    lb, ub = np.zeros(2), np.full(2, BIG)
    solve = make_ip_solver(f, g, 2, lb, ub)
    cs = jnp.array([[-1.0, 2.0], [3.0, -0.5], [0.2, 0.1]])
    batched = jax.vmap(lambda c: solve(jnp.zeros(2) + 0.5, c,
                                       jnp.asarray(lb), jnp.asarray(ub)))
    st = batched(cs)
    np.testing.assert_allclose(np.asarray(st.x),
                               np.maximum(np.asarray(cs), 0.0), atol=2e-3)


def test_shutdown_widened_bounds():
    # same row classification, but runtime-widened bounds deactivate the
    # constraint: min (x-2)^2 with x <= 1 widened to x <= BIG -> x = 2
    f = lambda x, p: (x[0] - 2.0) ** 2
    g = lambda x, p: jnp.array([x[0]])
    lb0, ub0 = np.array([-BIG]), np.array([1.0])
    solve = make_ip_solver(f, g, 1, lb0, ub0)
    st = solve(jnp.array([0.0]), jnp.zeros(1), jnp.array([-BIG]),
               jnp.array([BIG]))
    np.testing.assert_allclose(np.asarray(st.x), [2.0], atol=1e-3)


def test_warm_start_reuse():
    f = lambda x, p: jnp.sum((x - p) ** 2)
    g = lambda x, p: x
    lb, ub = np.zeros(2), np.full(2, BIG)
    solve = make_ip_solver(f, g, 2, lb, ub)
    p1 = jnp.array([1.0, 2.0])
    st1 = solve(jnp.full(2, 0.5), p1, jnp.asarray(lb), jnp.asarray(ub))
    # perturb target, warm start from st1
    p2 = p1 + 0.01
    st2 = solve(st1.x, p2, jnp.asarray(lb), jnp.asarray(ub), state0=st1,
                max_iter=8)
    np.testing.assert_allclose(np.asarray(st2.x), np.asarray(p2), atol=1e-3)
