"""Family-compacted solver path (ops/compact.py) vs the dense quadratic
path: structural equivalence of g/J/grad/Hessian and end-to-end agreement
of the batched rollout on the canonical p2p problem."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omg_tools_tpu import (Holonomic, Environment, Obstacle, Circle, Square,
                           Point2point)
from omg_tools_tpu.ops.compact import (build_compact, resolve_phase,
                                       CompactWork)

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def runner_pair():
    veh = Holonomic()
    veh.set_initial_conditions([-1.5, -1.5])
    veh.set_terminal_conditions([2.0, 2.0])
    env = Environment(room={"shape": Square(5.0)})
    env.add_obstacle(Obstacle({"position": [0.5, 0.2], "velocity": [-0.2, 0]},
                              shape=Circle(0.4)))
    prob = Point2point(veh, env, freeT=False)
    prob.set_options({"verbose": 0})
    prob.init()
    from omg_tools_tpu.problems.batch import BatchedP2PRunner
    runner = BatchedP2PRunner(prob, dtype=jnp.float64)
    return prob, runner


def test_compact_structure_built(runner_pair):
    prob, runner = runner_pair
    assert runner.structure in ("compact", "compact-arrow")
    struct = runner.compact
    tr = prob.transcription
    m = len(np.asarray(tr.lb))
    assert struct.m == m
    assert sorted(struct.row_perm.tolist()) == list(range(m))
    # compacted tensors are much smaller than the dense quadratic form
    dense_bytes = runner._Q_raw.nbytes + sum(
        v.nbytes for v in runner._affine_np.values())
    assert struct.nbytes() < 0.35 * dense_bytes


def test_compact_matches_dense_evals(runner_pair):
    """g, J'y, and the GN Hessian agree (up to row permutation) with the
    dense scaled formulation used by the quadratic path."""
    prob, runner = runner_pair
    tr = prob.transcription
    struct = runner.compact
    n = tr.n_x
    m = struct.m
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n) * 0.3)
    # perturb only the parameters the affine model covers (vehicle state,
    # goal, obstacle motion) -- t/T/shape data enter nonlinearly and stay
    # at their base values during a rollout phase
    p_np = prob.pack_parameters(0.0)
    varying = [runner.i_state0, runner.i_input0]
    sl, _ = tr.par_slice(prob.vehicles[0], "poseT")
    varying.append(np.arange(sl.start, sl.stop))
    for (ix, iv, ia) in runner.obstacle_idx:
        varying.extend([ix, iv, ia])
    varying = np.concatenate(varying)
    p_np[varying] += rng.standard_normal(len(varying)) * 0.05
    p = jnp.asarray(p_np)
    d = np.asarray(prob._row_scale)
    s_obj = prob._obj_scale

    ct = resolve_phase(struct, struct.device_tensors(jnp.float64), 0, p)
    work = CompactWork(struct, ct)
    perm = struct.row_perm

    # g
    g_dense = d * np.asarray(tr.constraints(x, p))
    g_comp = np.asarray(work.g(x))
    np.testing.assert_allclose(g_comp, g_dense[perm], rtol=1e-8, atol=1e-8)

    # f, gf
    np.testing.assert_allclose(float(work.f(x)),
                               s_obj * float(tr.objective(x, p)), rtol=1e-8)

    # grad = gf + J' y
    y = rng.standard_normal(m)
    J_dense = d[:, None] * np.asarray(jax.jacfwd(tr.constraints)(x, p))
    Jf = work.jacobians(x)
    grad_comp = np.asarray(work.grad(Jf, jnp.asarray(y)))
    grad_dense = s_obj * np.asarray(jax.grad(tr.objective)(x, p)) \
        + J_dense[perm].T @ y
    np.testing.assert_allclose(grad_comp, grad_dense, rtol=1e-7, atol=1e-7)

    # Hessian rho J'DJ
    act = (rng.random(m) > 0.4).astype(np.float64)
    rho = 7.0
    H_comp = np.asarray(work.hessian(Jf, jnp.asarray(act), rho, 0.0))
    Jp = J_dense[perm]
    H_dense = rho * (Jp * act[:, None]).T @ Jp
    np.testing.assert_allclose(H_comp, H_dense, rtol=1e-7, atol=1e-7)

    # line-search terms
    dx = rng.standard_normal(n) * 0.1
    Jd_comp = np.asarray(work.Jd(Jf, jnp.asarray(dx)))
    np.testing.assert_allclose(Jd_comp, Jp @ dx, rtol=1e-7, atol=1e-8)
    g2 = d * np.asarray(tr.constraints(jnp.asarray(np.asarray(x) + dx), p))
    qd_comp = np.asarray(work.quad_dir(jnp.asarray(dx)))
    # g(x+d) = g(x) + J d + d'Qd
    np.testing.assert_allclose(g_comp + Jd_comp + qd_comp, g2[perm],
                               rtol=1e-7, atol=1e-7)


def test_compact_rollout_matches_dense(runner_pair):
    """End-to-end: 3 MPC steps via the compact path vs the dense quadratic
    path produce the same trajectories."""
    prob, runner = runner_pair
    B = 4
    rng = np.random.default_rng(1)
    starts = np.tile([-1.5, -1.5], (B, 1)) + rng.uniform(-0.2, 0.2, (B, 2))
    goals = np.tile([2.0, 2.0], (B, 1)) + rng.uniform(-0.2, 0.2, (B, 2))
    x0, p0, state = runner.make_batch(starts, goals)
    consts = runner.consts()
    st = runner.init_solver_state(x0, p0, consts)
    roll = jax.jit(runner.rollout_fn(3, outer_iter=2))
    carry_c, states_c = roll(st, p0, state, consts)

    # force the dense path on a fresh runner
    runner_d = type(runner)(prob, dtype=jnp.float64)
    assert runner_d.structure in ("compact", "compact-arrow")
    runner_d.compact = None
    runner_d.structure = "quadratic"
    from omg_tools_tpu.ops.alm import make_alm_solver, ALMOptions
    tr = prob.transcription
    runner_d.solver = make_alm_solver(
        tr.objective, tr.constraints, tr.n_x, tr.lb, tr.ub, ALMOptions(),
        row_scale=prob._row_scale, obj_scale=prob._obj_scale,
        quadratic_Q=runner_d._Q_raw)
    runner_d.Q_dev = jnp.asarray(runner_d.solver.Q_scaled,
                                 dtype=jnp.float64)
    consts_d = runner_d.consts()
    st_d = runner_d.init_solver_state(x0, p0, consts_d)
    roll_d = jax.jit(runner_d.rollout_fn(3, outer_iter=2))
    carry_d, states_d = roll_d(st_d, p0, state, consts_d)

    # 1e-5-level agreement: with the moderate default penalty (rho_init 10)
    # the two formulations' truncated iterates match to ~5e-6 m, not 1e-6
    # (both are within solver tolerance of the same optimum)
    np.testing.assert_allclose(np.asarray(states_c), np.asarray(states_d),
                               rtol=1e-4, atol=5e-5)
    # scenarios actually move toward their goals
    d0 = np.linalg.norm(starts - goals, axis=1)
    d1 = np.linalg.norm(np.asarray(states_c)[:, -1] - goals, axis=1)
    assert np.all(d1 < d0)


def test_arrow_structure_detected(runner_pair):
    """The canonical p2p transcription is block-arrow: head = vehicle
    splines, tail blocks = per-obstacle hyperplane coeffs + terminal
    slack."""
    prob, runner = runner_pair
    assert runner.structure == "compact-arrow"
    ar = runner.compact.arrow
    assert ar is not None
    h0, h = ar.head
    assert (h0, h) == (int(runner.i_splines[0]), len(runner.i_splines))
    # blocks tile the non-head variables exactly
    covered = np.zeros(runner.n_x, dtype=bool)
    covered[h0:h0 + h] = True
    for (s, sz) in ar.blocks:
        assert not covered[s:s + sz].any()
        covered[s:s + sz] = True
    assert covered.all()
    # every family touches at most one tail block
    assert len(ar.fam_block) == len(runner.compact.families)


def test_arrow_system_matches_dense(runner_pair):
    """S/D/C assembly reconstructs the dense GN Hessian and gradient."""
    prob, runner = runner_pair
    struct = runner.compact
    ar = struct.arrow
    tr = prob.transcription
    n = tr.n_x
    m = struct.m
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(n) * 0.3)
    p = jnp.asarray(prob.pack_parameters(0.0))
    ct = resolve_phase(struct, struct.device_tensors(jnp.float64), 0, p)
    work = CompactWork(struct, ct)
    Jf = work.jacobians(x)
    y = jnp.asarray(rng.standard_normal(m))
    act = jnp.asarray((rng.random(m) > 0.4).astype(np.float64))
    rho = 5.0

    S, D, C, r_h, r_b = work.arrow_system(Jf, y, act, rho)
    grad_arrow = np.asarray(work.arrow_scatter(r_h, r_b))
    grad_dense = np.asarray(work.grad(Jf, y))
    np.testing.assert_allclose(grad_arrow, grad_dense, rtol=1e-9, atol=1e-9)

    H_dense = np.asarray(work.hessian(Jf, act, rho, 0.0))
    h0, h = ar.head
    H_rec = np.zeros((n, n))
    S = np.asarray(S)
    D = np.asarray(D)
    C = np.asarray(C)
    H_rec[h0:h0 + h, h0:h0 + h] = S
    for bi, (s, sz) in enumerate(ar.blocks):
        # pad diag (ones) lives outside [:sz, :sz]
        H_rec[s:s + sz, s:s + sz] = D[bi, :sz, :sz]
        H_rec[h0:h0 + h, s:s + sz] = C[bi, :, :sz]
        H_rec[s:s + sz, h0:h0 + h] = C[bi, :, :sz].T
    np.testing.assert_allclose(H_rec, H_dense, rtol=1e-9, atol=1e-9)


def test_psd_solve_multi_cpu_fallback():
    rng = np.random.default_rng(0)
    B, k, n, r = 3, 4, 11, 6
    A = rng.standard_normal((B, k, n, n))
    D = np.einsum("bkij,bklj->bkil", A, A) + 5 * np.eye(n)
    G = rng.standard_normal((B, k, n, r))
    from omg_tools_tpu.ops.pallas_kernels import psd_solve_multi
    got = np.asarray(jax.vmap(psd_solve_multi)(jnp.asarray(D),
                                               jnp.asarray(G)))
    want = np.stack([[np.linalg.solve(D[b, j], G[b, j]) for j in range(k)]
                     for b in range(B)])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_rescue_lanes_rollout(runner_pair):
    """The worst-K rescue pass (rollout_fn rescue_lanes): trajectories stay
    valid, the feasibility tail never degrades, and with every lane below
    the rescue tolerance the rescue is a no-op."""
    prob, runner = runner_pair
    B = 8
    rng = np.random.default_rng(3)
    starts = np.tile([-1.5, -1.5], (B, 1)) + rng.uniform(-0.2, 0.2, (B, 2))
    goals = np.tile([2.0, 2.0], (B, 1)) + rng.uniform(-0.2, 0.2, (B, 2))
    x0, p0, state = runner.make_batch(starts, goals)
    consts = runner.consts()
    st = runner.init_solver_state(x0, p0, consts)
    roll0 = jax.jit(runner.rollout_fn(3, outer_iter=1))
    carry0, states0 = roll0(st, p0, state, consts)
    roll_r = jax.jit(runner.rollout_fn(3, outer_iter=1, rescue_lanes=2,
                                       rescue_outer=2))
    carry_r, states_r = roll_r(st, p0, state, consts)
    fr0 = np.asarray(carry0[0].feas_raw)
    frr = np.asarray(carry_r[0].feas_raw)
    # rescue keeps the better iterate, so no lane's violation grows beyond
    # the tolerance band
    assert np.max(frr) <= max(np.max(fr0) * (1 + 1e-6), 1e-3)
    # scenarios still progress toward their goals
    d0 = np.linalg.norm(starts - goals, axis=1)
    d1 = np.linalg.norm(np.asarray(states_r)[:, -1] - goals, axis=1)
    assert np.all(d1 < d0)
    # f64 lanes already below rescue_tol: rescued trajectories match
    if np.max(fr0) < 1e-3:
        np.testing.assert_allclose(np.asarray(states_r),
                                   np.asarray(states0), rtol=1e-6,
                                   atol=1e-6)
