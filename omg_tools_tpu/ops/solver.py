"""Batched primal-dual interior-point NLP solver.

Replaces the reference's CasADi+Ipopt backend (optilayer.py:49-104,
problem.py:103-136) with a fixed-iteration, branch-free solver designed for
TPU execution:

- the whole iteration is jit-compiled and vmap-batched over scenarios;
- one dense KKT factorization per iteration (batched LU -- these systems are
  a few hundred variables, so thousands of them solve in parallel on-chip);
- inequality handling mirrors Ipopt's slack formulation: g rows with
  lb == ub are equalities, all other rows get slacks with log barriers on
  their finite bounds; complementarity is driven by a monotone
  Fiacco-McCormick barrier schedule;
- no data-dependent control flow: fraction-to-boundary damping plus a
  parallel-candidate merit backtracking step (best-of-K), with converged
  batch elements frozen by masking.

Warm starting across MPC steps is first-class: ``solve`` accepts and returns
the full solver state (x, s, y, z, mu), which the receding-horizon layer
shifts with the spline transforms.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["IPState", "IPOptions", "make_ip_solver", "BIG"]

BIG = 1e20


class IPOptions(NamedTuple):
    max_iter: int = 40
    tol: float = 1e-4
    mu_init: float = 1e-2
    mu_min: float = 1e-9
    mu_kappa: float = 0.2      # geometric barrier decrease factor
    mu_theta: float = 1.5      # superlinear decrease exponent
    tau_min: float = 0.99      # fraction-to-boundary
    delta_w: float = 1e-7      # Hessian (inertia) regularization
    delta_c: float = 1e-8      # equality-block regularization
    slack_min: float = 1e-6
    kappa_sigma: float = 1e10  # dual safeguard vs primal iterate
    ls_candidates: tuple = (1.0, 0.7, 0.45, 0.3, 0.2, 0.12, 0.07, 0.04,
                            0.02, 0.01)
    nu_merit: float = 100.0    # minimum constraint-violation weight in merit
    mu_rule: str = "monotone"  # "monotone" (Fiacco-McCormick) or "adaptive"


class IPState(NamedTuple):
    x: jax.Array        # (n,)
    s: jax.Array        # (mI,) slacks for inequality rows
    yE: jax.Array       # (mE,) equality multipliers
    yI: jax.Array       # (mI,) inequality multipliers
    zL: jax.Array       # (mI,) lower-bound duals
    zU: jax.Array       # (mI,) upper-bound duals
    mu: jax.Array       # () barrier parameter
    delta: jax.Array    # () adaptive regularization
    kkt_err: jax.Array  # () convergence error
    n_iter: jax.Array   # () iterations actually applied


def gradient_row_scales(jac_fn, x0, p0, max_gradient=100.0):
    """Ipopt-style gradient-based constraint scaling: rows whose Jacobian
    infinity-norm at the reference point exceeds ``max_gradient`` are scaled
    down (Ipopt's nlp_scaling_method=gradient-based)."""
    J = np.asarray(jac_fn(x0, p0))
    row_norm = np.max(np.abs(J), axis=1)
    return 1.0 / np.maximum(1.0, row_norm / max_gradient)


def make_ip_solver(f: Callable, g: Callable, n_x: int,
                   lb0: np.ndarray, ub0: np.ndarray,
                   options: IPOptions = IPOptions(),
                   row_scale: Optional[np.ndarray] = None,
                   obj_scale: float = 1.0):
    """Build a jit/vmap-compatible solver for
        min f(x, p)  s.t.  lb <= g(x, p) <= ub
    Row classification (equality vs inequality, which sides are bounded) is
    static from (lb0, ub0); runtime bounds may widen rows to +/-BIG (the
    constraint-shutdown mechanism) without changing the classification.

    ``row_scale`` / ``obj_scale`` are static scaling factors (see
    :func:`gradient_row_scales`); the returned solution is in original units.

    Returns ``solve(x0, p, lb, ub, state0=None, max_iter=None)``.
    """
    lb0 = np.asarray(lb0, dtype=np.float64)
    ub0 = np.asarray(ub0, dtype=np.float64)
    if row_scale is not None:
        d_np = np.asarray(row_scale, dtype=np.float64)
        d = jnp.asarray(d_np)
        f_raw, g_raw = f, g
        f = lambda x, p: obj_scale * f_raw(x, p)
        g = lambda x, p: d * g_raw(x, p)
        lb0 = np.where(lb0 > -BIG / 2, d_np * lb0, lb0)
        ub0 = np.where(ub0 < BIG / 2, d_np * ub0, ub0)
        _scale_rt = lambda lb, ub: (
            jnp.where(lb > -BIG / 2, d * lb, lb),
            jnp.where(ub < BIG / 2, d * ub, ub))
    else:
        _scale_rt = lambda lb, ub: (lb, ub)
    m = lb0.shape[0]
    eq_rows = np.where((ub0 - lb0) <= 1e-12)[0]
    in_rows = np.where((ub0 - lb0) > 1e-12)[0]
    has_lb = (lb0[in_rows] > -BIG / 2)
    has_ub = (ub0[in_rows] < BIG / 2)
    mE, mI = len(eq_rows), len(in_rows)
    n_barrier = max(int(has_lb.sum() + has_ub.sum()), 1)
    opt = options

    eq_rows_j = jnp.asarray(eq_rows)
    in_rows_j = jnp.asarray(in_rows)
    has_lb_j = jnp.asarray(has_lb)
    has_ub_j = jnp.asarray(has_ub)

    def lagrangian(x, p, lam):
        return f(x, p) + g(x, p) @ lam

    grad_f = jax.grad(f)
    jac_g = jax.jacfwd(g)
    hess_L = jax.hessian(lagrangian)

    def init_state(x0, p, lb, ub, mu0=None):
        mu0 = opt.mu_init if mu0 is None else mu0
        gv = g(x0, p)
        lbI, ubI = lb[in_rows_j], ub[in_rows_j]
        width = ubI - lbI
        # place slacks inside the interval at a distance proportional to the
        # initial violation: a violated row then allows a near-unit
        # fraction-to-boundary step toward feasibility instead of being
        # pinned against its bound
        gI = gv[in_rows_j]
        viol_lo = jnp.maximum(lbI - gI, 0.0)
        viol_hi = jnp.maximum(gI - ubI, 0.0)
        viol = viol_lo + viol_hi
        pad = jnp.minimum(0.45 * width,
                          jnp.maximum(1e-2, 1.1 * viol + 1e-2))
        s = jnp.clip(gI,
                     jnp.where(has_lb_j, lbI + pad, -BIG),
                     jnp.where(has_ub_j, ubI - pad, BIG))
        zL = jnp.where(has_lb_j, mu0 / jnp.maximum(s - lbI, opt.slack_min), 0.0)
        zU = jnp.where(has_ub_j, mu0 / jnp.maximum(ubI - s, opt.slack_min), 0.0)
        return IPState(x=x0, s=s, yE=jnp.zeros(mE), yI=zU - zL, zL=zL, zU=zU,
                       mu=jnp.asarray(mu0, dtype=x0.dtype),
                       delta=jnp.asarray(opt.delta_w, dtype=x0.dtype),
                       kkt_err=jnp.asarray(jnp.inf, dtype=x0.dtype),
                       n_iter=jnp.asarray(0))

    def merit(x, s, p, lb, ub, mu, nu):
        """Barrier merit with l1 constraint violation."""
        obj = f(x, p)
        gv = g(x, p)
        lbI, ubI = lb[in_rows_j], ub[in_rows_j]
        barL = jnp.where(has_lb_j, jnp.log(jnp.maximum(s - lbI, 1e-30)), 0.0)
        barU = jnp.where(has_ub_j, jnp.log(jnp.maximum(ubI - s, 1e-30)), 0.0)
        viol = (jnp.sum(jnp.abs(gv[eq_rows_j] - lb[eq_rows_j])) if mE else 0.0) \
            + jnp.sum(jnp.abs(gv[in_rows_j] - s))
        return obj - mu * (jnp.sum(barL) + jnp.sum(barU)) + nu * viol

    def step(state: IPState, p, lb, ub):
        x, s, yE, yI, zL, zU, mu, delta = (state.x, state.s, state.yE,
                                           state.yI, state.zL, state.zU,
                                           state.mu, state.delta)
        lbE = lb[eq_rows_j]
        lbI, ubI = lb[in_rows_j], ub[in_rows_j]

        gv = g(x, p)
        J = jac_g(x, p)
        JE = J[eq_rows_j] if mE else jnp.zeros((0, n_x), dtype=x.dtype)
        JI = J[in_rows_j]
        cE = gv[eq_rows_j] - lbE if mE else jnp.zeros((0,), dtype=x.dtype)
        rI = gv[in_rows_j] - s

        lam = jnp.zeros(m, dtype=x.dtype)
        lam = lam.at[eq_rows_j].set(yE) if mE else lam
        lam = lam.at[in_rows_j].set(yI)
        W = hess_L(x, p, lam)

        sL = jnp.where(has_lb_j, s - lbI, 1.0)
        sU = jnp.where(has_ub_j, ubI - s, 1.0)
        SigL = jnp.where(has_lb_j, zL / jnp.maximum(sL, 1e-12), 0.0)
        SigU = jnp.where(has_ub_j, zU / jnp.maximum(sU, 1e-12), 0.0)
        Sig = SigL + SigU

        r_x = grad_f(x, p) + (JE.T @ yE if mE else 0.0) + JI.T @ yI
        r_s = yI + zL - zU
        r_zL = jnp.where(has_lb_j, zL * sL - mu, 0.0)
        r_zU = jnp.where(has_ub_j, zU * sU - mu, 0.0)

        # condensed rhs (see derivation in repo docs): beta collects the
        # complementarity residuals through the slack equation
        beta = -r_s - jnp.where(has_lb_j, r_zL / jnp.maximum(sL, 1e-12), 0.0) \
            + jnp.where(has_ub_j, r_zU / jnp.maximum(sU, 1e-12), 0.0)
        rhs_x = -r_x - JI.T @ (Sig * rI - beta)

        # inertia correction: clamp the condensed Hessian to positive
        # definite via eigendecomposition (the batched-TPU analog of
        # Ipopt's delta_w inertia loop -- n is small, eigh is cheap and
        # guarantees a descent direction for the merit line search)
        H_raw = W + JI.T @ (Sig[:, None] * JI)
        H_raw = 0.5 * (H_raw + H_raw.T)
        evals, evecs = jnp.linalg.eigh(H_raw)
        eig_floor = jnp.maximum(opt.delta_w,
                                1e-8 * jnp.max(jnp.abs(evals))) + delta
        evals_pd = jnp.maximum(evals, eig_floor)
        H = (evecs * evals_pd[None, :]) @ evecs.T
        if mE:
            K = jnp.block([
                [H, JE.T],
                [JE, -opt.delta_c * jnp.eye(mE, dtype=x.dtype)]])
            rhs = jnp.concatenate([rhs_x, -cE])
            sol = jnp.linalg.solve(K, rhs)
            dx, dyE = sol[:n_x], sol[n_x:]
        else:
            sol = jnp.linalg.solve(H, rhs_x)
            dx, dyE = sol, jnp.zeros((0,), dtype=x.dtype)

        bad = jnp.logical_not(jnp.all(jnp.isfinite(sol)))
        dx = jnp.where(bad, 0.0, dx)
        dyE = jnp.where(bad, 0.0, dyE)

        ds = JI @ dx + rI
        dyI = Sig * ds - beta
        dzL = jnp.where(has_lb_j,
                        -(r_zL + zL * ds) / jnp.maximum(sL, 1e-12), 0.0)
        dzU = jnp.where(has_ub_j,
                        (-r_zU + zU * ds) / jnp.maximum(sU, 1e-12), 0.0)

        # ELEMENTWISE fraction-to-boundary: instead of one global steplength
        # (where a single pinned row freezes the whole primal step and
        # deadlocks the solve), each slack/dual is damped independently --
        # take the step, then project back to a tau-fraction of its old
        # distance to the boundary.  Robust for the degenerate
        # coefficient-wise constraint sets this transcription produces.
        tau = jnp.maximum(opt.tau_min, 1.0 - mu)

        def project_s(s_t):
            lo = jnp.where(has_lb_j, lbI + (1 - tau) * sL, -jnp.inf)
            hi = jnp.where(has_ub_j, ubI - (1 - tau) * sU, jnp.inf)
            return jnp.clip(s_t, lo, hi)

        def project_z(z_t, z_old, active):
            return jnp.where(active, jnp.maximum(z_t, (1 - tau) * z_old), 0.0)

        # parallel merit backtracking over fixed candidates; the violation
        # weight must dominate the multipliers for the merit to be exact
        nu = jnp.maximum(opt.nu_merit,
                         2.0 * jnp.maximum(
                             jnp.max(jnp.abs(yE), initial=0.0) if mE else 0.0,
                             jnp.max(jnp.abs(yI), initial=0.0)))
        cands = jnp.asarray(opt.ls_candidates, dtype=x.dtype)
        merits = jax.vmap(
            lambda a: merit(x + a * dx, project_s(s + a * ds), p, lb, ub,
                            mu, nu))(cands)
        merits = jnp.where(jnp.isfinite(merits), merits, jnp.inf)
        m0 = merit(x, s, p, lb, ub, mu, nu)
        # largest candidate that improves the merit; if none improves, reject
        # the step (alpha = 0) and raise the regularization
        improves = merits < m0
        first_improving = jnp.argmax(improves)  # candidates ordered large->small
        any_improves = jnp.any(improves)
        alpha = jnp.where(any_improves, cands[first_improving], 0.0)
        bad = bad | jnp.logical_not(any_improves)

        x_n = x + alpha * dx
        s_n = project_s(s + alpha * ds)
        yE_n = yE + alpha * dyE
        yI_n = yI + alpha * dyI
        zL_n = project_z(zL + alpha * dzL, zL, has_lb_j)
        zU_n = project_z(zU + alpha * dzU, zU, has_ub_j)
        # dual safeguard (Ipopt eq. 16): keep z in sync with mu/s
        sL_n = jnp.where(has_lb_j, jnp.maximum(s_n - lbI, 1e-12), 1.0)
        sU_n = jnp.where(has_ub_j, jnp.maximum(ubI - s_n, 1e-12), 1.0)
        zL_n = jnp.clip(zL_n, mu / (opt.kappa_sigma * sL_n),
                        opt.kappa_sigma * mu / sL_n)
        zL_n = jnp.where(has_lb_j, zL_n, 0.0)
        zU_n = jnp.clip(zU_n, mu / (opt.kappa_sigma * sU_n),
                        opt.kappa_sigma * mu / sU_n)
        zU_n = jnp.where(has_ub_j, zU_n, 0.0)
        # slack-form optimality fixes yI = zU - zL identically
        yI_n = zU_n - zL_n

        # KKT error at new point (mu = 0 target), with Ipopt's s_d/s_c
        # normalization so degenerate active sets (large multipliers from
        # redundant coefficient-wise rows) don't stall the barrier schedule
        gv_n = g(x_n, p)
        r_x_n = grad_f(x_n, p) + (JE.T @ yE_n if mE else 0.0) + JI.T @ yI_n
        s_max = 100.0
        dual_l1 = (jnp.sum(jnp.abs(yE_n)) if mE else 0.0) \
            + jnp.sum(jnp.abs(yI_n)) + jnp.sum(zL_n) + jnp.sum(zU_n)
        n_duals = mE + 3 * mI
        s_d = jnp.maximum(s_max, dual_l1 / max(n_duals, 1)) / s_max
        s_c = jnp.maximum(s_max, (jnp.sum(zL_n) + jnp.sum(zU_n))
                          / max(2 * mI, 1)) / s_max
        err_x = jnp.max(jnp.abs(r_x_n), initial=0.0) / s_d
        err_E = jnp.max(jnp.abs(gv_n[eq_rows_j] - lbE), initial=0.0) if mE else 0.0
        err_I = jnp.max(jnp.abs(gv_n[in_rows_j] - s_n), initial=0.0)
        comp = jnp.maximum(
            jnp.max(jnp.abs(jnp.where(has_lb_j, zL_n * sL_n, 0.0)), initial=0.0),
            jnp.max(jnp.abs(jnp.where(has_ub_j, zU_n * sU_n, 0.0)), initial=0.0)) / s_c
        err = jnp.maximum(jnp.maximum(err_x, jnp.maximum(err_E, err_I)), comp)

        # monotone barrier update: shrink when barrier-KKT error small
        comp_mu = jnp.maximum(
            jnp.max(jnp.abs(jnp.where(has_lb_j, zL_n * sL_n - mu, 0.0)), initial=0.0),
            jnp.max(jnp.abs(jnp.where(has_ub_j, zU_n * sU_n - mu, 0.0)), initial=0.0)) / s_c
        err_mu = jnp.maximum(jnp.maximum(err_x, jnp.maximum(err_E, err_I)),
                             comp_mu)
        if opt.mu_rule == "adaptive":
            comp_avg = (jnp.sum(jnp.where(has_lb_j, zL_n * sL_n, 0.0))
                        + jnp.sum(jnp.where(has_ub_j, zU_n * sU_n, 0.0))) \
                / n_barrier
            mu_n = jnp.clip(0.1 * comp_avg, opt.mu_min, opt.mu_init * 100)
        else:
            mu_n = jnp.where(err_mu < 10.0 * mu,
                             jnp.maximum(opt.mu_min,
                                         jnp.minimum(opt.mu_kappa * mu,
                                                     mu ** opt.mu_theta)),
                             mu)
        delta_n = jnp.where(bad, jnp.minimum(delta * 10.0, 1.0),
                            jnp.maximum(opt.delta_w, delta / 3.0))

        return IPState(x=x_n, s=s_n, yE=yE_n, yI=yI_n, zL=zL_n, zU=zU_n,
                       mu=mu_n, delta=delta_n, kkt_err=err,
                       n_iter=state.n_iter + 1)

    def solve(x0, p, lb, ub, state0: Optional[IPState] = None,
              max_iter: Optional[int] = None, reslack: bool = False):
        """Run the interior-point iteration.  All arguments may be batched
        via vmap.  Returns the final IPState.

        ``state0`` warm-starts the full primal-dual state; with
        ``reslack=True`` the slacks and bound duals are re-centered from
        g(x0) at a warm barrier value while keeping the equality
        multipliers (used after warm-start basis shifts that invalidate the
        slack correspondence)."""
        lb, ub = _scale_rt(jnp.asarray(lb), jnp.asarray(ub))
        n_it = opt.max_iter if max_iter is None else max_iter
        if state0 is None:
            state = init_state(x0, p, lb, ub)
        elif reslack:
            mu_warm = jnp.maximum(state0.mu, 1e-4)
            state = init_state(x0, p, lb, ub, mu0=mu_warm)._replace(
                yE=state0.yE)
        else:
            # problem data changed: stale convergence flags must not freeze
            # the new solve
            state = state0._replace(
                kkt_err=jnp.full_like(state0.kkt_err, jnp.inf),
                n_iter=jnp.zeros_like(state0.n_iter))

        def body(_, st):
            done = st.kkt_err < opt.tol
            new = step(st, p, lb, ub)
            # freeze converged problems
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(done, a, b), st, new)

        state = jax.lax.fori_loop(0, n_it, body, state)
        return state

    def diagnose(st: IPState, p, lb, ub):
        """Return the raw KKT-error components at a state (host debugging)."""
        lb, ub = _scale_rt(jnp.asarray(lb), jnp.asarray(ub))
        x, s = st.x, st.s
        gv = g(x, p)
        J = jac_g(x, p)
        JE = J[eq_rows_j] if mE else jnp.zeros((0, n_x))
        JI = J[in_rows_j]
        lbI, ubI = lb[in_rows_j], ub[in_rows_j]
        r_x = grad_f(x, p) + (JE.T @ st.yE if mE else 0.0) + JI.T @ st.yI
        sL = jnp.where(has_lb_j, jnp.maximum(s - lbI, 1e-12), 1.0)
        sU = jnp.where(has_ub_j, jnp.maximum(ubI - s, 1e-12), 1.0)
        out = {
            "err_x": float(jnp.max(jnp.abs(r_x), initial=0.0)),
            "err_E": float(jnp.max(jnp.abs(gv[eq_rows_j] - lb[eq_rows_j]),
                                   initial=0.0)) if mE else 0.0,
            "err_I": float(jnp.max(jnp.abs(gv[in_rows_j] - s), initial=0.0)),
            "comp": float(jnp.maximum(
                jnp.max(jnp.where(has_lb_j, st.zL * sL, 0.0), initial=0.0),
                jnp.max(jnp.where(has_ub_j, st.zU * sU, 0.0), initial=0.0))),
            "mu": float(st.mu),
        }
        out["row_err_I"] = np.asarray(jnp.abs(gv[in_rows_j] - s))
        return out

    solve.diagnose = diagnose
    # exposed internals (bounds are auto-scaled like in solve())
    solve.init_state = lambda x0, p, lb, ub: init_state(
        x0, p, *_scale_rt(jnp.asarray(lb), jnp.asarray(ub)))
    solve.step = lambda st, p, lb, ub: step(
        st, p, *_scale_rt(jnp.asarray(lb), jnp.asarray(ub)))
    solve.masks = dict(eq_rows=eq_rows, in_rows=in_rows,
                       has_lb=has_lb, has_ub=has_ub)
    return solve
