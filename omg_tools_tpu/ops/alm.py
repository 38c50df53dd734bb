"""Batched augmented-Lagrangian (PHR) NLP solver.

The primary solver backend replacing CasADi+Ipopt (the interior-point
backend in ops/solver.py is kept as an alternative).  Method:

- constraints lb <= g(x,p) <= ub handled by the Powell-Hestenes-Rockafellar
  augmented Lagrangian:  with r = g + lam/rho and P = proj(r, [lb, ub]),
      L(x) = f(x) + rho/2 * || r - P ||^2  - ||lam||^2/(2 rho)
  whose gradient is  grad f + J^T y_hat,  y_hat = rho * (r - P)
  (y_hat is the first-order multiplier estimate; equality rows lb == ub
  reduce to the classic  lam + rho * c(x));
- inner minimization by semismooth Newton:  H = W(y_hat) + rho J^T D J
  (W = exact Hessian of f + y_hat.g via JAX AD, D = active-row mask),
  eigenvalue-clamped to positive definite, dense batched solve, parallel
  Armijo backtracking on the smooth merit L;
- outer updates:  lam <- y_hat;  rho grows when feasibility stalls;
- everything is branch-free (masked updates), jit-compiled, vmap-batched,
  and warm-starts across MPC steps via (x, lam, rho).

Row/objective scaling mirrors Ipopt's gradient-based scheme
(ops/solver.gradient_row_scales).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .solver import BIG, gradient_row_scales
from .pallas_kernels import psd_solve, psd_solve_multi

__all__ = ["ALMState", "ALMOptions", "make_alm_solver"]


class ALMOptions(NamedTuple):
    outer_iter: int = 20
    # 16 inner Newton steps per outer round: enough to actually minimize
    # each AL subproblem (8 leaves free-T problems stationarity-stalled at
    # the full n_outer*inner budget; 16 converges and exits EARLY, so the
    # total cost stays at the old 320-iteration cap).  Warm-started device
    # rollouts override this per phase.
    inner_iter: int = 16
    tol: float = 1e-3          # stationarity tolerance (scaled space)
    feas_tol: float = 1e-5     # feasibility tolerance (scaled space)
    # moderate initial penalty: rho 100 makes truncated inner Newton stall
    # on the AL subproblem (cold solves exhaust the budget ~2% above the
    # optimum); rho 10 converges to the reference optimum within the same
    # budget and grows on stall anyway
    rho_init: float = 10.0
    rho_growth: float = 5.0
    rho_max: float = 1e4
    feas_decrease: float = 0.25  # required violation decrease per outer iter
    delta: float = 1e-8        # Hessian floor
    ls_candidates: tuple = (1.0, 0.5, 0.25, 0.1, 0.04, 0.015, 6e-3, 2.5e-3,
                            1e-3, 4e-4, 1.5e-4)
    armijo: float = 1e-4
    max_step: float = 10.0     # trust cap on ||dx||_inf
    eig_floor_rel: float = 1e-8  # relative eigenvalue floor (conditioning cap)
    hessian: str = "gn"        # 'gn' (Gauss-Newton + Cholesky; default, TPU-fast) or
    #                            'eigh' (saddle-free exact Newton; more robust on CPU)
    gn_delta_rel: float = 1e-6  # GN ridge relative to the penalty scale


class ALMState(NamedTuple):
    x: jax.Array        # (n,)
    lam: jax.Array      # (m,) multiplier estimates
    rho: jax.Array      # () penalty parameter
    feas: jax.Array     # () constraint violation (inf-norm, scaled)
    stat: jax.Array     # () stationarity residual (inf-norm, scaled)
    n_iter: jax.Array   # () total inner iterations applied
    feas_raw: Optional[jax.Array] = None  # () violation in RAW units

    @property
    def kkt_err(self):  # drop-in compatibility with IPState consumers
        return jnp.maximum(self.feas, self.stat)


def detect_quadratic_structure(g, n_x, p_ref, x_probe=None, tol=1e-6,
                               f=None, frozen_idx=None):
    """If g(x, p) = c(p) + A(p) x + x^T Q(p_frozen) x with Q constant over
    the parameters that actually VARY at runtime, return Q as an (m, n, n)
    numpy tensor; else None.  Validated against a direct evaluation at a
    random probe point.

    ``frozen_idx``: parameter indices that are structurally constant during
    a rollout (e.g. the FixedT horizon 'T', which multiplies quadratic
    terms like T*zz^2 in the quadrotor rate bounds) -- the probe does not
    perturb them, so Q evaluated at their reference values validates."""
    import jax

    p_ref = jnp.asarray(p_ref)
    zero = jnp.zeros(n_x, dtype=p_ref.dtype)
    # Hessian wrt x at (0, p_ref): rows of Q (forward-over-forward)
    Q = np.asarray(jax.jacfwd(jax.jacfwd(g))(zero, p_ref)) * 0.5
    rng = np.random.default_rng(0)
    x_probe = rng.standard_normal(n_x) if x_probe is None else x_probe
    x_probe = jnp.asarray(x_probe, dtype=p_ref.dtype)
    noise = rng.standard_normal(p_ref.shape[0]) * 0.1
    if frozen_idx is not None and len(frozen_idx):
        noise[np.asarray(frozen_idx)] = 0.0
    p_probe = p_ref + jnp.asarray(noise, dtype=p_ref.dtype)
    c = g(zero, p_probe)
    A_x = jax.jvp(lambda x: g(x, p_probe), (zero,), (x_probe,))[1]
    pred = c + A_x + jnp.einsum("kij,i,j->k", jnp.asarray(Q), x_probe,
                                x_probe)
    direct = g(x_probe, p_probe)
    err = float(jnp.max(jnp.abs(pred - direct)))
    scale = float(jnp.max(jnp.abs(direct))) + 1.0
    if err > tol * scale:
        return None
    if f is not None:
        # the fast path also assumes a linear objective
        g0 = jax.grad(f)(zero, p_probe)
        g1 = jax.grad(f)(x_probe, p_probe)
        if float(jnp.max(jnp.abs(g1 - g0))) > tol * (
                float(jnp.max(jnp.abs(g0))) + 1.0):
            return None
    return Q


def make_alm_solver(f: Callable, g: Callable, n_x: int,
                    lb0: np.ndarray, ub0: np.ndarray,
                    options: ALMOptions = ALMOptions(),
                    row_scale: Optional[np.ndarray] = None,
                    obj_scale: float = 1.0,
                    quadratic_Q: Optional[np.ndarray] = None,
                    compact=None, fused_plan=None):
    """Build ``solve(x0, p, lb, ub, state0=None)`` minimizing f s.t.
    lb <= g <= ub.  All runtime arguments may be vmap-batched.

    ``quadratic_Q``: constant (m, n, n) tensor from
    :func:`detect_quadratic_structure`.  When given, the inner loop uses the
    closed quadratic form -- constraint values and Jacobians become three
    large einsums with AD only once per solve (the TPU hot path).

    ``compact``: an :class:`ops.compact.CompactStructure`.  Callers then
    pass the phase-resolved tensors as ``solve(..., ct=...)`` (from
    :func:`ops.compact.resolve_phase`) and the inner iteration runs
    family-compacted: sparse row supports become small dense einsums with
    slice assembly -- ~25x fewer FLOPs than the dense quadratic form at
    bench sizes.  Row scaling is baked into the compact tensors; runtime
    lb/ub are scaled and PERMUTED into the compact row order internally.

    ``fused_plan``: an :class:`ops.fused_alm.FusedPlan` (requires
    ``compact`` with a detected arrow).  Callers pass phase-resolved SHARED
    tensors as ``solve(..., fshared=FusedPlan.slice_phase(shared, phase))``
    and the whole inner Newton loop runs as ONE Pallas kernel per outer
    round on TPU backends (per-lane parameters resolved in-kernel; see
    ops/fused_alm.py).  Non-TPU/f64 callers transparently fall back to the
    XLA compact path."""
    lb0 = np.asarray(lb0, dtype=np.float64)
    ub0 = np.asarray(ub0, dtype=np.float64)
    m = lb0.shape[0]
    opt = options

    row_perm = None if compact is None else np.asarray(compact.row_perm)

    inv_d_np = None
    if row_scale is not None:
        d_np = np.asarray(row_scale, dtype=np.float64)
        inv_d_np = 1.0 / d_np if row_perm is None else 1.0 / d_np[row_perm]
        f_raw, g_raw = f, g

        def f(x, p):
            return jnp.asarray(obj_scale, dtype=x.dtype) * f_raw(x, p)

        def g(x, p):
            return jnp.asarray(d_np, dtype=x.dtype) * g_raw(x, p)

        def _scale_rt(lb, ub):
            d = jnp.asarray(d_np, dtype=lb.dtype)
            lb = jnp.where(lb > -BIG / 2, d * lb, lb)
            ub = jnp.where(ub < BIG / 2, d * ub, ub)
            if row_perm is not None:
                lb = lb[row_perm]
                ub = ub[row_perm]
            return lb, ub
    else:
        def _scale_rt(lb, ub):
            if row_perm is not None:
                return lb[row_perm], ub[row_perm]
            return lb, ub

    grad_f = jax.grad(f)
    hess_f = jax.hessian(f)
    jac_g = jax.jacfwd(g)

    Qs_np = None
    _Qs_cache = {}
    if quadratic_Q is not None:
        Qs_np = np.asarray(quadratic_Q, dtype=np.float64)
        if row_scale is not None:
            Qs_np = Qs_np * d_np[:, None, None]

    def _Qs(dtype):
        """Device-resident Q (hoisted jit argument, NOT an inlined HLO
        constant -- inlining ~100MB literals breaks remote compilation)."""
        if dtype not in _Qs_cache:
            _Qs_cache[dtype] = jnp.asarray(Qs_np, dtype=dtype)
        return _Qs_cache[dtype]

    if Qs_np is not None:
        # materialize eagerly (outside any trace) so the tensor is a device
        # buffer, never a traced literal
        _Qs(jnp.dtype(jnp.float32))
        try:
            if jax.config.jax_enable_x64:
                _Qs(jnp.dtype(jnp.float64))
        except Exception:
            pass

    def lagrangian(x, p, lam):
        return f(x, p) + g(x, p) @ lam

    hess_L = jax.hessian(lagrangian)

    def multiplier_estimate(gv, lam, rho, lb, ub):
        r = gv + lam / rho
        proj = jnp.clip(r, lb, ub)
        return rho * (r - proj)

    def violation(gv, lb, ub):
        return jnp.max(jnp.maximum(lb - gv, 0.0)
                       + jnp.maximum(gv - ub, 0.0), initial=0.0)

    def make_evals_compact(ct):
        """Family-compacted evaluator (see ops/compact.py): same protocol
        keys plus a ``work`` handle for grad/Hessian assembly."""
        from .compact import CompactWork
        work = CompactWork(compact, ct)
        return dict(quadratic=True, mode="compact", work=work,
                    g=work.g, f=work.f, gf=work.gf)

    def make_evals(p, dtype, cA=None, Q=None):
        """Per-solve evaluation handles.  In quadratic mode
        (g = c + A x + x^T Q x with constant Q) AD runs once per solve at
        x = 0 and the whole inner iteration is a handful of large
        matmuls/einsums; the line search costs one extra matvec because the
        merit is exactly quadratic along the step direction.

        ``cA``: optional externally-precomputed (c, A, f0, gf) in RAW
        (unscaled) units -- e.g. from the batched rollout's per-phase affine
        tensors -- eliminating even the once-per-solve AD.

        ``Q``: the quadratic tensor passed as a RUNTIME argument.  When the
        solve is jitted for a remote backend the tensor must enter as a jit
        argument, not a closure constant -- closure constants are inlined
        into the HLO payload and can exceed the remote-compile size limit."""
        if Qs_np is not None:
            if cA is not None:
                c_raw, A_raw, f0_raw, gf_raw = cA
                if row_scale is not None:
                    d = jnp.asarray(d_np, dtype=dtype)
                    cC = d * c_raw
                    A = d[:, None] * A_raw
                    f0 = obj_scale * f0_raw
                    gf = obj_scale * gf_raw
                else:
                    cC, A, f0, gf = c_raw, A_raw, f0_raw, gf_raw
            else:
                zero = jnp.zeros(n_x, dtype=dtype)
                cC = g(zero, p)
                A = jac_g(zero, p)
                f0 = f(zero, p)
                gf = grad_f(zero, p)   # objective is linear in x
            # runtime-provided Q must be the SCALED tensor (solve.Q_scaled)
            Qs = _Qs(dtype) if Q is None else Q

            def J_eval(x):
                return A + 2.0 * jnp.einsum("kij,j->ki", Qs, x)

            def g_from_J(x, J):
                # g(x) = c + A x + x^T Q x = c + 0.5 (A + J(x)) x
                return cC + 0.5 * ((A + J) @ x)

            def quad_dir(d):
                return jnp.einsum("kij,i,j->k", Qs, d, d)

            def f_eval(x):
                return f0 + gf @ x

            def gf_eval(x):
                return gf

            def g_eval(x):
                return g_from_J(x, J_eval(x))

            return dict(quadratic=True, g=g_eval, J=J_eval,
                        g_from_J=g_from_J, quad_dir=quad_dir, f=f_eval,
                        gf=gf_eval, Qs=Qs)
        return dict(quadratic=False,
                    g=lambda x: g(x, p),
                    J=lambda x: jac_g(x, p),
                    f=lambda x: f(x, p),
                    gf=lambda x: grad_f(x, p),
                    Hf=lambda x: hess_f(x, p))

    def penalty_term(gv, lam, rho, lb, ub):
        r = gv + lam / rho
        proj = jnp.clip(r, lb, ub)
        return 0.5 * rho * jnp.sum((r - proj) ** 2)

    def arrow_newton_step(work, Jf, y_hat, active, rho):
        """Block-arrow Newton solve (ops/compact.detect_arrow): factor each
        tail block with the multi-RHS lane kernel, Schur-complement onto the
        head, solve the head system, back-substitute.  ~20x fewer
        factorization flops than the dense (n, n) Cholesky at bench sizes,
        and the Schur products ride the MXU."""
        S, D, C, r_h, r_b = work.arrow_system(Jf, y_hat, active, rho)
        h = S.shape[0]
        dt = S.dtype
        diag_max = jnp.maximum(
            jnp.max(jnp.abs(jnp.diagonal(S))),
            jnp.max(jnp.abs(jnp.diagonal(D, axis1=1, axis2=2))))
        ridge = opt.gn_delta_rel * jnp.maximum(diag_max, 1.0) + opt.delta
        S = S + ridge * jnp.eye(h, dtype=dt)
        D = D + ridge * jnp.eye(D.shape[1], dtype=dt)[None]
        # W = D^-1 [C' | r_b]  -- one multi-RHS solve over all tail blocks
        RHS = jnp.concatenate([jnp.swapaxes(C, 1, 2), r_b[:, :, None]],
                              axis=2)                     # (k, b, h+1)
        W = psd_solve_multi(D, RHS)                       # (k, b, h+1)
        WC = W[:, :, :h]                                  # D^-1 C'
        wr = W[:, :, h]                                   # D^-1 r_b
        S_t = S - jnp.einsum("khb,kbg->hg", C, WC)
        r_t = r_h - jnp.einsum("khb,kb->h", C, wr)
        dx_h = psd_solve(S_t, r_t)
        dx_b = wr - jnp.einsum("kbh,h->kb", WC, dx_h)
        grad = work.arrow_scatter(r_h, r_b)
        dx = -work.arrow_scatter(dx_h, dx_b)
        return grad, dx

    def inner_step_compact(evals, x, lam, rho, lb, ub):
        """Compact-mode Newton step: per-family small einsums + slice
        assembly; the merit expansion along dx is exact (quadratic g)."""
        work = evals["work"]
        Jf = work.jacobians(x)
        gv = work.g_from_J(x, Jf)
        y_hat = multiplier_estimate(gv, lam, rho, lb, ub)
        active = (jnp.abs(y_hat) > 0.0).astype(x.dtype)
        if compact is not None and compact.arrow is not None:
            grad, dx = arrow_newton_step(work, Jf, y_hat, active, rho)
        else:
            grad = work.grad(Jf, y_hat)
            H0 = work.hessian(Jf, active, rho, 0.0)
            scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(H0))), 1.0)
            H = H0 + (opt.gn_delta_rel * scale + opt.delta) \
                * jnp.eye(n_x, dtype=x.dtype)
            dx = -psd_solve(H, grad)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, -grad
                       / jnp.maximum(jnp.linalg.norm(grad), 1.0))
        dx_norm = jnp.max(jnp.abs(dx), initial=0.0)
        dx = dx * jnp.minimum(1.0, opt.max_step / jnp.maximum(dx_norm, 1e-12))
        slope = grad @ dx
        cands = jnp.asarray(opt.ls_candidates, dtype=x.dtype)
        m0 = work.f(x) + penalty_term(gv, lam, rho, lb, ub)
        Jd = work.Jd(Jf, dx)
        qd = work.quad_dir(dx)
        df = work.gf(x) @ dx

        def merit_at(a):
            return (work.f(x) + a * df
                    + penalty_term(gv + a * Jd + (a * a) * qd,
                                   lam, rho, lb, ub))

        mvals = jax.vmap(merit_at)(cands)
        ok = jnp.isfinite(mvals) & (mvals <= m0 + opt.armijo * cands * slope)
        pick = jnp.argmax(ok)
        alpha = jnp.where(jnp.any(ok), cands[pick], 0.0)
        return x + alpha * dx, jnp.max(jnp.abs(grad), initial=0.0)

    def inner_step(evals, p, x, lam, rho, lb, ub):
        if evals.get("mode") == "compact":
            return inner_step_compact(evals, x, lam, rho, lb, ub)
        J = evals["J"](x)
        gv = evals["g_from_J"](x, J) if evals["quadratic"] else evals["g"](x)
        y_hat = multiplier_estimate(gv, lam, rho, lb, ub)
        grad = evals["gf"](x) + J.T @ y_hat
        active = (jnp.abs(y_hat) > 0.0).astype(x.dtype)
        Hpen = rho * (J.T * active[None, :]) @ J
        if opt.hessian == "gn":
            # Gauss-Newton: penalty curvature + the OBJECTIVE's own Hessian.
            # Spline p2p transcriptions have linear objectives (Hf = 0), but
            # ADMM local problems carry a convex quadratic (rho/2 ||s-z||^2)
            # whose curvature GN must see -- without it the f32 x-update
            # stalls at O(100) stationarity and the fleet consensus
            # plateaus.  A ridge keeps the Cholesky well-posed.  No
            # eigendecomposition -- this is the TPU hot path (batched
            # Cholesky rides the MXU).
            if not evals["quadratic"] and "Hf" in evals:
                Hpen = Hpen + evals["Hf"](x)
            scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(Hpen))), 1.0)
            H = Hpen + (opt.gn_delta_rel * scale + opt.delta) \
                * jnp.eye(n_x, dtype=x.dtype)
            # psd_solve: XLA Cholesky unbatched; under vmap on TPU it
            # dispatches to the Pallas lane-batched kernel (the hot path --
            # XLA's batched small-matrix Cholesky is ~50x slower here)
            dx = -psd_solve(H, grad)
        else:
            if Qs_np is not None:
                W = 2.0 * jnp.einsum("kij,k->ij", evals["Qs"], y_hat)
            else:
                W = hess_L(x, p, y_hat)
            H = W + Hpen
            H = 0.5 * (H + H.T)
            evals_, evecs = jnp.linalg.eigh(H)
            # saddle-free Newton in the eigenbasis: negative-curvature
            # directions use |lambda| (sensible descent scale) instead of
            # being clamped to a tiny floor (which would let them dominate
            # dx); the relative floor bounds the conditioning
            floor = jnp.maximum(opt.delta,
                                opt.eig_floor_rel * jnp.max(jnp.abs(evals_)))
            ev_used = jnp.maximum(jnp.abs(evals_), floor)
            dx = -(evecs @ ((evecs.T @ grad) / ev_used))
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, -grad
                       / jnp.maximum(jnp.linalg.norm(grad), 1.0))
        # trust cap: keeps the polynomial merit terms in the line-search range
        dx_norm = jnp.max(jnp.abs(dx), initial=0.0)
        dx = dx * jnp.minimum(1.0, opt.max_step / jnp.maximum(dx_norm, 1e-12))
        # parallel Armijo backtracking on the smooth merit
        slope = grad @ dx
        cands = jnp.asarray(opt.ls_candidates, dtype=x.dtype)
        m0 = evals["f"](x) + penalty_term(gv, lam, rho, lb, ub)
        if evals["quadratic"]:
            # exact directional expansion: g(x + a d) = gv + a J d + a^2 d'Qd
            Jd = J @ dx
            qd = evals["quad_dir"](dx)
            df = (evals["gf"](x) @ dx)

            def merit_at(a):
                return (evals["f"](x) + a * df
                        + penalty_term(gv + a * Jd + (a * a) * qd,
                                       lam, rho, lb, ub))
        else:
            def merit_at(a):
                xa = x + a * dx
                return evals["f"](xa) + penalty_term(evals["g"](xa),
                                                     lam, rho, lb, ub)
        mvals = jax.vmap(merit_at)(cands)
        ok = jnp.isfinite(mvals) & (mvals <= m0 + opt.armijo * cands * slope)
        pick = jnp.argmax(ok)          # first (largest) acceptable candidate
        alpha = jnp.where(jnp.any(ok), cands[pick], 0.0)
        x_n = x + alpha * dx
        return x_n, jnp.max(jnp.abs(grad), initial=0.0)

    # -- fused Pallas inner loop (ops/fused_alm.py) -------------------------
    fused_inner = None
    _fused_pcols = None
    if fused_plan is not None:
        import os as _os
        from .fused_alm import make_fused_kernel
        from .pallas_kernels import _is_tpu_backend
        _fused_pcols = np.asarray(fused_plan.pcols)
        _kern_cache = {}

        def _get_kernel(interpret):
            key = bool(interpret)
            if key not in _kern_cache:
                _kern_cache[key] = make_fused_kernel(
                    fused_plan, opt, opt.inner_iter, interpret=key)
            return _kern_cache[key]

        def _fused_ct(shared, pv):
            """Rebuild the resolve_phase-style per-scenario tensors from the
            fused shared tables (XLA fallback path; matches
            ops/compact.resolve_phase numerically)."""
            ph = shared["ph"]
            Af, Qf3 = [], []
            for fp in fused_plan.fams:
                A = ph["uA"][fp.iA]
                if fp.iTA >= 0:
                    pq = jnp.stack([pv[q] for q in fp.qpos])
                    A = A + ph["uTA"][fp.iTA] @ pq
                Af.append(A)
                if fp.iQ >= 0:
                    qf = shared["q"][fp.iQ]
                    m_f = fp.row_stop - fp.row_start
                    Qf3.append(qf.reshape(m_f, qf.shape[1], qf.shape[1]))
                else:
                    Qf3.append(None)
            c = ph["c0"] + ph["C1"] @ pv
            return {"c": c, "f0": ph["f0"], "gf": ph["gf"],
                    "Af": tuple(Af), "Qf": tuple(Qf3)}

        def _fused_unbatched(shared, x, lam, rho, pv, lb, ub):
            evals = make_evals_compact(_fused_ct(shared, pv))

            def ib(i, carry):
                xx, _ = carry
                return inner_step(evals, None, xx, lam, rho, lb, ub)

            x_n, stat = jax.lax.fori_loop(
                0, opt.inner_iter, ib,
                (x, jnp.asarray(jnp.inf, dtype=x.dtype) + x[..., 0] * 0))
            gv = evals["g"](x_n)
            return x_n, gv, stat

        @jax.custom_batching.custom_vmap
        def fused_inner(shared, x, lam, rho, pv, lb, ub):
            return _fused_unbatched(shared, x, lam, rho, pv, lb, ub)

        @fused_inner.def_vmap
        def _fused_vmap_rule(axis_size, in_batched, shared, x, lam, rho,
                             pv, lb, ub):
            sh_b = any(jax.tree_util.tree_leaves(in_batched[0]))
            x_b, lam_b, rho_b, pv_b, lb_b, ub_b = in_batched[1:]
            force_interp = _os.environ.get("OMG_FUSED_INTERPRET",
                                           "0") == "1"
            usable = ((not sh_b) and (not lb_b) and (not ub_b)
                      and (x.dtype == jnp.float32 or force_interp)
                      and (_is_tpu_backend() or force_interp))
            B = axis_size

            def bcast(v, batched):
                return v if batched else jnp.broadcast_to(
                    v, (B,) + jnp.shape(v))

            x = bcast(x, x_b)
            lam = bcast(lam, lam_b)
            rho = bcast(rho, rho_b)
            pv = bcast(pv, pv_b)
            if not usable:
                sh_axes = jax.tree_util.tree_map(
                    lambda b: 0 if b else None, in_batched[0])
                out = jax.vmap(_fused_unbatched,
                               in_axes=(sh_axes, 0, 0, 0, 0,
                                        0 if lb_b else None,
                                        0 if ub_b else None))(
                    shared, x, lam, rho, pv, lb, ub)
                return out, (True, True, True)
            Bp = -(-B // 128) * 128

            def pad(v):
                if Bp == B:
                    return v
                return jnp.concatenate(
                    [v, jnp.broadcast_to(v[-1:], (Bp - B,) + v.shape[1:])],
                    axis=0)

            kfn = _get_kernel(force_interp and not _is_tpu_backend())
            x_nT, gvT, statT = kfn(shared, pad(x).T, pad(lam).T,
                                   pad(rho).reshape(Bp, 1).T, pad(pv).T,
                                   lb, ub)
            return (x_nT.T[:B], gvT.T[:B], statT.reshape(-1)[:B]), \
                (True, True, True)

    def solve(x0, p, lb, ub, state0: Optional[ALMState] = None,
              outer_iter: Optional[int] = None, cA=None, Q=None, ct=None,
              fshared=None):
        # TPU: full-f32 matmuls (the default bf16-multiply path destroys
        # Jacobian/Cholesky accuracy for these ill-conditioned systems)
        with jax.default_matmul_precision("highest"):
            return _solve(x0, p, lb, ub, state0, outer_iter, cA, Q, ct,
                          fshared)

    def _solve(x0, p, lb, ub, state0, outer_iter, cA=None, Q=None, ct=None,
               fshared=None):
        lb, ub = _scale_rt(jnp.asarray(lb), jnp.asarray(ub))
        x0 = jnp.asarray(x0)
        dtype = x0.dtype
        # tie scalar carries to x0 so device-varying inputs stay varying
        # under shard_map (zero0 == 0, but carries x0's sharding context)
        zero0 = x0[..., 0] * 0
        if state0 is None:
            state = ALMState(x=x0,
                             lam=jnp.zeros(m, dtype=dtype) + zero0,
                             rho=jnp.asarray(opt.rho_init, dtype=dtype)
                             + zero0,
                             feas=jnp.asarray(jnp.inf, dtype=dtype) + zero0,
                             stat=jnp.asarray(jnp.inf, dtype=dtype) + zero0,
                             n_iter=jnp.asarray(0) + zero0.astype(jnp.int32),
                             feas_raw=jnp.asarray(jnp.inf, dtype=dtype)
                             + zero0)
        else:
            inf0 = jnp.full_like(state0.feas, jnp.inf) + zero0
            state = state0._replace(x=x0, feas=inf0, stat=inf0,
                                    n_iter=jnp.zeros_like(state0.n_iter)
                                    + zero0.astype(state0.n_iter.dtype),
                                    feas_raw=inf0)

        n_outer = opt.outer_iter if outer_iter is None else outer_iter
        use_fused = fshared is not None and fused_inner is not None
        if use_fused:
            evals = None
            pv = p[jnp.asarray(_fused_pcols)]
        elif ct is not None:
            evals = make_evals_compact(ct)
        else:
            evals = make_evals(jnp.asarray(p), dtype, cA=cA, Q=Q)
        # dtype-aware feasibility floor: in f32 the configured tolerance
        # sits below the roundoff of the scaled constraint evaluation (rows
        # up to O(100) x eps 1.2e-7); without the floor every outer round
        # reads "no improvement" and rho ratchets to rho_max, wrecking the
        # Newton conditioning (f32 stationarity 12 -> 4e-2 with the floor)
        feas_tol = jnp.maximum(opt.feas_tol, 1000.0 * jnp.finfo(dtype).eps)

        def outer_body(st):
            if use_fused:
                x_n, gv, stat = fused_inner(fshared, st.x, st.lam, st.rho,
                                            pv, lb, ub)
            else:
                def inner_body(_, carry):
                    x, stat_ = carry
                    x_n_, gnorm = inner_step(evals, p, x, st.lam, st.rho,
                                             lb, ub)
                    return (x_n_, gnorm)

                x_n, stat = jax.lax.fori_loop(
                    0, opt.inner_iter, inner_body,
                    (st.x, jnp.asarray(jnp.inf, dtype=st.x.dtype)
                     + st.x[..., 0] * 0))
                gv = evals["g"](x_n)
            y_hat = multiplier_estimate(gv, st.lam, st.rho, lb, ub)
            viol_rows = jnp.maximum(lb - gv, 0.0) + jnp.maximum(gv - ub, 0.0)
            feas_n = jnp.max(viol_rows, initial=0.0)
            # raw-unit (unscaled) violation: the honest feasibility number
            # reported by the bench / compared against the reference solver
            if inv_d_np is not None:
                feas_raw_n = jnp.max(
                    viol_rows * jnp.asarray(inv_d_np, dtype=gv.dtype),
                    initial=0.0)
            else:
                feas_raw_n = feas_n
            # multiplier update every outer round; penalty grows only when
            # feasibility stalls (gating the lam update as well -- LANCELOT
            # style -- proved harmful with truncated inner solves)
            improved = feas_n <= jnp.maximum(
                opt.feas_decrease * jnp.minimum(st.feas, 1e6), feas_tol)
            lam_n = y_hat
            rho_n = jnp.where(improved, st.rho,
                              jnp.minimum(st.rho * opt.rho_growth,
                                          opt.rho_max))
            return ALMState(x=x_n, lam=lam_n, rho=rho_n, feas=feas_n,
                            stat=stat, n_iter=st.n_iter + opt.inner_iter,
                            feas_raw=feas_raw_n)

        def cond(st):
            done = (st.feas < feas_tol) & (st.stat < opt.tol)
            return jnp.logical_not(done) & (st.n_iter
                                            < n_outer * opt.inner_iter)

        # while_loop: converged (batched: all-converged) solves exit early
        state = jax.lax.while_loop(cond, outer_body, state)
        return state

    def diagnose(st: ALMState, p, lb, ub):
        lb, ub = _scale_rt(jnp.asarray(lb), jnp.asarray(ub))
        gv = g(st.x, p)
        y_hat = multiplier_estimate(gv, st.lam, st.rho, lb, ub)
        grad = grad_f(st.x, p) + jac_g(st.x, p).T @ y_hat
        return {"feas": float(violation(gv, lb, ub)),
                "stat": float(jnp.max(jnp.abs(grad), initial=0.0)),
                "rho": float(st.rho),
                "row_viol": np.asarray(jnp.maximum(lb - gv, 0.0)
                                       + jnp.maximum(gv - ub, 0.0))}

    solve.diagnose = diagnose
    # the SCALED quadratic tensor (numpy): callers jitting for a remote
    # backend fetch this, device_put it once, and pass it back as solve's Q
    # argument so it enters the HLO as a parameter, not an inlined literal
    solve.Q_scaled = Qs_np
    return solve
