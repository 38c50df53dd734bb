"""Independent CPU reference NLP solver (the parity trust anchor).

The reference framework's numerical trust anchor is the CasADi+Ipopt solve
(/root/reference/omgtools/problems/problem.py:113).  CasADi/Ipopt are not
available in this environment, so the role is filled by scipy's SLSQP --
an independent, mature SQP implementation -- solving the *same* transcribed
NLP (identical objective/constraint functions, bounds and parameters) in
float64 on the host CPU.  The ALM/IPM TPU solvers are validated against it:
closed-loop control sequences must match within tolerance at the 10 Hz
regime (BASELINE.md "trajectory parity" target; see tools/parity.py and
tests/test_parity.py).

The solver exposes the same ``solve(x0, p, lb, ub, state0=None)`` protocol
as ops/alm.py / ops/solver.py so it can be dropped into Problem as the
``"scipy"`` backend.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np

from .solver import BIG

__all__ = ["RefState", "make_ref_solver"]


class RefState(NamedTuple):
    x: np.ndarray       # (n,)
    feas: np.ndarray    # () raw-unit constraint violation (inf-norm)
    stat: np.ndarray    # () scipy-reported optimality (0 if unavailable)
    n_iter: np.ndarray  # () iterations

    @property
    def kkt_err(self):
        return np.maximum(self.feas, self.stat)


def make_ref_solver(f: Callable, g: Callable, n_x: int,
                    lb0: np.ndarray, ub0: np.ndarray,
                    tol: float = 1e-7, max_iter: int = 300):
    """Build the reference solve function.  ``f(x, p)`` / ``g(x, p)`` are the
    transcription's jax functions; they are jit-compiled for the host CPU
    and wrapped for scipy.  Runtime ``lb/ub`` may differ from ``lb0/ub0``
    (constraint shutdown masking), so the eq/ineq split happens per call."""
    import jax
    from ..utils.devices import host_device

    dev = host_device()

    def _jit(fn):
        """Host-CPU jit forced to FLOAT64 regardless of the session's x64
        flag.  The bench session runs f32; without this the 'reference'
        SLSQP gets f32-evaluated objectives/Jacobians -- harmless for the
        holonomic QP but catastrophically divergent on ill-conditioned
        NLPs (Dubins tan-half-angle cubics exploded to 1e17)."""
        jf = jax.jit(fn, device=dev) if dev is not None else jax.jit(fn)

        def call(*args):
            with jax.enable_x64():
                return jf(*[np.asarray(a, dtype=np.float64) for a in args])
        return call

    f_j = _jit(f)
    gradf_j = _jit(jax.grad(f))
    g_j = _jit(g)
    jacg_j = _jit(jax.jacfwd(g))

    def solve(x0, p, lb, ub, state0: Optional[RefState] = None,
              outer_iter=None, **_ignored):
        from scipy.optimize import minimize

        x0 = np.asarray(x0, dtype=np.float64).copy()
        p = np.asarray(p, dtype=np.float64)
        lb = np.asarray(lb, dtype=np.float64)
        ub = np.asarray(ub, dtype=np.float64)
        eq = np.abs(ub - lb) < 1e-14
        has_lb = (~eq) & (lb > -BIG / 2)
        has_ub = (~eq) & (ub < BIG / 2)

        # one (g, J) evaluation shared across scipy's per-constraint calls
        memo = {"x": None, "g": None, "J": None}

        def _eval(x):
            if memo["x"] is None or not np.array_equal(memo["x"], x):
                memo["x"] = x.copy()
                memo["g"] = np.asarray(g_j(x, p), dtype=np.float64)
                memo["J"] = np.asarray(jacg_j(x, p), dtype=np.float64)
            return memo["g"], memo["J"]

        constraints = []
        if np.any(eq):
            constraints.append({
                "type": "eq",
                "fun": lambda x: _eval(x)[0][eq] - lb[eq],
                "jac": lambda x: _eval(x)[1][eq]})
        if np.any(has_ub):
            constraints.append({
                "type": "ineq",
                "fun": lambda x: ub[has_ub] - _eval(x)[0][has_ub],
                "jac": lambda x: -_eval(x)[1][has_ub]})
        if np.any(has_lb):
            constraints.append({
                "type": "ineq",
                "fun": lambda x: _eval(x)[0][has_lb] - lb[has_lb],
                "jac": lambda x: _eval(x)[1][has_lb]})

        fun = lambda x: float(f_j(x, p))  # noqa: E731
        jac = lambda x: np.asarray(gradf_j(x, p), dtype=np.float64)  # noqa: E731

        def _viol(x):
            gv = np.asarray(g_j(x, p), dtype=np.float64)
            return float(np.max(np.maximum(lb - gv, 0.0)
                                + np.maximum(gv - ub, 0.0), initial=0.0))

        def _try(start, method="SLSQP"):
            opts = {"maxiter": max_iter, "ftol": tol} if method == "SLSQP" \
                else {"maxiter": max_iter}
            r = minimize(fun, start, jac=jac, constraints=constraints,
                         method=method, options=opts)
            x = np.asarray(r.x, dtype=np.float64)
            return x, _viol(x), fun(x), r.nit

        # SLSQP can fail catastrophically from degenerate warm starts (e.g.
        # right after a knot-passage shift); retry from perturbed starts and
        # keep the best feasible candidate -- the anchor must be the true
        # NLP optimum, not the first attempt
        feas_ok = 1e-4
        best = _try(x0)
        total_nit = best[3]
        if best[1] > feas_ok:
            rng = np.random.default_rng(0)
            for scale in (1e-3, 1e-2):
                cand = _try(x0 + scale * rng.standard_normal(n_x))
                total_nit += cand[3]
                if cand[1] < best[1] or (cand[1] <= feas_ok
                                         and cand[2] < best[2]):
                    best = cand
                if best[1] <= feas_ok:
                    break
        # polish: SLSQP restarted at its own best iterate (fresh BFGS
        # estimate) usually clears the residual infeasibility it plateaus
        # at after a knot-passage shift
        for _ in range(2):
            if best[1] <= feas_ok:
                break
            cand = _try(best[0])
            total_nit += cand[3]
            if cand[1] < best[1] or (cand[1] <= feas_ok
                                     and cand[2] < best[2]):
                best = cand
            else:
                break
        # last resort: an independent interior-point restoration.  Only
        # when SLSQP is stuck ABOVE the anchor's acceptance level (1e-3 in
        # the bench gate) -- trust-constr on the dense transcription costs
        # minutes, and between 1e-4 and 1e-3 the anchor is already good
        if best[1] > 1e-3:
            cand = _try(best[0], method="trust-constr")
            total_nit += cand[3]
            if cand[1] < best[1] or (cand[1] <= feas_ok
                                     and cand[2] < best[2]):
                best = cand
        x, feas, fval, _ = best
        return RefState(x=x, feas=np.float64(feas),
                        stat=np.float64(0.0 if feas <= feas_ok else 1.0),
                        n_iter=np.int64(total_nit))

    return solve
