"""Batched on-device MPC rollouts.

The TPU execution mode the reference has no analog for: thousands of
receding-horizon p2p scenarios advance in lockstep on one chip.  Everything
-- warm-start knot shifts, parameter refresh (vehicle state, obstacle
prediction), the ALM solve, and the (ideal) plant update -- happens inside
one jitted ``lax.scan``; the batch axis is vmapped and can be sharded over a
device mesh for multi-chip scaling.

Scope (round 1): FixedT Point2point problems with Holonomic-style vehicles
(state = position splines, input = scaled first derivative), obstacles with
constant-acceleration motion, ideal plant update (the reference's
``ideal_update`` option, vehicle.py:366-369).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.alm import ALMState

__all__ = ["BatchedP2PRunner", "RolloutConsts"]


class RolloutConsts(NamedTuple):
    """Large per-problem tensors threaded through the jitted rollout as
    RUNTIME ARGUMENTS.  Closing over them would inline them into the HLO as
    literals, blowing past remote-compile payload limits (axon HTTP 413)."""
    Q: Optional[jax.Array]      # scaled quadratic tensor (m, n, n)
    c0: Optional[jax.Array]     # per-phase affine constraint constants
    C1: Optional[jax.Array]
    A0: Optional[jax.Array]
    TA: Optional[jax.Array]
    f0: Optional[jax.Array]
    gf: Optional[jax.Array]
    lb: jax.Array
    ub: jax.Array
    M: jax.Array                # shiftoverknot warm-start transform


class CompactConsts(NamedTuple):
    """Rollout constants in family-compacted form (ops/compact.py):
    ~30x smaller than the dense tensors -- matters both for HBM and for
    host->device transfer through the axon tunnel."""
    CT: dict                    # CompactStructure.device_tensors()
    lb: jax.Array
    ub: jax.Array
    M: jax.Array
    FS: Optional[dict] = None   # FusedPlan.shared() tables (fused kernel)


class BatchedP2PRunner:

    def __init__(self, problem, dtype=jnp.float32, alm_options=None):
        """problem: an initialized FixedTPoint2point instance (its
        transcription/solver are reused; the host problem object is not
        mutated).  ``alm_options``: optional :class:`ops.alm.ALMOptions`
        override for the rollout solver (iteration budget tuning)."""
        self.problem = problem
        self.dtype = dtype
        tr = problem.transcription
        self.tr = tr
        # dedicated solver with quadratic-structure exploitation: constraint
        # values/Jacobians become large batched einsums (AD once per solve)
        from ..ops.alm import (make_alm_solver, ALMOptions,
                               detect_quadratic_structure)
        from ..utils.devices import on_host
        from ..utils import cache as _cache
        with on_host():
            with jax.default_matmul_precision("highest"):
                p_base = problem.pack_parameters(0.0)
                p_ref = jnp.asarray(p_base)
                key = getattr(tr, "fingerprint", None) or \
                    _cache.problem_fingerprint(tr, p_base)
                self._cache_key = key
                hit = _cache.load_tensors(key, "quadQ")
                frozen = []
                try:
                    slT, _ = tr.par_slice(problem, "T")
                    frozen = list(range(slT.start, slT.stop))
                except KeyError:
                    pass
                if hit is not None:
                    Q = hit["Q"] if hit["has_Q"] else None
                else:
                    Q = detect_quadratic_structure(tr.constraints, tr.n_x,
                                                   p_ref, f=tr.objective,
                                                   frozen_idx=frozen)
                    _cache.store_tensors(
                        key, "quadQ",
                        {"has_Q": np.asarray(Q is not None),
                         "Q": np.zeros((0,)) if Q is None else np.asarray(Q)})
        self._Q_raw = None if Q is None else np.asarray(Q)
        self.structure = "quadratic" if Q is not None else "generic"
        vehicle = problem.vehicles[0]
        self.vehicle = vehicle
        self.n_x = tr.n_x
        self.n_p = tr.n_p

        horizon = problem.options["horizon_time"]
        self.horizon = horizon
        self.knot_time = problem.knot_time
        self.update_time = 0.1
        self.steps_per_knot = int(round(self.knot_time / self.update_time))

        # warm-start shift matrix (applied on knot passage)
        self.shift_M = jnp.asarray(
            tr.spline_shift_matrix(lambda basis: basis.shiftoverknot_T()),
            dtype=dtype)

        # parameter layout indices
        def idx(child, name):
            sl, shape = tr.par_slice(child, name)
            return np.arange(sl.start, sl.stop), shape

        self.i_t, _ = idx(problem, "t")
        self.obstacle_idx = []
        # spline-trajectory obstacles (reference obstacle.py:112-117):
        # per-control-period propagation = re-expressing the trajectory
        # spline one period later -- a constant precomputed shift matrix
        # applied to the coefficient parameters (pure matmul on-device)
        self.traj_obstacle_idx = []
        for obstacle in problem.environment.obstacles:
            if obstacle.options.get("spline_traj", False):
                ic, cshape = idx(obstacle, "traj_coeffs")
                from ..ops.basis import Basis
                sp = obstacle.options["spline_params"]
                traj_basis = Basis(np.asarray(sp["knots"], dtype=np.float64),
                                   sp["degree"])
                M_obs = jnp.asarray(
                    traj_basis.shift_spline_T(
                        self.update_time / self.horizon), dtype=dtype)
                self.traj_obstacle_idx.append((ic, cshape, M_obs))
                continue
            try:
                ix, _ = idx(obstacle, "x")
                iv, _ = idx(obstacle, "v")
                ia, _ = idx(obstacle, "a")
                self.obstacle_idx.append((ix, iv, ia))
            except KeyError:
                pass

        sl, shape = tr.var_slice(vehicle, "splines_seg0")
        self.i_splines = np.arange(sl.start, sl.stop)
        self.spline_shape = shape  # (n_coeffs, n_spl)

        # vehicle-specific rollout recipe (sampling matrices, ideal plant
        # update, init guesses) -- see problems/rollout_models.py
        from .rollout_models import make_rollout_model
        self.model = make_rollout_model(self)
        for alias in ("E0", "E1", "i_state0", "i_input0"):
            if hasattr(self.model, alias):
                setattr(self, alias, getattr(self.model, alias))
        self.i_poseT = self.model.i_goal

        lb, ub = tr.bounds(0.0)
        self.lb = jnp.asarray(np.asarray(lb), dtype=dtype)
        self.ub = jnp.asarray(np.asarray(ub), dtype=dtype)

        # per-phase affine tensors for c(p), A(p): for each discrete in-knot
        # time t the constraint constants/Jacobian are AFFINE in the
        # remaining parameters, so the rollout needs no AD at all
        self._build_affine_cA()

        # family compaction (ops/compact.py): exploits the banded spline
        # sparsity -- the default TPU hot path when the problem is affine+
        # quadratic; falls back to the dense quadratic form otherwise
        self.compact = None
        if self.affine_cA and self._Q_raw is not None:
            from ..ops.compact import build_compact
            con_blocks = [(c.offset, c.rows)
                          for c in tr.layout.constraints]
            an = self._affine_np
            self.compact = build_compact(
                con_blocks, self._Q_raw, an["c0"], an["C1"], an["A0"],
                an["TA"], an["f0"], an["gf"],
                row_scale=problem._row_scale,
                obj_scale=problem._obj_scale,
                p_cols=an["vsel"])
            # head of the block-arrow partition: the smallest contiguous
            # span of the vehicle's variable blocks (starting at the
            # splines) whose complement decouples into pairwise-uncoupled
            # tail blocks.  Plain holonomic-style models: the spline block
            # itself.  Lifted models (Dubins substitution): splines + the
            # dx/dy auxiliaries, while the w = tg_ha^2 lift stays a tail
            # block of its own.
            from ..ops.compact import detect_arrow
            veh_blocks = sorted(
                (blk for (lbl, _), blk in tr.layout.variables.items()
                 if lbl == vehicle.label), key=lambda b: b.offset)
            lo = int(self.i_splines[0])
            ends = sorted({int(b.offset + b.size) for b in veh_blocks
                           if b.offset + b.size > lo})
            best = None
            for hi in ends:
                arrow = detect_arrow(self.compact.families, tr.n_x,
                                     (lo, hi - lo))
                if arrow is None:
                    continue
                # pick the cheapest factorization: head Cholesky + per-
                # block Cholesky + Schur panels (detect_arrow merges
                # coupled tails into one block, so a too-small head shows
                # up as one giant block, not a failure)
                h = arrow.head[1]
                cost = h ** 3 + sum(b ** 3 + 2 * b * b * (h + 1)
                                    for (_, b) in arrow.blocks)
                if best is None or cost < best[0]:
                    best = (cost, arrow)
            if best is not None:
                self.compact.arrow = best[1]
            self.structure = "compact"
            if self.compact.arrow is not None:
                self.structure = "compact-arrow"

        # fused Pallas inner loop (ops/fused_alm.py): the whole inner
        # Newton loop as one kernel per outer round; gated on the arrow
        # structure and on fitting the 16 MB scoped-VMEM budget
        self.fused_plan = None
        if (self.compact is not None and self.compact.arrow is not None
                and dtype == jnp.float32
                and os.environ.get("OMG_DISABLE_FUSED", "0") != "1"):
            from ..ops.fused_alm import FusedPlan
            plan = FusedPlan(self.compact)
            if plan.vmem_estimate() < 14 * 2 ** 20:
                # some TPU runtimes wedge forever inside the Mosaic
                # compile/first run of this kernel; on a TPU backend the
                # (cached, subprocess) probe decides before we commit --
                # a veto falls back to the unfused compact-arrow path
                from ..ops.pallas_kernels import _is_tpu_backend
                ok = True
                if _is_tpu_backend():
                    from ..ops.fused_probe import fused_kernel_ok
                    ok = fused_kernel_ok()
                if ok:
                    self.fused_plan = plan
                    self.structure = "compact-arrow-fused"

        self._alm_options = alm_options if alm_options is not None \
            else ALMOptions()
        self.solver = self.make_solver(self._alm_options)

        self.Q_dev = None if self.solver.Q_scaled is None else \
            jnp.asarray(self.solver.Q_scaled, dtype=dtype)

    def make_solver(self, alm_options):
        """Build an ALM solver over this runner's compacted tensors with a
        custom iteration budget (phase-adaptive rollouts use one solver per
        budget class)."""
        from ..ops.alm import make_alm_solver
        problem = self.problem
        tr = self.tr
        return make_alm_solver(
            tr.objective, tr.constraints, tr.n_x, tr.lb, tr.ub,
            alm_options,
            row_scale=problem._row_scale,
            obj_scale=problem._obj_scale,
            quadratic_Q=None if self.compact is not None else self._Q_raw,
            compact=self.compact,
            fused_plan=getattr(self, "fused_plan", None))

    def consts(self):
        """The rollout's large tensors, to be passed as jit ARGUMENTS."""
        if self.compact is not None:
            FS = None if self.fused_plan is None else \
                self.fused_plan.shared(self.dtype)
            return CompactConsts(self.compact.device_tensors(self.dtype),
                                 self.lb, self.ub, self.shift_M, FS)
        if self.affine_cA:
            cA = (self.c0, self.C1, self.A0, self.TA, self.f0, self.gf)
        else:
            cA = (None,) * 6
        return RolloutConsts(self.Q_dev, *cA, self.lb, self.ub,
                             self.shift_M)

    def _varying_param_indices(self):
        """Full-p indices of the parameters that change during a rollout
        (vehicle state, goal, obstacle states).  Everything else (t, T,
        shape data) is frozen, so the affine/bilinear tensors are built --
        and stored -- restricted to these columns (a ~n_p/n_vary cut in
        both the host AD cost and the tensor footprint)."""
        varying = list(self.model.varying_params())
        for (ix, iv, ia) in self.obstacle_idx:
            varying.extend([ix, iv, ia])
        for (ic, _, _) in self.traj_obstacle_idx:
            varying.append(ic)
        return np.unique(np.concatenate(varying))

    def _build_affine_cA(self):
        from ..utils.devices import on_host
        from ..utils import cache as _cache
        self._affine_np = None
        hit = _cache.load_tensors(self._cache_key, "affine_v")
        if hit is not None:
            self.affine_cA = bool(hit["ok"])
            if self.affine_cA:
                dt = self.dtype
                self._affine_np = {name: hit[name] for name in
                                   ("c0", "C1", "A0", "TA", "f0", "gf",
                                    "vsel")}
                for name, val in self._affine_np.items():
                    if name == "vsel":
                        self._vsel = np.asarray(val, dtype=np.int64)
                    else:
                        setattr(self, name, jnp.asarray(val, dtype=dt))
            return
        with on_host():
            with jax.default_matmul_precision("highest"):
                self._build_affine_cA_impl()
        arrays = {"ok": np.asarray(self.affine_cA)}
        if self.affine_cA:
            self._affine_np = {}
            for name in ("c0", "C1", "A0", "TA", "f0", "gf"):
                arrays[name] = np.asarray(getattr(self, name))
                self._affine_np[name] = arrays[name]
            arrays["vsel"] = np.asarray(self._vsel)
            self._affine_np["vsel"] = arrays["vsel"]
        _cache.store_tensors(self._cache_key, "affine_v", arrays)

    def _build_affine_cA_impl(self):
        tr = self.tr
        problem = self.problem
        g_fn = tr.constraints
        f_fn = tr.objective
        n_p = tr.n_p
        spk = self.steps_per_knot
        zero = jnp.zeros(tr.n_x)
        p_base = problem.pack_parameters(0.0)
        varying = self._varying_param_indices()
        n_v = len(varying)
        # AD restricted to the varying parameter columns: dp -> p + E dp
        E = np.zeros((n_p, n_v))
        E[varying, np.arange(n_v)] = 1.0
        Ej = jnp.asarray(E)
        dzero = jnp.zeros(n_v)
        jac_x = jax.jit(jax.jacfwd(g_fn))

        def g_of_dp(dp, pj):
            return g_fn(zero, pj + Ej @ dp)

        def jx_of_dp(dp, pj):
            return jax.jacfwd(g_fn)(zero, pj + Ej @ dp)

        jac_p_v = jax.jit(jax.jacfwd(g_of_dp))           # (m, n_v)
        jac_xp_v = jax.jit(jax.jacfwd(jx_of_dp))         # (m, n, n_v)
        grad_f = jax.jit(jax.grad(f_fn))
        c0s, C1s, A0s, TAs, f0s, gfs = [], [], [], [], [], []
        ok = self.structure == "quadratic"
        for ph in range(spk):
            p_ref = p_base.copy()
            p_ref[self.i_t] = ph * self.update_time
            pj = jnp.asarray(p_ref)
            pv_ref = p_ref[varying]
            C1 = np.asarray(jac_p_v(dzero, pj))          # (m, n_v)
            c0 = np.asarray(g_fn(zero, pj)) - C1 @ pv_ref
            TA = np.asarray(jac_xp_v(dzero, pj))         # (m, n, n_v)
            A0 = np.asarray(jac_x(zero, pj)) - TA @ pv_ref
            gf = np.asarray(grad_f(zero, pj))
            f0 = float(f_fn(zero, pj))
            # validate affineness in the varying parameters; fixed
            # parameters (t, T, shape data) may enter nonlinearly
            rng = np.random.default_rng(ph)
            p_probe = p_ref.copy()
            p_probe[varying] += rng.standard_normal(n_v) * 0.1
            c_pred = c0 + C1 @ p_probe[varying]
            c_direct = np.asarray(g_fn(zero, jnp.asarray(p_probe)))
            if np.max(np.abs(c_pred - c_direct)) > 1e-4 * (
                    np.max(np.abs(c_direct)) + 1.0):
                ok = False
                break
            A_pred = A0 + TA @ p_probe[varying]
            A_direct = np.asarray(jac_x(zero, jnp.asarray(p_probe)))
            if np.max(np.abs(A_pred - A_direct)) > 1e-4 * (
                    np.max(np.abs(A_direct)) + 1.0):
                ok = False
                break
            c0s.append(c0); C1s.append(C1)
            A0s.append(A0); TAs.append(TA)
            f0s.append(f0); gfs.append(gf)
        if ok:
            dt = self.dtype
            self._vsel = varying
            self.c0 = jnp.asarray(np.stack(c0s), dtype=dt)
            self.C1 = jnp.asarray(np.stack(C1s), dtype=dt)
            self.A0 = jnp.asarray(np.stack(A0s), dtype=dt)
            self.TA = jnp.asarray(np.stack(TAs), dtype=dt)
            self.f0 = jnp.asarray(np.asarray(f0s), dtype=dt)
            self.gf = jnp.asarray(np.stack(gfs), dtype=dt)
            self.affine_cA = True
        else:
            self.affine_cA = False

    def _cA_at(self, C: RolloutConsts, phase, p):
        """(c, A, f0, gf) for one scenario at the given phase (traced).
        C1/TA are restricted to the varying parameter columns."""
        pv = p[jnp.asarray(self._vsel)]
        c = jnp.take(C.c0, phase, axis=0) \
            + jnp.take(C.C1, phase, axis=0) @ pv
        A = jnp.take(C.A0, phase, axis=0) \
            + jnp.einsum("mnq,q->mn", jnp.take(C.TA, phase, axis=0), pv)
        f0 = jnp.take(C.f0, phase, axis=0)
        gf = jnp.take(C.gf, phase, axis=0)
        return (c, A, f0, gf)

    # -- scenario construction (host) -------------------------------------
    def make_batch(self, starts, goals, obstacle_states=None):
        """Build (x0, p0, state0) batches from per-scenario starts/goals
        (B, n_dim) and optional obstacle states [(pos, vel, acc) per
        obstacle, each (B, n_dim)].  Init guesses: vectorized straight-line
        splines + geometric hyperplane warm starts."""
        tr = self.tr
        problem = self.problem
        vehicle = self.vehicle
        starts = np.asarray(starts, dtype=np.float64)
        goals = np.asarray(goals, dtype=np.float64)
        B = starts.shape[0]
        n_coef = len(vehicle.basis)

        x0 = np.tile(tr.initial_guess()[None, :], (B, 1))
        x0[:, self.i_splines] = self.model.init_guess(
            starts, goals, n_coef).reshape(B, -1)
        # lifted position splines (Dubins substitution): straight-line
        # coefficient guesses from start to goal per axis
        for ax, name in enumerate(("xs_lift", "ys_lift")):
            try:
                sl, shape = tr.var_slice(vehicle, name)
            except KeyError:
                break
            npos = shape[0]
            ramp = np.linspace(0.0, 1.0, npos)[None, :]
            x0[:, sl.start:sl.stop] = (
                starts[:, ax:ax + 1] + ramp
                * (goals[:, ax:ax + 1] - starts[:, ax:ax + 1]))

        # parameters
        p0 = np.tile(np.zeros(tr.n_p)[None, :], (B, 1))
        base = problem.pack_parameters(0.0)
        p0[:, :] = base[None, :]
        p0 = self.model.batch_params(p0, starts, goals)
        obs_list = problem.environment.obstacles
        if obstacle_states is not None:
            for (ix, iv, ia), (pos, vel, acc) in zip(self.obstacle_idx,
                                                     obstacle_states):
                p0[:, ix] = pos
                p0[:, iv] = vel
                p0[:, ia] = acc

        # vectorized geometric hyperplane warm start per (obstacle, scenario)
        for l, obstacle in enumerate(obs_list):
            for name_prefix in ("a", "b"):
                name = f"{name_prefix}_{vehicle.label}_seg0_0{l}"
                try:
                    sl, shape = tr.var_slice(problem.environment, name)
                except KeyError:
                    continue
                basis_len = shape[0]
                if obstacle_states is not None:
                    obs_pos = np.asarray(obstacle_states[l][0])
                else:
                    obs_pos = np.tile(
                        obstacle.signals["position"][:, -1][None, :], (B, 1))
                chck, rad = obstacle.shape.get_checkpoints()
                bbox_lo = chck.min(axis=0)[None, :] + obs_pos
                bbox_hi = chck.max(axis=0)[None, :] + obs_pos
                from ..ops.basis import Basis
                hyp_basis = problem.environment._hyperplane_basis(vehicle)
                g = hyp_basis.greville()
                # points on the init path at greville taus: (B, nb, 2)
                pts = self.model.path_points(starts, goals, g)
                nearest = np.clip(pts, bbox_lo[:, None, :], bbox_hi[:, None, :])
                d = pts - nearest
                nrm = np.linalg.norm(d, axis=-1, keepdims=True)
                # fallback perpendicular for on-path obstacles: any unit
                # vector orthogonal to the travel direction (dimension-
                # generic -- Gram-Schmidt of the least-aligned axis)
                dirvec = goals - starts
                dim = dirvec.shape[-1]
                axis = np.eye(dim)[np.argmin(np.abs(dirvec), axis=-1)]
                d2 = np.maximum(np.sum(dirvec * dirvec, axis=-1,
                                       keepdims=True), 1e-12)
                perp = axis - (np.sum(axis * dirvec, axis=-1,
                                      keepdims=True) / d2) * dirvec
                perp /= np.maximum(np.linalg.norm(perp, axis=-1,
                                                  keepdims=True), 1e-9)
                d = np.where(nrm > 1e-9, d, perp[:, None, :])
                a0 = -d / np.maximum(np.linalg.norm(d, axis=-1,
                                                    keepdims=True), 1e-9)
                support = (np.einsum("cd,bnd->bnc", chck, a0)
                           - rad[None, None, :]).min(axis=-1)
                b0 = support + np.einsum("bnd,bd->bn", a0, obs_pos) - 1e-2
                if name_prefix == "a":
                    x0[:, sl.start:sl.stop] = a0.reshape(B, -1)
                else:
                    x0[:, sl.start:sl.stop] = b0.reshape(B, -1)

        return (jnp.asarray(x0, dtype=self.dtype),
                jnp.asarray(p0, dtype=self.dtype),
                jnp.asarray(starts, dtype=self.dtype))

    # -- the jitted rollout -------------------------------------------------
    def init_solver_state(self, x0, p0, consts=None):
        """Batched cold solve producing the initial warm state.  Pass
        ``consts`` explicitly when jitting for a remote backend."""
        C = consts if consts is not None else self.consts()
        if self.fused_plan is not None and getattr(C, "FS", None) is not None:
            from ..ops.fused_alm import FusedPlan
            fs0 = FusedPlan.slice_phase(C.FS, 0)
            solve = jax.vmap(lambda x, p: self.solver(
                x, p, C.lb, C.ub, fshared=fs0))
        elif self.compact is not None:
            from ..ops.compact import resolve_phase
            struct = self.compact
            solve = jax.vmap(lambda x, p: self.solver(
                x, p, C.lb, C.ub, ct=resolve_phase(struct, C.CT, 0, p)))
        elif self.affine_cA:
            solve = jax.vmap(lambda x, p: self.solver(
                x, p, C.lb, C.ub, cA=self._cA_at(C, 0, p), Q=C.Q))
        else:
            solve = jax.vmap(lambda x, p: self.solver(x, p, C.lb, C.ub,
                                                      Q=C.Q))
        return solve(x0, p0)

    def rollout_fn(self, n_steps, outer_iter=4, recover_tol=0.3,
                   rescue_lanes=0, rescue_outer=3, rescue_tol=1e-3,
                   budgets=None, streak_tol=8e-3, recover_metric="raw"):
        """Return a jittable function
        (alm_state, p, state, consts) -> (final carry, per-step states)
        advancing ``n_steps`` MPC periods on-device.  ``consts`` (from
        :meth:`consts`) carries the big tensors as jit arguments; omitting it
        falls back to closure capture (fine on the local backend only).

        ``recover_tol``: on-device failure recovery (the rollout analog of
        the host path's reinitialize-on-failure, problems/problem.py:199-206):
        scenarios whose raw constraint violation exceeds the tolerance get a
        masked warm-start reset -- straight-line spline guess from the
        current state to the goal, multipliers zeroed, penalty re-armed --
        instead of rolling garbage forward.

        ``rescue_lanes``: the f32 batch-tail fix.  After the main batched
        solve, the ``rescue_lanes`` worst scenarios by raw violation (and
        above ``rescue_tol``) are gathered into a small static-shape side
        batch, re-solved with ``rescue_outer`` extra ALM outer rounds, and
        scattered back BEFORE the plant update -- so the handful of hard
        scenarios in a 4096-lane batch get 4x the solver effort at ~K/B
        relative cost instead of dragging the whole batch's feasibility
        tail.  0 disables.

        ``budgets``: phase-adaptive iteration budgets
        ``((hard_outer, hard_inner), (easy_outer, easy_inner))``.  Only the
        knot-passage step (warm start shifted one knot) is hard; the
        steps_per_knot-1 mid-knot steps start from a nearly-converged warm
        state.  A ``lax.cond`` on the SCALAR step index picks the solver,
        so the mean per-step cost drops toward the easy budget while the
        hard step gets more effort than a uniform budget could afford.
        Overrides ``outer_iter`` when given.

        ``recover_metric``: which feasibility drives the recovery/rescue
        triggers.  ``"raw"`` (unit-mixing inf-norm) suits problems whose
        raw and scaled violations are commensurate (holonomic);
        ``"scaled"`` (row-scaled, Ipopt convention) is REQUIRED for
        problems with high-derivative rows whose raw f32 noise floor
        exceeds any sensible tolerance (SimpleQuadrotor3D: T^4-scaled
        terminal rows float at raw ~0.14, so raw-metric triggers would
        reset every lane every step)."""
        spk = self.steps_per_knot
        dt = self.update_time
        solver = self.solver
        affine = self.affine_cA
        compact = self.compact
        i_spl = jnp.asarray(self.i_splines)
        i_poseT = jnp.asarray(self.i_poseT)
        i_t = jnp.asarray(self.i_t)
        model = self.model
        obstacle_idx = [(jnp.asarray(ix), jnp.asarray(iv), jnp.asarray(ia))
                        for (ix, iv, ia) in self.obstacle_idx]
        traj_obstacle_idx = self.traj_obstacle_idx
        n_coef, n_spl = self.spline_shape
        horizon = self.horizon
        cA_at = self._cA_at
        default_consts = self.consts
        if recover_metric == "scaled":
            trigger_feas = lambda st: st.feas          # noqa: E731
        else:
            trigger_feas = lambda st: st.feas_raw      # noqa: E731

        fused_plan = self.fused_plan

        def _solve_with(solver_fn, C, st_in, x_warm, p, phase, n_outer):
            if fused_plan is not None and getattr(C, "FS", None) is not None:
                from ..ops.fused_alm import FusedPlan
                fs = FusedPlan.slice_phase(C.FS, phase)
                return solver_fn(x_warm, p, C.lb, C.ub, state0=st_in,
                                 outer_iter=n_outer, fshared=fs)
            if compact is not None:
                from ..ops.compact import resolve_phase
                ct = resolve_phase(compact, C.CT, phase, p)
                return solver_fn(x_warm, p, C.lb, C.ub, state0=st_in,
                                 outer_iter=n_outer, ct=ct)
            cA = cA_at(C, phase, p) if affine else None
            return solver_fn(x_warm, p, C.lb, C.ub, state0=st_in,
                             outer_iter=n_outer, cA=cA, Q=C.Q)

        def _solve(C, st_in, x_warm, p, phase, n_outer):
            return _solve_with(solver, C, st_in, x_warm, p, phase, n_outer)

        def make_solve_step(solver_fn, n_outer):
            def solve_step(C, carry, k):
                st, p, state, streak = carry
                phase = k % spk
                # knot passage: shift the warm start (k > 0 and phase == 0)
                do_shift = (phase == 0) & (k > 0)
                x_warm = jnp.where(do_shift, C.M @ st.x, st.x)
                # masked divergence recovery: fresh-guess re-initialization.
                # Two triggers: a hard per-step violation, or a sustained
                # soft one (feas_raw > streak_tol for 2 consecutive steps --
                # the bad warm-start basin detected EARLY, before the lane
                # fully diverges)
                bad = (trigger_feas(st) > recover_tol) | (streak >= 2)
                goal = p[i_poseT]
                reset = model.reset_guess(state, goal, n_coef,
                                          x_warm.dtype).reshape(-1)
                x_warm = jnp.where(bad, x_warm.at[i_spl].set(reset), x_warm)
                lam_warm = jnp.where(bad, jnp.zeros_like(st.lam), st.lam)
                rho_warm = jnp.where(bad, jnp.full_like(st.rho, 100.0),
                                     st.rho)
                p = p.at[i_t].set(phase * dt)
                st_in = st._replace(x=x_warm, lam=lam_warm, rho=rho_warm,
                                    feas=jnp.full_like(st.feas, jnp.inf),
                                    stat=jnp.full_like(st.stat, jnp.inf),
                                    n_iter=jnp.zeros_like(st.n_iter))
                st = _solve_with(solver_fn, C, st_in, x_warm, p, phase,
                                 n_outer)
                streak = jnp.where(bad, jnp.zeros_like(streak), streak)
                streak = jnp.where(trigger_feas(st) > streak_tol, streak + 1,
                                   jnp.zeros_like(streak))
                return st, p, state, streak
            return solve_step

        solve_step = make_solve_step(solver, outer_iter)

        def plant_step(C, st, p, state, k):
            # ideal plant update: vehicle recipe maps the solved splines at
            # the next sample instant back into the parameter vector
            phase = k % spk
            cfs = st.x[i_spl].reshape(n_coef, n_spl)
            row = phase + 1
            p, state_n = model.update(p, cfs, row, horizon)
            # obstacle constant-acceleration propagation
            for (ix, iv, ia) in obstacle_idx:
                pos, vel, acc = p[ix], p[iv], p[ia]
                p = p.at[ix].set(pos + vel * dt + 0.5 * acc * dt * dt)
                p = p.at[iv].set(vel + acc * dt)
            # spline-trajectory obstacles: advance by one period (matmul
            # with the precomputed re-basing transform)
            for (ic, cshape, M_obs) in traj_obstacle_idx:
                cfs_o = p[jnp.asarray(ic)].reshape(cshape)
                p = p.at[jnp.asarray(ic)].set((M_obs @ cfs_o).reshape(-1))
            return (st, p, state_n), state_n

        if budgets is not None:
            (hard_outer, hard_inner), (easy_outer, easy_inner) = budgets
            solver_hard = self.make_solver(
                self._alm_options._replace(inner_iter=hard_inner))
            solver_easy = self.make_solver(
                self._alm_options._replace(inner_iter=easy_inner))
            hard_step = make_solve_step(solver_hard, hard_outer)
            easy_step = make_solve_step(solver_easy, easy_outer)

        def rollout(st, p, state, consts: Optional[RolloutConsts] = None):
            C = consts if consts is not None else default_consts()
            batch_axes = dict(in_axes=(None, (0, 0, 0, 0), None),
                              out_axes=(0, 0, 0, 0))
            if budgets is None:
                batched_solve = jax.vmap(solve_step, **batch_axes)
            else:
                bs_hard = jax.vmap(hard_step, **batch_axes)
                bs_easy = jax.vmap(easy_step, **batch_axes)

                def batched_solve(C, carry, k):
                    # scalar predicate: only the knot-passage step is hard
                    return jax.lax.cond((k % spk == 0) & (k > 0),
                                        lambda c: bs_hard(C, c, k),
                                        lambda c: bs_easy(C, c, k), carry)
            batched_plant = jax.vmap(plant_step,
                                     in_axes=(None, 0, 0, 0, None),
                                     out_axes=((0, 0, 0), 0))
            streak0 = jnp.zeros(st.feas_raw.shape, dtype=jnp.int32)

            def rescue_one(st_r, p_r, phase, state_r):
                # lanes beyond recover_tol are in a bad warm-start basin:
                # extra iterations alone cannot leave it, so the rescue
                # re-solve starts from a FRESH guess (the in-step analog of
                # the next-step masked reset -- catches final-step
                # divergences that have no next step)
                diverged = trigger_feas(st_r) > recover_tol
                goal = p_r[i_poseT]
                reset = model.reset_guess(state_r, goal, n_coef,
                                          st_r.x.dtype).reshape(-1)
                x_in = jnp.where(diverged, st_r.x.at[i_spl].set(reset),
                                 st_r.x)
                st_in = st_r._replace(
                    x=x_in,
                    lam=jnp.where(diverged, jnp.zeros_like(st_r.lam),
                                  st_r.lam),
                    rho=jnp.where(diverged, jnp.full_like(st_r.rho, 100.0),
                                  st_r.rho))
                return _solve(C, st_in, x_in, p_r, phase, rescue_outer)

            # phase is uniform across rescued lanes: keep it UNBATCHED so
            # the fused path's phase-sliced shared tensors stay unbatched
            rescue_solve = jax.vmap(rescue_one, in_axes=(0, 0, None, 0))

            def scan_body(carry, k):
                st, p, state, streak = batched_solve(C, carry, k)
                if rescue_lanes:
                    # gather the worst lanes (clamped to the batch size),
                    # re-solve with extra outer rounds, keep whichever
                    # iterate is more feasible
                    k_r = min(rescue_lanes, trigger_feas(st).shape[0])
                    _, idx = jax.lax.top_k(trigger_feas(st), k_r)
                    st_r = jax.tree_util.tree_map(lambda a: a[idx], st)
                    st_r2 = rescue_solve(st_r, p[idx], k % spk, state[idx])
                    take = (trigger_feas(st_r) > rescue_tol) & \
                        (trigger_feas(st_r2) < trigger_feas(st_r))

                    def blend(a, b):
                        m = take.reshape((-1,) + (1,) * (a.ndim - 1)) \
                            if a.ndim > 1 else take
                        return jnp.where(m, b, a)

                    st_rm = jax.tree_util.tree_map(blend, st_r, st_r2)
                    st = jax.tree_util.tree_map(
                        lambda a, b: a.at[idx].set(b), st, st_rm)
                (st, p, state), out = batched_plant(C, st, p, state, k)
                return (st, p, state, streak), out

            carry, states = jax.lax.scan(scan_body,
                                         (st, p, state, streak0),
                                         jnp.arange(n_steps))
            # drop the internal streak counter from the public carry
            return carry[:3], jnp.moveaxis(states, 0, 1)  # (B, n_steps, ...)

        return rollout
