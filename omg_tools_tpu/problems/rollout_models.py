"""Vehicle-specific recipes for the batched on-device rollout.

The rollout (problems/batch.py) advances thousands of MPC scenarios in
lockstep inside one jitted scan; everything vehicle-specific -- which
parameter blocks carry the plant state, how the ideal plant update maps
solved spline coefficients to the next parameter vector, and the
vectorized initial guess -- lives here as a per-model recipe built from
HOST-precomputed constant matrices (basis samplings, product tensors,
interval integrals), so the traced update is pure einsum/matvec work.

Models:
- ``HolonomicRollout``: state = position splines; params state0/input0
  (reference vehicles/holonomic.py) -- the round-1 behavior.
- ``QuadrotorRollout``: planar quadrotor / Holonomic3D / SimpleQuadrotor3D
  style: spl0/dspl0/ddspl0 from 0th/1st/2nd derivative rows (reference
  quadrotor.py:27, quadrotor3d_simple.py:44).
- ``DubinsRollout``: decision splines (v_til, tg_ha); the plant position
  pos0 advances by the EXACT spline integral of
  dx = v_til (1 - tg_ha^2), dy = 2 v_til tg_ha over the step interval,
  via precomputed triple-product tensors (reference dubins.py:29-44,
  262-268).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["make_rollout_model"]


class _RolloutModel:
    """Shared plumbing: parameter-slice lookup + sampling matrices."""

    def __init__(self, runner):
        self.runner = runner
        self.vehicle = runner.vehicle
        self.tr = runner.tr
        spk = runner.steps_per_knot
        self.taus = np.arange(spk + 1) * runner.update_time / runner.horizon

    def idx(self, child, name):
        sl, shape = self.tr.par_slice(child, name)
        return np.arange(sl.start, sl.stop)

    def sample_rows(self, order):
        """(spk+1, n_c) rows evaluating the order-th derivative (in basis
        time) of a vehicle spline at the visited tau grid."""
        basis = self.vehicle.basis
        if order == 0:
            return basis.eval(self.taus)
        db, P = basis.derivative(order)
        return db.eval(self.taus) @ P

    # -- default hooks -------------------------------------------------------
    def init_guess(self, starts, goals, n_coef):
        """(B, n_coef, n_spl) straight-line spline guesses."""
        line = (np.linspace(0, 1, n_coef)[None, :, None]
                * (goals - starts)[:, None, :] + starts[:, None, :])
        return line

    def path_points(self, starts, goals, g):
        """(B, len(g), n_dim) positions along the init path (hyperplane
        warm starts)."""
        return (np.asarray(g)[None, :, None] * (goals - starts)[:, None, :]
                + starts[:, None, :])

    def reset_guess(self, state, goal, n_coef, dtype):
        """Traced (n_coef, n_spl) fresh guess for a diverged scenario
        (straight line in the spline space; overridden where the splines
        are not positions)."""
        w = jnp.linspace(0.0, 1.0, n_coef, dtype=dtype)
        return (state[None, :] * (1.0 - w[:, None])
                + goal[None, :] * w[:, None])


class HolonomicRollout(_RolloutModel):

    goal_param = "poseT"

    def __init__(self, runner):
        _RolloutModel.__init__(self, runner)
        veh = self.vehicle
        self.i_state0 = self.idx(veh, "state0")
        self.i_input0 = self.idx(veh, "input0")
        self.i_goal = self.idx(veh, self.goal_param)
        self.E0 = jnp.asarray(self.sample_rows(0), dtype=runner.dtype)
        self.E1 = jnp.asarray(self.sample_rows(1), dtype=runner.dtype)

    def varying_params(self):
        return [self.i_state0, self.i_input0, self.i_goal]

    def batch_params(self, p0, starts, goals):
        p0[:, self.i_state0] = starts
        p0[:, self.i_input0] = 0.0
        p0[:, self.i_goal] = goals
        return p0

    def update(self, p, cfs, row, horizon):
        state = self.E0[row] @ cfs
        inp = self.E1[row] @ cfs / horizon
        p = p.at[jnp.asarray(self.i_state0)].set(state)
        p = p.at[jnp.asarray(self.i_input0)].set(inp)
        return p, state


class QuadrotorRollout(_RolloutModel):
    """spl0/dspl0/ddspl0 parameter triplet (planar Quadrotor, Holonomic3D
    with accel bounds, SimpleQuadrotor3D)."""

    def __init__(self, runner, goal_param):
        _RolloutModel.__init__(self, runner)
        veh = self.vehicle
        self.goal_param = goal_param
        self.i_spl0 = self.idx(veh, "spl0")
        self.i_dspl0 = self.idx(veh, "dspl0")
        self.i_ddspl0 = self.idx(veh, "ddspl0")
        self.i_goal = self.idx(veh, goal_param)
        self.E0 = jnp.asarray(self.sample_rows(0), dtype=runner.dtype)
        self.E1 = jnp.asarray(self.sample_rows(1), dtype=runner.dtype)
        self.E2 = jnp.asarray(self.sample_rows(2), dtype=runner.dtype)

    def varying_params(self):
        return [self.i_spl0, self.i_dspl0, self.i_ddspl0, self.i_goal]

    def batch_params(self, p0, starts, goals):
        p0[:, self.i_spl0] = starts
        p0[:, self.i_dspl0] = 0.0
        p0[:, self.i_ddspl0] = 0.0
        p0[:, self.i_goal] = goals
        return p0

    def update(self, p, cfs, row, horizon):
        pos = self.E0[row] @ cfs
        vel = self.E1[row] @ cfs / horizon
        acc = self.E2[row] @ cfs / horizon ** 2
        p = p.at[jnp.asarray(self.i_spl0)].set(pos)
        p = p.at[jnp.asarray(self.i_dspl0)].set(vel)
        p = p.at[jnp.asarray(self.i_ddspl0)].set(acc)
        return p, pos


class HolonomicOrientRollout(_RolloutModel):
    """pos0/vel0/tg_ha0/dtg_ha0 parameter set (HolonomicOrient: x, y
    position splines + tangent-half-angle orientation spline; the
    derivative parameters enter T-scaled, models/holonomicorient.py
    get_initial_constraints)."""

    def __init__(self, runner):
        _RolloutModel.__init__(self, runner)
        veh = self.vehicle
        self.i_state0 = self.idx(veh, "pos0")       # (2,) position
        self.i_vel0 = self.idx(veh, "vel0")
        self.i_tg0 = self.idx(veh, "tg_ha0")
        self.i_dtg0 = self.idx(veh, "dtg_ha0")
        self.i_goal = self.idx(veh, "posT")
        self.i_tgT = self.idx(veh, "tg_haT")
        self.E0 = jnp.asarray(self.sample_rows(0), dtype=runner.dtype)
        self.E1 = jnp.asarray(self.sample_rows(1), dtype=runner.dtype)

    def varying_params(self):
        return [self.i_state0, self.i_vel0, self.i_tg0, self.i_dtg0,
                self.i_goal]

    def batch_params(self, p0, starts, goals):
        p0[:, self.i_state0] = starts[:, :2]
        p0[:, self.i_vel0] = 0.0
        p0[:, self.i_goal] = goals[:, :2]
        return p0

    def update(self, p, cfs, row, horizon):
        pos = self.E0[row] @ cfs[:, :2]
        vel = self.E1[row] @ cfs[:, :2] / horizon
        tg = self.E0[row] @ cfs[:, 2]
        dtg = self.E1[row] @ cfs[:, 2] / horizon
        p = p.at[jnp.asarray(self.i_state0)].set(pos)
        p = p.at[jnp.asarray(self.i_vel0)].set(vel)
        p = p.at[jnp.asarray(self.i_tg0)].set(tg[None])
        p = p.at[jnp.asarray(self.i_dtg0)].set(dtg[None])
        return p, pos


class DubinsRollout(_RolloutModel):
    """Splines (v_til, tg_ha); pos0 advances by the exact integral of the
    rationalized unicycle velocities over the step interval."""

    goal_param = "posT"

    def __init__(self, runner):
        _RolloutModel.__init__(self, runner)
        veh = self.vehicle
        self.i_vtil0 = self.idx(veh, "v_til0")
        self.i_tgha0 = self.idx(veh, "tg_ha0")
        self.i_dtgha0 = self.idx(veh, "dtg_ha0")
        self.i_pos0 = self.idx(veh, "pos0")
        self.i_goal = self.idx(veh, self.goal_param)
        self.i_tghaT = self.idx(veh, "tg_haT")
        basis = veh.basis
        dt = runner.dtype
        self.E0 = jnp.asarray(self.sample_rows(0), dtype=dt)
        self.E1 = jnp.asarray(self.sample_rows(1), dtype=dt)
        # product tensors: P2 = basis*basis (v*tg), P3 = P2*basis (v*tg*tg)
        P2, W2 = basis.product_tensor(basis)
        P3, W32 = P2.product_tensor(basis)
        T_v3 = P3.transform(basis)                  # embed v_til into P3
        # interval integrals of P2/P3 splines over [tau_k, tau_k+1]:
        # rows r with  integral = r @ coeffs
        def interval_rows(pb):
            ib, L = pb.running_integral()
            E = ib.eval(self.taus) @ L              # (spk+1, n_p)
            return E[1:] - E[:-1]                   # (spk, n_p)
        self.W2 = jnp.asarray(W2, dtype=dt)
        self.W32 = jnp.asarray(W32, dtype=dt)
        self.T_v3 = jnp.asarray(T_v3, dtype=dt)
        self.R2 = jnp.asarray(interval_rows(P2), dtype=dt)   # dy rows
        self.R3 = jnp.asarray(interval_rows(P3), dtype=dt)   # dx rows

    def varying_params(self):
        return [self.i_vtil0, self.i_tgha0, self.i_dtgha0, self.i_pos0,
                self.i_goal, self.i_tghaT]

    def init_guess(self, starts, goals, n_coef):
        # v_til ramp toward vmax/2, tg_ha = heading of the straight path
        B = starts.shape[0]
        head = np.arctan2(goals[:, 1] - starts[:, 1],
                          goals[:, 0] - starts[:, 0])
        tg = np.tan(0.5 * head)
        vmax = getattr(self.vehicle, "vmax", 0.5)
        guess = np.zeros((B, n_coef, 2))
        guess[:, :, 0] = 0.25 * vmax / (1 + tg[:, None] ** 2)
        guess[:, :, 1] = tg[:, None]
        return guess

    def batch_params(self, p0, starts, goals):
        head = np.arctan2(goals[:, 1] - starts[:, 1],
                          goals[:, 0] - starts[:, 0])
        tg = np.tan(0.5 * head)
        p0[:, self.i_pos0] = starts
        p0[:, self.i_vtil0] = 0.0
        p0[:, self.i_tgha0] = tg[:, None]
        p0[:, self.i_dtgha0] = 0.0
        p0[:, self.i_goal] = goals
        p0[:, self.i_tghaT] = tg[:, None]
        return p0

    def reset_guess(self, state, goal, n_coef, dtype):
        d = goal - state
        tg = jnp.tan(0.5 * jnp.arctan2(d[1], d[0]))
        vmax = getattr(self.vehicle, "vmax", 0.5)
        col_v = jnp.full((n_coef,), 0.25 * vmax, dtype=dtype) \
            / (1.0 + tg ** 2)
        col_t = jnp.full((n_coef,), 1.0, dtype=dtype) * tg
        return jnp.stack([col_v, col_t], axis=1)

    def update(self, p, cfs, row, horizon):
        c_v, c_t = cfs[:, 0], cfs[:, 1]
        # spline values at the next sample instant
        v_til = self.E0[row] @ c_v
        tg_ha = self.E0[row] @ c_t
        dtg_ha = self.E1[row] @ c_t / horizon
        # exact step displacement: dx = v(1 - tg^2), dy = 2 v tg (in tau),
        # scaled by the horizon (reference dubins.py:262-268)
        c_vt = jnp.einsum("qij,i,j->q", self.W2, c_v, c_t)     # v*tg in P2
        c_vtt = jnp.einsum("qij,i,j->q", self.W32, c_vt, c_t)  # v*tg^2 in P3
        c_dx = self.T_v3 @ c_v - c_vtt
        dx = horizon * (self.R3[row - 1] @ c_dx)
        dy = horizon * (2.0 * (self.R2[row - 1] @ c_vt))
        pos = p[jnp.asarray(self.i_pos0)] + jnp.stack([dx, dy])
        p = p.at[jnp.asarray(self.i_pos0)].set(pos)
        p = p.at[jnp.asarray(self.i_vtil0)].set(v_til[None])
        p = p.at[jnp.asarray(self.i_tgha0)].set(tg_ha[None])
        p = p.at[jnp.asarray(self.i_dtgha0)].set(dtg_ha[None])
        return p, pos


def make_rollout_model(runner):
    """Pick the recipe for the runner's vehicle by its parameter layout."""
    veh = runner.vehicle
    names = {name for (label, name) in runner.tr.layout.parameters
             if label == veh.label}
    if {"state0", "input0"} <= names:
        return HolonomicRollout(runner)
    if {"v_til0", "tg_ha0", "pos0"} <= names:
        return DubinsRollout(runner)
    if {"pos0", "vel0", "tg_ha0", "dtg_ha0"} <= names:
        return HolonomicOrientRollout(runner)
    if {"spl0", "dspl0", "ddspl0"} <= names:
        goal = "poseT" if (veh.label, "poseT") in runner.tr.layout.parameters \
            else "positionT"
        return QuadrotorRollout(runner, goal)
    raise NotImplementedError(
        f"no rollout recipe for {type(veh).__name__} (params: {names})")
