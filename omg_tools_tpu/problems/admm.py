"""Distributed consensus ADMM over the fleet graph, batched TPU-native.

Re-designs /root/reference/omgtools/problems/{dualmethod,admm}.py for the
accelerator: instead of N separately-compiled CasADi updaters communicating
by object reference, ONE local-problem template is transcribed and the
x-updates of all vehicles run as a single vmapped solve; the z-update is a
closed-form projection; "communication" is an index-roll along the vehicle
axis (circular fleet graph -> ppermute on a device mesh, see
parallel/fleet_mesh.py).

Algorithm (per control period, reference admm.py:584-628):
    1. x-update:   x_i = argmin f_i(x) + lam_ie'(s_i(x) - z_e)
                                 + rho/2 ||s_i(x) - z_e||^2   for all i (vmap)
       where s_i = S x_i + r_i are the vehicle's shared coefficients (its
       perceived fleet-center spline).
    2. communicate s_i along edges (roll).
    3. z-update:   z_e = P [ (s_i + lam_ie/rho + s_j + lam_je/rho) / 2 ] + q
       with P the projection onto the interconnection equalities imposed on
       z (terminal center-derivative stabilization, formation.py:59-65).
    4. lam-update: lam_ie += rho (s_i - z_e);  residuals via max-reductions.

init runs ``init_iter`` (default 5) dual updates before motion starts; then
``max_iter_per_update`` (default 1) iterations interleave with the plant
(reference dualmethod.py:200-224).

Round-1 scope: circular interconnection, homogeneous fleet, FixedT local
problems.  The reference's future-piece-only penalty (symbolic
shift_knot1_fwd inside the ADMM objective, admm.py:86-88) is not yet
applied -- the whole horizon is penalized.
"""

from __future__ import annotations

import time as _time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .point2point import FixedTPoint2point
from .problem import Problem
from ..modeling.opti import BIG
from ..models.fleet import get_fleet_vehicles

__all__ = ["ADMMProblem", "DistributedProblem"]


class _ADMMLocalP2P(FixedTPoint2point):
    """Local-problem template: FixedT p2p + ADMM augmented objective on the
    shared (fleet-center) coefficients."""

    def __init__(self, fleet, environment, options, n_slots, rho):
        self.n_slots = n_slots
        self.rho = rho
        FixedTPoint2point.__init__(self, fleet, environment, options)

    def construct(self):
        FixedTPoint2point.construct(self)
        veh = self.vehicles[0]
        config = getattr(self, "fleet_config_indices", None)
        ind_veh = config if config is not None \
            else list(range(veh.n_dim))
        rel_pos_c = veh.define_parameter("rel_pos_c", len(ind_veh))
        splines = [veh.splines[0][k] for k in ind_veh]
        center = veh.get_fleet_center(
            splines, [rel_pos_c[i] for i in range(len(ind_veh))],
            substitute=False)
        self.center_basis = center[0].basis
        n_c = len(self.center_basis)
        self.n_sh = n_c * len(center)
        s = jnp.concatenate([c.coeffs for c in center])
        z = self.define_parameter("admm_z", (self.n_slots, self.n_sh))
        lmbd = self.define_parameter("admm_l", (self.n_slots, self.n_sh))
        obj = 0.0
        for e in range(self.n_slots):
            diff = s - z[e]
            obj = obj + lmbd[e] @ diff + 0.5 * self.rho * (diff @ diff)
        self.define_objective(obj)


class DistributedProblem(Problem):
    """Base for multi-updater problems: owns the fleet, fans the lifecycle
    out to vehicles (reference distributedproblem.py:36+)."""

    def __init__(self, fleet, environment, options=None, label="distributed"):
        Problem.__init__(self, fleet, environment, options, label=label)

    def stop_criterium(self, current_time, update_time):
        return all(v.check_terminal_conditions() for v in self.vehicles)


class ADMMProblem(DistributedProblem):

    def __init__(self, fleet, environment, options=None):
        options = dict(options or {})
        self.rho = options.pop("rho", 2.0)
        self.init_iter = options.pop("init_iter", 5)
        self.max_iter_per_update = options.pop("max_iter_per_update", 1)
        DistributedProblem.__init__(self, fleet, environment, options,
                                    label="admm")
        if self.fleet.interconnection != "circular":
            raise NotImplementedError(
                "round 1 supports the circular fleet graph")
        self.N = self.fleet.N
        self.n_slots = 2 if self.N > 2 else 1

    # -- subclass hooks (defaults = formation-center consensus) ------------
    def _make_template(self):
        tmpl = _ADMMLocalP2P(
            self.vehicles[0], self.environment.copy(), dict(self.options),
            n_slots=self.n_slots, rho=self.rho)
        cfg = self.fleet.configuration[self.vehicles[0]]
        tmpl.fleet_config_indices = sorted(cfg.keys())
        return tmpl

    def _shared_selector(self):
        """Indices of the shared coefficients within the local x."""
        tmpl, tr = self.template, self.template.transcription
        sl, shape = tr.var_slice(tmpl.vehicles[0], "splines_seg0")
        n_c, n_spl = shape
        idx = np.arange(sl.start, sl.stop).reshape(n_c, n_spl)
        ind = tmpl.fleet_config_indices
        return np.concatenate([idx[:, k] for k in ind])

    def _z_projection(self):
        """Projection of the z average onto the interconnection equalities
        imposed on z: terminal center-derivative stabilization
        (formation.py:59-65)."""
        tmpl = self.template
        basis = tmpl.center_basis
        ind = tmpl.fleet_config_indices
        rows = []
        for d in range(1, basis.degree + 1):
            Bd, P = basis.derivative(d)
            end_row = Bd.eval(np.array([basis.domain[1]]))[0] @ P
            rows.append(end_row)
        A1 = np.vstack(rows)                       # (deg, n_c)
        A = np.kron(np.eye(len(ind)), A1)          # (deg*dims, n_sh)
        AAt = A @ A.T
        return np.eye(self.n_sh) - A.T @ np.linalg.solve(AAt, A)

    def _shared_shift(self):
        """Knot-passage shift for the shared coefficients."""
        tmpl = self.template
        Tc = tmpl.center_basis.shiftoverknot_T()
        return np.kron(np.eye(len(tmpl.fleet_config_indices)), Tc)

    # -- build -------------------------------------------------------------
    def init(self):
        veh0 = self.vehicles[0]
        for veh in self.vehicles:
            if type(veh) is not type(veh0):
                raise NotImplementedError("homogeneous fleets only")
        self.template = self._make_template()
        self.template.set_options({"verbose": 0})
        self.template.init()
        tmpl = self.template
        tr = tmpl.transcription
        self.n_x = tr.n_x
        self.n_sh = tmpl.n_sh
        self.S_idx = self._shared_selector()
        self.z_proj = self._z_projection()

        # per-vehicle warm-start shift matrices
        self._x_shift = tr.spline_shift_matrix(
            lambda b: b.shiftoverknot_T())
        self._sh_shift = self._shared_shift()

        # ADMM state
        self.X = np.tile(tr.initial_guess()[None, :], (self.N, 1))
        for i, veh in enumerate(self.vehicles):
            init = self._init_guess_for(veh)
            if init is not None:
                self.X[i] = init
        n_edges = self.N if self.N > 2 else 1
        self.n_edges = n_edges
        self.Z = np.zeros((n_edges, self.n_sh))
        for e in range(n_edges):
            i, j = e, (e + 1) % self.N
            self.Z[e] = 0.5 * (self._s_of(self.X[i], i)
                               + self._s_of(self.X[j], j))
        self.L = np.zeros((self.N, self.n_slots, self.n_sh))
        self._alm_state = None
        self.residuals: List = []
        lb, ub = tr.bounds(0.0)
        self._lbj, self._ubj = lb, ub
        self._vsolve = jax.jit(jax.vmap(
            lambda x, p: tmpl._solver(x, p, self._lbj, self._ubj)))
        self._vresolve = jax.jit(jax.vmap(
            lambda x, p, st: tmpl._solver(x, p, self._lbj, self._ubj,
                                          state0=st)))
        self.iteration = 0
        self.update_times = []
        if self.options["verbose"] >= 1:
            print(f"[admm] template n_x={tr.n_x} n_g={tr.n_g} "
                  f"N={self.N} n_sh={self.n_sh}")

    def _init_guess_for(self, veh):
        try:
            init = veh.get_init_spline_value()
        except AttributeError:
            return None
        tr = self.template.transcription
        x = tr.initial_guess().copy()
        sl, shape = tr.var_slice(self.template.vehicles[0], "splines_seg0")
        x[sl] = np.asarray(init[0]).reshape(-1)
        return x

    def _rel_offsets(self, i):
        """Per-coefficient shared offset r_i (rel_pos_c broadcast)."""
        veh = self.vehicles[i]
        n_c = len(self.template.center_basis)
        return np.concatenate([np.full(n_c, rp) for rp in veh.rel_pos_c])

    def _s_of(self, x, i):
        return x[self.S_idx] + self._rel_offsets(i)

    # -- parameter packing -------------------------------------------------
    def _pack_params(self, current_time):
        tmpl = self.template
        tr = tmpl.transcription
        P = np.zeros((self.N, tr.n_p))
        tmpl_children = {
            "vehicle": tmpl.vehicles[0],
            "problem": tmpl,
        }
        for i, veh in enumerate(self.vehicles):
            values: Dict = {}
            vpars = veh.set_parameters(current_time)[veh]
            vpars["rel_pos_c"] = np.asarray(veh.rel_pos_c)
            values[tmpl.vehicles[0].label] = vpars
            for obs_t, obs in zip(tmpl.environment.obstacles,
                                  self.environment.obstacles):
                values[obs_t.label] = obs.set_parameters(current_time)[obs]
            ppars = tmpl.set_parameters(current_time)[tmpl]
            slots = self._slot_edges(i)
            ppars["admm_z"] = self.Z[slots]
            ppars["admm_l"] = self.L[i]
            values[tmpl.label] = ppars
            P[i] = tr.pack_parameters(values)
        return P

    def _slot_edges(self, i):
        """Edge indices for vehicle i's slots [next, prev]."""
        if self.N == 2:
            return np.array([0])
        return np.array([i, (i - 1) % self.N])

    # -- the ADMM iteration -------------------------------------------------
    def dual_update(self, current_time):
        P = self._pack_params(current_time)
        Xj = jnp.asarray(self.X)
        Pj = jnp.asarray(P)
        if self._alm_state is None:
            st = self._vsolve(Xj, Pj)
        else:
            st = self._vresolve(Xj, Pj, self._alm_state)
        self._alm_state = jax.tree_util.tree_map(jnp.asarray, st)
        self.X = np.asarray(st.x, dtype=np.float64)
        # shared coefficients
        S = np.stack([self._s_of(self.X[i], i) for i in range(self.N)])
        # z-update (communicate = roll along the vehicle axis)
        rho = self.rho
        if self.N == 2:
            avg = 0.5 * (S[0] + self.L[0, 0] / rho + S[1] + self.L[1, 0] / rho)
            Z_new = (self.z_proj @ avg)[None, :]
        else:
            slot_next = self.L[:, 0, :]            # lam_{i, edge i}
            slot_prev = np.roll(self.L[:, 1, :], -1, axis=0)  # lam_{i+1, edge i}
            S_next = np.roll(S, -1, axis=0)
            avg = 0.5 * (S + slot_next / rho + S_next + slot_prev / rho)
            Z_new = avg @ self.z_proj.T
        dual_res = rho * float(np.max(np.abs(Z_new - self.Z))) \
            if self.Z is not None else np.inf
        self.Z = Z_new
        # lam-update
        for i in range(self.N):
            for k, e in enumerate(self._slot_edges(i)):
                self.L[i, k] += rho * (S[i] - self.Z[e])
        pri_res = max(float(np.max(np.abs(S[i] - self.Z[e])))
                      for i in range(self.N)
                      for e in self._slot_edges(i))
        self.residuals.append((pri_res, dual_res))
        return pri_res, dual_res

    # -- residual plot provider (reference admm.py:634-670) -----------------
    def init_plot(self, argument, **kwargs):
        if argument != "residuals":
            return super().init_plot(argument, **kwargs)
        return [[{"labels": ["iteration", "log10(primal res)"],
                  "lines": [{"color": "tab:blue"}]}],
                [{"labels": ["iteration", "log10(dual res)"],
                  "lines": [{"color": "tab:orange"}]}]]

    def update_plot(self, argument, t, **kwargs):
        if argument != "residuals":
            return super().update_plot(argument, t, **kwargs)
        res = np.asarray(self.residuals, dtype=np.float64)
        if res.size == 0:
            empty = np.zeros((2, 0))
            return [[[empty]], [[empty]]]
        it = np.arange(res.shape[0])
        with np.errstate(divide="ignore"):
            logres = np.log10(np.maximum(res, 1e-300))
        return [[[np.vstack([it, logres[:, 0]])]],
                [[np.vstack([it, logres[:, 1]])]]]

    # -- lifecycle (Problem API) -------------------------------------------
    def initialize(self, current_time):
        self.start_time = current_time
        self.current_time_prev = current_time
        for _ in range(self.init_iter):
            self.dual_update(current_time)

    def solve(self, current_time, update_time):
        current_time -= self.start_time
        t0 = _time.time()
        self.init_step(current_time, update_time)
        for _ in range(self.max_iter_per_update):
            pri, dua = self.dual_update(current_time)
        t_upd = _time.time() - t0
        self.update_times.append(t_upd)
        self.iteration += 1
        if self.options["verbose"] >= 2:
            if (self.iteration - 1) % 20 == 0:
                print("----|------------|------------|------------")
                print("%3s | %10s | %10s | %10s" %
                      ("it", "t upd", "pri res", "dual res"))
                print("----|------------|------------|------------")
            print("%3d | %.4e | %.4e | %.4e" %
                  (self.iteration, t_upd, pri, dua))

    def init_step(self, current_time, update_time):
        knot_time = self.template.knot_time
        interval_prev = int(np.round(self.current_time_prev / knot_time, 6))
        interval_now = int(np.round(current_time / knot_time, 6))
        if interval_prev < interval_now:
            self.X = self.X @ self._x_shift.T
            self.Z = self.Z @ self._sh_shift.T
            self.L = self.L @ self._sh_shift.T
            self._alm_state = None
        self.current_time_prev = current_time
        self.template.current_time_prev = current_time

    def time_parameter(self, current_time):
        return self.template.time_parameter(current_time)

    def predict(self, current_time, predict_time, sample_time, states=None,
                delay=0, enforce_states=False, enforce_inputs=False):
        if states is None:
            states = [None] * self.N
        if current_time == self.start_time:
            enforce_states = True
        for k, vehicle in enumerate(self.vehicles):
            vehicle.predict(current_time, predict_time, sample_time,
                            states[k], delay=delay,
                            enforce_states=enforce_states,
                            enforce_inputs=enforce_inputs)

    def store(self, current_time, update_time, sample_time):
        tmpl = self.template
        horizon_time = tmpl.options["horizon_time"]
        rel_current_time = np.round(current_time - self.start_time, 6) \
            % tmpl.knot_time
        n_samp = int(round(
            (horizon_time - rel_current_time) / sample_time, 6)) + 1
        time_axis = np.linspace(rel_current_time,
                                rel_current_time + (n_samp - 1) * sample_time,
                                n_samp)
        sl, shape = tmpl.transcription.var_slice(tmpl.vehicles[0],
                                                 "splines_seg0")
        for i, veh in enumerate(self.vehicles):
            coeffs = self.X[i][sl].reshape(shape)
            veh.store(current_time, sample_time, [coeffs], horizon_time,
                      time_axis)

    def simulate(self, current_time, simulation_time, sample_time):
        for vehicle in self.vehicles:
            vehicle.simulate(simulation_time, sample_time)
        self.environment.simulate(simulation_time, sample_time)

    def compute_objective(self):
        return float("nan")

    def final(self):
        if self.options["verbose"] >= 1:
            print("\nWe reached our target!")
            if self.update_times:
                print("%-18s %6g ms" % ("Max update time:",
                                        max(self.update_times) * 1000.0))
                print("%-18s %6g ms" % (
                    "Av update time:",
                    sum(self.update_times) * 1000.0 / len(self.update_times)))
