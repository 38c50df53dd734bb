"""Problem base class: owns the build/solve/simulate lifecycle.

Mirrors /root/reference/omgtools/problems/problem.py, with the CasADi/Ipopt
backend replaced by the transcription layer + batched interior-point solver:

- ``init()``: layout-pass transcription over all children -> flat (x, p)
  functions -> jitted IP solver (the analog of father.construct_problem +
  create_nlp, optilayer.py:180-198);
- ``solve()``: warm-start handling, parameter packing, one jitted solve,
  solver-status policing with guess reset on failure
  (problem.py:103-136,165-181);
- ``predict/simulate/sleep`` fan-out to vehicles and environment.
"""

from __future__ import annotations

import time as _time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..modeling.opti import OptiChild, OptiFather, BIG
from ..models.fleet import get_fleet_vehicles
from ..ops.solver import make_ip_solver, IPOptions
from ..execution.plotlayer import PlotLayer, mix_with_white

__all__ = ["Problem"]


class Problem(OptiChild, PlotLayer):

    def __init__(self, fleet, environment, options=None, label="problem"):
        OptiChild.__init__(self, label)
        self.fleet, self.vehicles = get_fleet_vehicles(fleet)
        self.environment = environment
        self.set_default_options()
        self.set_options(options or {})
        self.iteration = 0
        self.update_times: List[float] = []

    # -- options -----------------------------------------------------------
    def set_default_options(self):
        self.options = {
            "verbose": 2,
            "solver": "alm",  # 'alm' (default) or 'ipm'
            "solver_options": {"max_iter": 60, "tol": 1e-4},
            "dtype": "float64",
        }

    def set_options(self, options):
        for key, val in options.items():
            if key == "solver_options":
                self.options["solver_options"].update(val)
            else:
                self.options[key] = val

    # -- build -------------------------------------------------------------
    def init(self):
        self.children = (list(self.vehicles) + self.environment.obstacles
                         + [self.environment, self])
        self.father = OptiFather(self.children)
        t0 = _time.time()
        self.transcription = self.father.transcribe(self.construct)
        tr = self.transcription
        sopts = self.options["solver_options"]
        f = tr.objective
        g = tr.constraints
        # Ipopt-style gradient-based row scaling at the initial guess
        # (runs on the CPU backend when available: one-time AD)
        from ..ops.solver import gradient_row_scales
        from ..utils.devices import on_host
        from ..utils import cache as _cache
        with on_host():
            x_ref = jnp.asarray(tr.initial_guess())
            p_base = self.pack_parameters(0.0)
            p_ref = jnp.asarray(p_base)
            key = _cache.problem_fingerprint(tr, p_base)
            tr.fingerprint = key
            hit = _cache.load_tensors(key, "scales")
            if hit is not None:
                row_scale = hit["row_scale"]
                grad0 = hit["grad0"]
            else:
                row_scale = gradient_row_scales(jax.jacfwd(g), x_ref, p_ref)
                grad0 = np.asarray(jax.grad(f)(x_ref, p_ref))
                _cache.store_tensors(key, "scales",
                                     {"row_scale": row_scale,
                                      "grad0": grad0})
        obj_scale = 1.0 / max(1.0, np.max(np.abs(grad0)) / 100.0)
        self._row_scale = row_scale
        self._obj_scale = obj_scale
        self._backend = self.options.get("solver", "alm")
        if self._backend == "scipy":
            # independent CPU reference solver (parity trust anchor; the
            # analog of the reference's Ipopt backend, problem.py:113).
            # Raw units (no row scaling): feas is directly comparable to
            # the 1e-3 failure threshold below.
            from ..ops.refsolver import make_ref_solver
            self._solver = make_ref_solver(
                f, g, tr.n_x, tr.lb, tr.ub,
                tol=sopts.get("tol", 1e-7),
                max_iter=sopts.get("max_iter", 300))

            def _ref_solve(x0, p, lb, ub, st=None):
                return self._solver(np.asarray(x0), np.asarray(p),
                                    np.asarray(lb), np.asarray(ub), state0=st)

            self._jit_solve = _ref_solve
            self._jit_resolve = _ref_solve
            self._jit_reslack = _ref_solve
        elif self._backend == "ipm":
            ip_options = IPOptions(
                max_iter=sopts.get("max_iter", 60),
                tol=sopts.get("tol", 1e-4))
            self._solver = make_ip_solver(
                f, g, tr.n_x, tr.lb, tr.ub, ip_options,
                row_scale=row_scale, obj_scale=obj_scale)
            self._jit_resolve = jax.jit(
                lambda x0, p, lb, ub, st: self._solver(
                    x0, p, lb, ub, state0=st._replace(x=x0)))
            self._jit_reslack = jax.jit(
                lambda x0, p, lb, ub, st: self._solver(
                    x0, p, lb, ub, state0=st._replace(x=x0), reslack=True))
        else:
            from ..ops.alm import (make_alm_solver, ALMOptions,
                                   detect_quadratic_structure)
            alm_options = ALMOptions(
                outer_iter=sopts.get("outer_iter", 20),
                inner_iter=sopts.get("inner_iter", 16),
                tol=sopts.get("tol", 1e-3),
                feas_tol=sopts.get("feas_tol", 1e-5))
            # dense-Q structure pays off batched (TPU); the single-scenario
            # host path is faster with the AD-per-iteration generic mode
            quadratic_Q = None
            if self.options.get("exploit_structure", False):
                try:
                    quadratic_Q = detect_quadratic_structure(
                        g, tr.n_x, p_ref, f=f)
                except Exception:
                    quadratic_Q = None
            self._structure = ("quadratic" if quadratic_Q is not None
                               else "generic")
            self._solver = make_alm_solver(
                f, g, tr.n_x, tr.lb, tr.ub, alm_options,
                row_scale=row_scale, obj_scale=obj_scale,
                quadratic_Q=quadratic_Q)
            self._jit_resolve = jax.jit(
                lambda x0, p, lb, ub, st: self._solver(
                    x0, p, lb, ub, state0=st))
            self._jit_reslack = self._jit_resolve
        if self._backend != "scipy":
            self._jit_solve = jax.jit(
                lambda x0, p, lb, ub: self._solver(x0, p, lb, ub))
        self._shifted = False
        self._x_result = tr.initial_guess()
        self._ip_state = None
        self.init_transformations()
        if self.options["verbose"] >= 2:
            print(f"[{self.label}] transcribed: n_x={tr.n_x} "
                  f"n_g={tr.n_g} n_p={tr.n_p} "
                  f"({_time.time() - t0:.2f}s)")

    def init_transformations(self):
        """Precompute warm-start shift matrices (the analog of
        optilayer.py:451-468)."""
        self._primal_transform = None
        tf = getattr(self, "init_primal_transform", None)
        if tf is not None:
            self._primal_transform = self.transcription.spline_shift_matrix(tf)

    def reinitialize(self, father=None):
        """Reset warm start to a fresh init guess for the *current*
        conditions: re-runs the layout pass so straight-line spline guesses
        and hyperplane warm starts are recomputed from the present vehicle
        prediction and obstacle positions (reference problem.py:165-181)."""
        tr = self.transcription
        tr.relayout()
        self._x_result = tr.initial_guess().copy()
        self._ip_state = None

    # -- solve -------------------------------------------------------------
    def solve(self, current_time, update_time):
        current_time -= self.start_time  # relative time within the problem
        self.init_step(current_time, update_time)
        parameters = self.pack_parameters(current_time)
        t_sym = self.time_parameter(current_time)
        lb, ub = self.transcription.bounds(t_sym)
        t0 = _time.time()
        if self._ip_state is not None and self._shifted:
            # basis shift invalidated the slack correspondence: re-center
            # slacks/bound-duals, keep equality multipliers
            st = self._jit_reslack(jnp.asarray(self._x_result),
                                   jnp.asarray(parameters), lb, ub,
                                   self._ip_state)
        elif self._ip_state is not None:
            # warm start primal AND dual state from the previous MPC step
            st = self._jit_resolve(jnp.asarray(self._x_result),
                                   jnp.asarray(parameters), lb, ub,
                                   self._ip_state)
        else:
            st = self._jit_solve(jnp.asarray(self._x_result),
                                 jnp.asarray(parameters), lb, ub)
        self._shifted = False
        st = jax.tree_util.tree_map(np.asarray, st)
        t_upd = _time.time() - t0
        self._ip_state = st
        self._x_result = np.array(st.x, dtype=np.float64)  # owned copy
        self.solver_stats = {"kkt_err": float(st.kkt_err),
                             "iterations": int(st.n_iter),
                             "time": t_upd}
        if hasattr(st, "feas"):
            self.solver_stats["feas"] = float(st.feas)
        tol = self.options["solver_options"].get("tol", 1e-4)
        # failure = infeasible result (ALM: feasibility is the trust anchor;
        # IPM: overall KKT error)
        failed = (float(st.feas) > 1e-3) if hasattr(st, "feas") \
            else (float(st.kkt_err) > 100 * tol)
        if failed:
            if self.options["verbose"] >= 1:
                print(f"[{self.label}] solve did not converge "
                      f"(kkt_err={float(st.kkt_err):.2e}) -- resetting guess")
            self.reinitialize()
            # one immediate retry from the fresh guess (the analog of the
            # reference's reset_init_guess + next-period recovery, but
            # without ever EXECUTING the diverged iterate): keep whichever
            # iterate is more feasible
            st2 = self._jit_solve(jnp.asarray(self._x_result),
                                  jnp.asarray(parameters), lb, ub)
            st2 = jax.tree_util.tree_map(np.asarray, st2)
            if hasattr(st, "feas"):
                improved = float(st2.feas) < float(st.feas)
            else:  # IPM state carries no feas; compare on KKT error
                improved = float(st2.kkt_err) < float(st.kkt_err)
            if improved:
                st = st2
                self._ip_state = st
                self._x_result = np.array(st.x, dtype=np.float64)
                self.solver_stats = {"kkt_err": float(st.kkt_err),
                                     "iterations": int(st.n_iter),
                                     "time": _time.time() - t0}
                if hasattr(st, "feas"):
                    self.solver_stats["feas"] = float(st.feas)
        self.update_times.append(t_upd)
        self.iteration += 1
        if self.options["verbose"] >= 2:
            if (self.iteration - 1) % 20 == 0:
                print("----|------------|------------")
                print("%3s | %10s | %10s " % ("it", "t upd", "kkt err"))
                print("----|------------|------------")
            print("%3d | %.4e | %.4e " % (self.iteration, t_upd,
                                          float(st.kkt_err)))

    def pack_parameters(self, current_time) -> np.ndarray:
        values: Dict = {}
        for child in self.children:
            for obj, d in child.set_parameters(current_time).items():
                values[obj] = {**values.get(obj, {}), **d}
        return self.transcription.pack_parameters(values)

    def time_parameter(self, current_time):
        """Value of the 't' parameter used for constraint shutdown."""
        return float(current_time)

    def get_variables(self, child, name, x=None) -> np.ndarray:
        sl, shape = self.transcription.var_slice(child, name)
        x = self._x_result if x is None else x
        return np.asarray(x[sl]).reshape(shape)

    def set_variables(self, value, child, name):
        sl, shape = self.transcription.var_slice(child, name)
        self._x_result[sl] = np.asarray(value, dtype=np.float64).reshape(-1)

    def transform_primal_splines(self, matrix):
        self._x_result = matrix @ self._x_result
        self._shifted = True

    # -- lifecycle hooks ---------------------------------------------------
    def construct(self):
        """Declare shared symbols and let environment/vehicles register.
        Subclasses extend."""
        self.environment.init()

    def init_step(self, current_time, update_time):
        pass

    def initialize(self, current_time):
        self.start_time = current_time

    def predict(self, current_time, predict_time, sample_time, states=None,
                delay=0, enforce_states=False, enforce_inputs=False):
        if states is None:
            states = [None] * len(self.vehicles)
        if not isinstance(states, list):
            states = [states]
        if current_time == self.start_time:
            # first iteration: integrate from the current state
            enforce_states = True
        for k, vehicle in enumerate(self.vehicles):
            vehicle.predict(current_time, predict_time, sample_time,
                            states[k], delay=delay,
                            enforce_states=enforce_states,
                            enforce_inputs=enforce_inputs)

    def simulate(self, current_time, simulation_time, sample_time):
        for vehicle in self.vehicles:
            vehicle.simulate(simulation_time, sample_time)
        self.environment.simulate(simulation_time, sample_time)

    def sleep(self, current_time, sleep_time, sample_time):
        """Hold position for sleep_time (reference problem.py:187-207)."""
        for vehicle in self.vehicles:
            spline_values = vehicle.signals["state"][:, -1]
            n = len(vehicle.basis)
            coeffs = np.tile(spline_values[:vehicle.n_spl], (n, 1))
            vehicle.store(current_time, sample_time, [coeffs], sleep_time)
            vehicle.simulate(sleep_time, sample_time)
        self.environment.simulate(sleep_time, sample_time)

    # -- 'scene' plot provider (reference problem.py:213-255) ---------------
    def _scene_counts(self):
        env_s, env_l = self.environment.draw(t=-1)
        veh = []
        for vehicle in self.vehicles:
            s = sum(len(shape.draw()[0]) for shape in vehicle.shapes)
            l = sum(len(shape.draw()[1]) for shape in vehicle.shapes)
            veh.append((s, l))
        return len(env_s), len(env_l), veh

    def init_plot(self, argument, **kwargs):
        if argument != "scene":
            return None
        n_env_s, n_env_l, veh = self._scene_counts()
        n_dim = self.environment.n_dim
        lines = [{"color": "0.25"} for _ in range(n_env_s + n_env_l)]
        colors = ["tab:blue", "tab:orange", "tab:green", "tab:red",
                  "tab:purple", "tab:brown", "tab:pink", "tab:olive"]
        for k, (n_s, n_l) in enumerate(veh):
            color = colors[k % len(colors)]
            lines.append({"color": color})                      # past path
            lines.append({"color": mix_with_white(color, 60.0),
                          "linestyle": "--"})                   # predicted
            lines += [{"color": color} for _ in range(n_s + n_l)]  # shape
        ax_info = {"labels": [f"x{k}" for k in range(n_dim)],
                   "lines": lines, "aspect_equal": True}
        if n_dim == 3:
            ax_info["projection"] = "3d"
        room = self.environment.room[0]
        try:
            lims = room["shape"].get_canvas_limits()
            ax_info["xlim"] = (lims[0][0] + room["position"][0] - 0.2,
                               lims[0][1] + room["position"][0] + 0.2)
            ax_info["ylim"] = (lims[1][0] + room["position"][1] - 0.2,
                               lims[1][1] + room["position"][1] + 0.2)
        except Exception:
            pass
        return [[ax_info]]

    def update_plot(self, argument, t, **kwargs):
        if argument != "scene":
            return None
        env_s, env_l = self.environment.draw(t)
        lines = [np.asarray(a, dtype=np.float64) for a in env_s + env_l]
        for vehicle in self.vehicles:
            pose = np.atleast_2d(vehicle.signals.get(
                "pose", np.zeros((vehicle.n_dim, 1))))
            end = pose.shape[1] if t in (-1, None) else t + 1
            lines.append(pose[:vehicle.n_dim, :end])
            traj = vehicle._traj_at(t)
            if traj is not None and "pose" in traj:
                lines.append(np.atleast_2d(traj["pose"])[:vehicle.n_dim])
            else:
                lines.append(np.zeros((vehicle.n_dim, 0)))
            if "pose" in vehicle.signals:
                s, l = vehicle.draw(min(t, pose.shape[1] - 1)
                                    if t not in (-1, None) else -1)
            else:
                s, l = [], []
                for shape in vehicle.shapes:
                    ss, ll = shape.draw()
                    s += ss
                    l += ll
            lines += [np.asarray(a, dtype=np.float64) for a in s + l]
        return [[lines]]

    def compute_objective(self):
        raise NotImplementedError

    def stop_criterium(self, current_time, update_time):
        raise NotImplementedError

    def final(self):
        pass

    def store(self, current_time, update_time, sample_time):
        raise NotImplementedError

    def export(self, options=None):
        raise NotImplementedError
