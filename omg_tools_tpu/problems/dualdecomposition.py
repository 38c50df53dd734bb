"""Distributed consensus via dual decomposition (subgradient ascent).

Reference: /root/reference/omgtools/problems/dualdecomposition.py implements
DD with a combined x,z local update (neighbor copies as local variables).
Here the classic dual-subgradient form of the same consensus problem is
used, which maps directly onto the batched template machinery:

    x-update:  x_i = argmin f_i(x) + (sum_j lam_ij - lam_ji)' s_i(x)
    dual:      lam_ij += alpha * (s_i - s_j)      (edge subgradient step)

The aggregated multiplier mu_i = sum_j (lam_ij - lam_ji) is the only
quantity the local problem needs, so the template gets one extra parameter
block.  Communication is the same vehicle-axis roll as the ADMM engine.
"""

from __future__ import annotations

import time as _time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .admm import ADMMProblem, _ADMMLocalP2P
from .point2point import FixedTPoint2point

__all__ = ["DDProblem", "FormationPoint2pointDualDecomposition"]


class _DDLocalP2P(FixedTPoint2point):
    """Local template: FixedT p2p + linear dual term on the shared
    (fleet-center) coefficients."""

    def __init__(self, fleet, environment, options):
        FixedTPoint2point.__init__(self, fleet, environment, options)

    def construct(self):
        FixedTPoint2point.construct(self)
        veh = self.vehicles[0]
        ind_veh = getattr(self, "fleet_config_indices",
                          list(range(veh.n_dim)))
        rel_pos_c = veh.define_parameter("rel_pos_c", len(ind_veh))
        splines = [veh.splines[0][k] for k in ind_veh]
        center = veh.get_fleet_center(
            splines, [rel_pos_c[i] for i in range(len(ind_veh))],
            substitute=False)
        self.center_basis = center[0].basis
        self.n_sh = len(self.center_basis) * len(center)
        s = jnp.concatenate([c.coeffs for c in center])
        mu = self.define_parameter("dd_mu", self.n_sh)
        self.define_objective(mu @ s)


class DDProblem(ADMMProblem):
    """Dual decomposition on the circular fleet graph, batched."""

    def __init__(self, fleet, environment, options=None):
        options = dict(options or {})
        self.alpha = options.pop("alpha", 0.5)  # dual step size
        ADMMProblem.__init__(self, fleet, environment, options)

    def _make_template(self, vehicle):
        tmpl = _DDLocalP2P(vehicle, self.environment.copy(),
                           dict(self.options))
        cfg = self.fleet.configuration[vehicle]
        tmpl.fleet_config_indices = sorted(cfg.keys())
        return tmpl

    def init(self):
        ADMMProblem.init(self)
        # per-directed-edge multipliers lam[i, slot]; mu_i aggregates them
        self.L = np.zeros((self.N, self.n_slots, self.n_sh))

    def _mu(self, i):
        """mu_i = sum over incident edges of (lam_i,edge - lam_other,edge)."""
        mu = np.zeros(self.n_sh)
        if self.N == 2:
            other = 1 - i
            mu += self.L[i, 0] - self.L[other, 0]
            return mu
        nxt, prv = (i + 1) % self.N, (i - 1) % self.N
        mu += self.L[i, 0] - self.L[nxt, 1]   # edge i (with next)
        mu += self.L[i, 1] - self.L[prv, 0]   # edge i-1 (with prev)
        return mu

    def _pack_params(self, group, current_time):
        tmpl = group.template
        tr = tmpl.transcription
        P = np.zeros((len(group.indices), tr.n_p))
        for row, i in enumerate(group.indices):
            veh = self.vehicles[i]
            values = {}
            vpars = veh.set_parameters(current_time)[veh]
            vpars["rel_pos_c"] = np.asarray(veh.rel_pos_c)
            values[tmpl.vehicles[0].label] = vpars
            for obs_t, obs in zip(tmpl.environment.obstacles,
                                  self.environment.obstacles):
                values[obs_t.label] = obs.set_parameters(current_time)[obs]
            ppars = tmpl.set_parameters(current_time)[tmpl]
            ppars["dd_mu"] = self._mu(i)
            values[tmpl.label] = ppars
            P[row] = tr.pack_parameters(values)
        return P

    def dual_update(self, current_time):
        for group in self.groups:
            P = self._pack_params(group, current_time)
            Xj = jnp.asarray(group.X)
            Pj = jnp.asarray(P)
            if group.alm_state is None:
                st = group.vsolve(Xj, Pj)
            else:
                st = group.vresolve(Xj, Pj, group.alm_state)
            group.alm_state = jax.tree_util.tree_map(jnp.asarray, st)
            group.X = np.asarray(st.x, dtype=np.float64)
        S = np.stack([self._s_of_vehicle(i) for i in range(self.N)])
        # dual subgradient step along each edge (communicate = roll)
        if self.N == 2:
            diff = S[0] - S[1]
            self.L[0, 0] += self.alpha * diff
            self.L[1, 0] -= self.alpha * diff
            pri = float(np.max(np.abs(diff)))
        else:
            diff_next = S - np.roll(S, -1, axis=0)   # s_i - s_{i+1} (edge i)
            self.L[:, 0, :] += self.alpha * diff_next
            self.L[:, 1, :] -= self.alpha * np.roll(diff_next, 1, axis=0)
            pri = float(np.max(np.abs(diff_next)))
        self.residuals.append((pri, float("nan")))
        return pri, float("nan")



class FormationPoint2pointDualDecomposition(DDProblem):
    """Formation control via dual decomposition
    (reference formation_dualdec.py)."""

    def get_interaction_error(self):
        from .formation import FormationPoint2point
        return FormationPoint2point.get_interaction_error(self)

    def final(self):
        DDProblem.final(self)
        if self.options["verbose"] >= 1:
            err = self.get_interaction_error()
            print("%-18s %6g %%" % ("Formation error:", err * 100.0))
