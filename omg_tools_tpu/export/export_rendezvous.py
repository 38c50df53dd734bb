"""Rendezvous export: two-phase embedded ADMM runtime where the consensus
variable is the free terminal condition conT (reference
omgtools/export/export_rendezvous.py + point2point/admm/rendezvous/).

The local problem is a plain FreeEndPoint2point -- its conT block is a
regular variable block, so the exported tensors carry it and ``S_idx``
simply selects it.  z-projection and the shared knot-shift are identity
(terminal variables live outside the horizon, rendezvous.py)."""

from __future__ import annotations

import numpy as np

from .export_formation import ExportADMM

__all__ = ["ExportRendezVous"]


class ExportRendezVous(ExportADMM):

    def _local_problem(self):
        from ..problems.point2point import FreeEndPoint2point
        prob = self.problem
        veh = prob.vehicles[0]
        options = {"verbose": 0}
        if "horizon_time" in prob.options:
            options["horizon_time"] = prob.options["horizon_time"]
        free_ind = list(prob.template._free_indices)
        local = FreeEndPoint2point(veh, prob.environment.copy(), options,
                                   free_ind=None)
        local.free_ind = {veh: free_ind}
        local.set_options({"verbose": 0})
        local.init()
        return local

    def run(self):
        import jax.numpy as jnp
        from ..problems.batch import BatchedP2PRunner
        prob = self.problem
        local = self._local_problem()
        runner = BatchedP2PRunner(local, dtype=jnp.float64)
        out = self.export(runner)
        tr = runner.tr
        sl, _ = tr.var_slice(local, "conT0")
        S_idx = np.arange(sl.start, sl.stop)
        extras = {
            "S_idx": S_idx.astype(np.float64),
            "z_proj": np.asarray(prob.z_proj),
            "sh_shift": np.asarray(prob._sh_shift),
        }
        scalars = {
            "n_sh": int(prob.n_sh),
            "n_slots": int(prob.n_slots),
            "rho_admm": float(prob.rho),
            "init_iter": int(prob.init_iter),
        }
        self._append(out, extras, scalars)
        return out
