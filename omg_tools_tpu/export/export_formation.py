"""Distributed-formation export: the two-phase embedded ADMM runtime
(reference omgtools/export/export_formation.py + export_admm.py analog).

Exports ONE local problem per vehicle type (the reference dedupes updaters
the same way, export_admm.py:28-47): the plain FixedT point-to-point
tensors (reused from the base Export) plus the consensus-ADMM data --
shared-coefficient selector ``S_idx``, closed-form z-projection matrix
``z_proj`` (terminal center-derivative stabilization, the analog of the
reference's KKT-Schur upd_z, admm.py:117-168), knot-shift transform for the
shared coefficients, and the penalty parameter.  The C++ side
(cpp/omg_admm.{hpp,cpp}) implements the reference's caller-communicates
``update1``/``update2`` API (ADMMPoint2Point.cpp:107-265)."""

from __future__ import annotations

import json
import os

import numpy as np

from .export import Export, _write_array

__all__ = ["ExportFormation", "ExportADMM"]


class ExportADMM(Export):
    """Shared machinery for ADMM-based exports (formation, rendezvous)."""

    def __init__(self, problem, options=None):
        """problem: an initialized ADMMProblem (e.g. FormationPoint2point)."""
        Export.__init__(self, problem, options)

    def _local_problem(self):
        """Plain single-vehicle FixedT p2p matching the ADMM local
        subproblem's variable layout (the z/lam consensus terms enter the
        C++ objective via hooks, not the transcription)."""
        from ..problems.point2point import FixedTPoint2point
        prob = self.problem
        veh = prob.vehicles[0]
        options = {"verbose": 0}
        if "horizon_time" in prob.options:
            options["horizon_time"] = prob.options["horizon_time"]
        local = FixedTPoint2point(veh, prob.environment.copy(), options)
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

        # shared-coefficient selector against the LOCAL transcription
        tr = runner.tr
        veh = local.vehicles[0]
        sl, shape = tr.var_slice(veh, "splines_seg0")
        n_c, n_spl = shape
        idx = np.arange(sl.start, sl.stop).reshape(n_c, n_spl)
        ind = prob.template.fleet_config_indices
        S_idx = np.concatenate([idx[:, k] for k in ind])

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

    def _append(self, out, arrays, scalars):
        manifest_path = os.path.join(out, "manifest.json")
        with open(manifest_path) as f:
            manifest = json.load(f)
        data_dir = os.path.join(out, "data")
        with open(os.path.join(out, "meta.txt"), "a") as meta:
            for key, val in scalars.items():
                manifest["scalars"][key] = val
                meta.write(f"scalar {key} {val}\n")
            for name, arr in arrays.items():
                _write_array(data_dir, name, arr, manifest)
                dims = " ".join(str(s) for s in np.asarray(arr).shape)
                meta.write(f"array {name} {np.asarray(arr).ndim} {dims}\n")
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=1)


class ExportFormation(ExportADMM):
    """Formation-specific entry point (reference export_formation.py)."""
