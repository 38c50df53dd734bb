"""Disk cache for expensive one-time host-side precomputation.

Problem setup runs heavy host AD (row scaling, quadratic-structure
detection, per-phase affine constraint tensors) that is a pure function of
the transcribed problem.  These are cached under ``.omg_cache/`` keyed on a
content fingerprint: layout sizes, bounds, initial guess, base parameters,
plus objective/constraint VALUES at deterministic probe points -- so any
change to the model code or its data invalidates the key.

The reference's analog is the ``codegen {'build': 'existing'}`` compiled-
solver reuse (reference omgtools/basics/optilayer.py:87-96).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

__all__ = ["problem_fingerprint", "load_tensors", "store_tensors",
           "cache_dir"]

_VERSION = "2"  # bump to invalidate all cached artifacts
# v2: frozen-horizon quadQ detection changed (frozen_idx now finds Q for
# FixedT quadrotor) -- stale has_Q=False entries must not survive.


def cache_dir():
    root = os.environ.get(
        "OMG_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".omg_cache"))
    os.makedirs(root, exist_ok=True)
    return root


def problem_fingerprint(tr, p_base, extra=""):
    """Content hash of a transcribed problem: sizes, bounds, guess, base
    parameters and probe values of (objective, constraints)."""
    import jax.numpy as jnp
    h = hashlib.md5()
    h.update(_VERSION.encode())
    h.update(extra.encode())
    h.update(np.int64(tr.n_x).tobytes())
    h.update(np.int64(tr.n_p).tobytes())
    h.update(np.asarray(tr.lb, dtype=np.float64).tobytes())
    h.update(np.asarray(tr.ub, dtype=np.float64).tobytes())
    h.update(np.asarray(tr.initial_guess(), dtype=np.float64).tobytes())
    h.update(np.asarray(p_base, dtype=np.float64).tobytes())
    rng = np.random.default_rng(12345)
    x_probe = jnp.asarray(rng.standard_normal(tr.n_x) * 0.3)
    p_probe = jnp.asarray(np.asarray(p_base, dtype=np.float64)
                          + rng.standard_normal(len(np.asarray(p_base)))
                          * 0.05)
    gv = np.asarray(tr.constraints(x_probe, p_probe), dtype=np.float64)
    fv = np.float64(tr.objective(x_probe, p_probe))
    h.update(np.round(gv, 9).tobytes())
    h.update(np.round(fv, 9).tobytes())
    return h.hexdigest()


def load_tensors(key, name):
    target = os.path.join(cache_dir(), f"{name}_{key}.npz")
    if not os.path.exists(target):
        return None
    try:
        with np.load(target, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        return None


def store_tensors(key, name, arrays):
    target = os.path.join(cache_dir(), f"{name}_{key}.npz")
    tmp = os.path.join(cache_dir(), f".tmp{os.getpid()}_{name}_{key}.npz")
    np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
    os.replace(tmp, target)
    return target
