"""Multi-host (DCN) path: 2 real processes x 4 virtual CPU devices each,
joined by jax.distributed, running the hybrid (data, fleet) program of
tools/multihost_launch.py.  The single-process 8-device run in THIS
process is the reference; the children's process-local checksums must
reproduce it shard-for-shard.

This is the dryrun-form validation of the pod deployment story (VERDICT
round-1 missing item 9): same script per host, fleet-axis collectives
host-local (ICI), scenario axis across hosts (DCN).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

REPO = os.path.join(os.path.dirname(__file__), "..")
LAUNCHER = os.path.join(REPO, "tools", "multihost_launch.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_fleet(N=4, B=2):
    """Run the identical hybrid fleet program single-process on the
    8-device CPU mesh."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from multihost_launch import build_formation
    from omg_tools_tpu.parallel.multihost import (hybrid_mesh,
                                                  make_hybrid_dual_update,
                                                  shard_hybrid_state)
    mesh = hybrid_mesh(fleet_size=N)
    admm = build_formation(N)
    grp = admm.groups[0]
    step, rel = make_hybrid_dual_update(admm, mesh, outer_iter=1)
    P0 = admm._pack_params(grp, 0.0)
    X = jnp.broadcast_to(jnp.asarray(grp.X), (B,) + grp.X.shape)
    Pp = jnp.broadcast_to(jnp.asarray(P0), (B,) + P0.shape)
    Z = jnp.broadcast_to(jnp.asarray(admm.Z), (B,) + admm.Z.shape)
    L = jnp.broadcast_to(jnp.asarray(admm.L), (B,) + admm.L.shape)
    relb = jnp.broadcast_to(rel, (B,) + rel.shape)
    X, Pp, Z, L, relb = shard_hybrid_state(mesh, X, Pp, Z, L, relb)
    Xn, Zn, Ln, pri, dua = step(X, Pp, Z, L, relb)
    return np.asarray(Xn), float(pri), float(dua)


@pytest.mark.slow
def test_two_process_hybrid_fleet():
    Xref, pri_ref, dua_ref = _reference_fleet()
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device count
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, LAUNCHER, "--coordinator",
             f"localhost:{port}", "--num-processes", "2", "--process-id",
             str(pid), "--program", "fleet", "--cpu-devices", "4",
             "--fleet-n", "4", "--batch", "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=REPO, text=True))
    results = {}
    for p in procs:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, f"launcher failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines()
                if ln.startswith("MULTIHOST_RESULT ")]
        assert line, f"no result line:\n{out[-3000:]}"
        r = json.loads(line[-1][len("MULTIHOST_RESULT "):])
        results[r["process_id"]] = r

    assert set(results) == {0, 1}
    for r in results.values():
        assert r["distributed"] is True
        assert r["num_processes"] == 2
        assert r["mesh"] == {"data": 2, "fleet": 4}
        assert r["x_shape"] == list(Xref.shape)
        # global residuals agree across hosts and with the reference
        assert abs(r["pri"] - pri_ref) < 1e-6 * max(1.0, abs(pri_ref))
        assert abs(r["dua"] - dua_ref) < 1e-6 * max(1.0, abs(dua_ref))
    # data row p lives on host p: local checksums reproduce the reference
    for pid in (0, 1):
        want = float(np.sum(Xref[pid]))
        got = results[pid]["x_local_sum"]
        assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (pid, got,
                                                             want)
