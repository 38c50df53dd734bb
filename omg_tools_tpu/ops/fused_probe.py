"""Runtime-capability probe for the fused Pallas ALM kernel.

Some TPU runtimes wedge INDEFINITELY inside the Mosaic compile / first
execution of the fused inner-loop kernel (observed 2026-08-22 on an
axon-tunneled v5e container: the host thread blocks on the tunnel socket
forever while a trivial pallas_call on the same service completes fine).
A blocked XLA call cannot be cancelled in-process, so the only safe
detection is running a miniature end-to-end fused solve in a CHILD process
under a timeout.  The verdict is cached per (device kind, jax version) in
``.omg_cache/fused_probe.json`` so the cost (~1-3 min on a healthy
runtime, the full timeout on a broken one) is paid once per container.

``OMG_FUSED_PROBE=0`` skips the probe (treat the kernel as usable -- this
is also how the child avoids recursing into itself);
``OMG_DISABLE_FUSED=1`` (checked by problems/batch.py) avoids the fused
path entirely without probing.
"""

import json
import os
import subprocess
import sys

_PROBE_TIMEOUT_S = int(os.environ.get("OMG_FUSED_PROBE_TIMEOUT", "420"))

# miniature end-to-end fused solve: tiny holonomic p2p (one circle
# obstacle so the plan has param/quad families), B=128 (one lane tile),
# 2 inner iterations -- enough to force the Mosaic compile AND one real
# execution of the kernel
_PROBE_BODY = r'''
import os
os.environ["OMG_FUSED_PROBE"] = "0"
import numpy as np, jax, jax.numpy as jnp
from omg_tools_tpu.utils.devices import enable_host_backend
enable_host_backend()
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Circle,
                           Square, Point2point)
v = Holonomic()
v.set_initial_conditions([-1.5, -1.5])
v.set_terminal_conditions([2.0, 2.0])
env = Environment(room={"shape": Square(5.0)})
env.add_obstacle(Obstacle({"position": [1.5, 0.5]}, shape=Circle(0.4)))
pr = Point2point(v, env, freeT=False)
pr.set_options({"verbose": 0})
pr.init()
from omg_tools_tpu.problems.batch import BatchedP2PRunner
from omg_tools_tpu.ops.alm import ALMOptions
r = BatchedP2PRunner(pr, dtype=jnp.float32,
                     alm_options=ALMOptions(inner_iter=2))
assert r.fused_plan is not None, "fused plan did not build"
rng = np.random.default_rng(0)
B = 128
s = np.tile([-1.5, -1.5], (B, 1)) + rng.uniform(-.1, .1, (B, 2))
g = np.tile([2.0, 2.0], (B, 1)) + rng.uniform(-.1, .1, (B, 2))
x0, p0, st = r.make_batch(s, g)
consts = jax.device_put(r.consts())
out = jax.jit(r.init_solver_state)(x0, p0, consts)
jax.block_until_ready(out.x)
assert np.isfinite(np.asarray(out.x)).all(), "fused solve returned non-finite"
print("FUSED_PROBE_OK")
'''


def _cache_path():
    from ..utils.cache import cache_dir
    return os.path.join(cache_dir(), "fused_probe.json")


def _key():
    import jax
    try:
        kind = str(jax.devices()[0].device_kind)
    except Exception:
        kind = "unknown"
    return f"{kind}|jax-{jax.__version__}"


def fused_kernel_ok(verbose=True):
    """True iff the fused Pallas kernel compiles and executes end-to-end
    on this backend within the probe timeout (cached verdict)."""
    if os.environ.get("OMG_FUSED_PROBE", "1") == "0":
        return True
    key = _key()
    path = _cache_path()
    try:
        with open(path) as f:
            cached = json.load(f)
        if key in cached:
            return bool(cached[key])
    except Exception:
        cached = {}
    if verbose:
        print(f"[omg] probing fused-kernel support on {key.split('|')[0]} "
              f"(one-time, <= {_PROBE_TIMEOUT_S}s)...", flush=True)
    env = dict(os.environ, OMG_FUSED_PROBE="0")
    ok = False
    try:
        res = subprocess.run([sys.executable, "-c", _PROBE_BODY],
                             env=env, capture_output=True, text=True,
                             timeout=_PROBE_TIMEOUT_S)
        ok = res.returncode == 0 and "FUSED_PROBE_OK" in res.stdout
        if not ok and verbose:
            print(f"[omg] fused-kernel probe FAILED (rc={res.returncode}); "
                  "falling back to the unfused compact-arrow path\n"
                  + res.stderr[-500:], flush=True)
    except subprocess.TimeoutExpired:
        if verbose:
            print(f"[omg] fused-kernel probe HUNG past {_PROBE_TIMEOUT_S}s "
                  "(runtime wedges on the Mosaic kernel); falling back to "
                  "the unfused compact-arrow path", flush=True)
    except Exception as exc:   # pragma: no cover - probe infra failure
        if verbose:
            print(f"[omg] fused-kernel probe errored ({exc}); "
                  "falling back", flush=True)
    try:
        cached[key] = bool(ok)
        with open(path, "w") as f:
            json.dump(cached, f)
    except Exception:
        pass
    return ok
