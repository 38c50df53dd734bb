"""Example-driven integration tests (the reference's test strategy:
tests/test_examples.py:6-26 executes every example script; CI shards via
NODE_TOTAL/NODE_INDEX).

Full example runs are expensive under a fixed-iteration solver on CPU, so:
- every example is always byte-compiled (import-level sanity);
- a representative subset runs end-to-end in smoke mode (OMG_SMOKE=1, two
  MPC steps) by default;
- set OMG_RUN_EXAMPLES=1 to run ALL examples in smoke mode, sharded across
  workers with NODE_TOTAL/NODE_INDEX like the reference.
"""

import os
import py_compile
import subprocess
import sys

import pytest

# byte-compile checks run in the default tier; the smoke runs are slow

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")

ALL_EXAMPLES = sorted(
    f for f in os.listdir(EXAMPLES_DIR)
    if f.endswith(".py") and not f.startswith("_"))

# the default smoke subset covers the paths NOT already exercised by the
# unit/integration files (tests/test_vehicles.py cold-solves every vehicle
# family; running their examples too doubled the cost for no coverage);
# OMG_RUN_EXAMPLES=1 still runs the whole gallery, sharded like the
# reference's CI
DEFAULT_SUBSET = [
    "p2p_holonomic.py",            # the canonical readme closed loop
    "p2p_holonomic_blocking.py",   # fault injection (hard_stop/overrule)
    "p2p_3dquadrotor.py",          # 3D + Cube room (not in test_vehicles)
    "formation_holonomic.py",      # fleet ADMM consensus closed loop
    "gcode_example.py",            # Tool + GCode pipeline
]

if os.environ.get("OMG_RUN_EXAMPLES"):
    node_total = int(os.environ.get("NODE_TOTAL", 1))
    node_index = int(os.environ.get("NODE_INDEX", 0))
    RUN_SET = [f for i, f in enumerate(ALL_EXAMPLES)
               if i % node_total == node_index]
else:
    RUN_SET = DEFAULT_SUBSET


@pytest.mark.parametrize("fname", ALL_EXAMPLES)
def test_example_compiles(fname):
    py_compile.compile(os.path.join(EXAMPLES_DIR, fname), doraise=True)


@pytest.mark.parametrize("fname", RUN_SET)
@pytest.mark.slow
def test_example_runs(fname):
    env = dict(os.environ, OMG_SMOKE="1", MPLBACKEND="Agg")
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), "..",
                                ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
    result = subprocess.run(
        [sys.executable, fname], cwd=EXAMPLES_DIR, env=env,
        capture_output=True, text=True, timeout=1800)
    assert result.returncode == 0, \
        f"{fname} failed:\n{result.stdout[-2000:]}\n{result.stderr[-4000:]}"
