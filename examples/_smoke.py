"""Shared example driver: full closed-loop run by default, two MPC steps in
smoke mode (OMG_SMOKE=1, used by tests/test_examples.py -- the analog of the
reference's example-as-test pattern, tests/test_examples.py:6-26)."""

import os

SMOKE = bool(os.environ.get("OMG_SMOKE"))


def run(problem, simulator, n_smoke_steps=2):
    if SMOKE:
        problem.initialize(0.0)
        for _ in range(n_smoke_steps):
            simulator.update()
        return
    simulator.run()
