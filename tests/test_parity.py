"""Trajectory parity vs the independent CPU reference solver.

BASELINE.md's parity target: control sequences of the TPU-side solvers must
match a trusted reference NLP solver within tolerance at the 10 Hz regime
(the reference framework anchors on CasADi+Ipopt at
/root/reference/omgtools/problems/problem.py:113; scipy SLSQP fills that
role here -- ops/refsolver.py).  These tests run on the CPU backend in f64;
the bench repeats the rollout check on real TPU hardware in f32 and reports
``parity_max_err`` in its JSON line.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from parity import (build_p2p_holonomic, rollout_parity,  # noqa: E402
                    _reference_rollout, openloop_parity)

# default tier module; individual hogs carry @pytest.mark.slow


def test_single_solve_agreement():
    """One cold solve: the ALM solution must be feasible and match the
    reference's objective value (the NLP has flat directions, so compare
    objectives, not coefficient vectors)."""
    pa = build_p2p_holonomic("alm")
    ps = build_p2p_holonomic("scipy")
    for pb in (pa, ps):
        pb.initialize(0.0)
        pb.solve(0.0, 0.1)
    tr = pa.transcription
    p = jnp.asarray(pa.pack_parameters(0.0))
    f_alm = float(tr.objective(jnp.asarray(pa._x_result), p))
    f_ref = float(ps.transcription.objective(jnp.asarray(ps._x_result),
                                             jnp.asarray(ps.pack_parameters(0.0))))
    assert pa.solver_stats["feas"] < 1e-3
    assert ps.solver_stats["feas"] < 1e-3
    # same optimum within solver tolerances (objective = terminal L1 slack)
    assert abs(f_alm - f_ref) < 5e-3 * max(1.0, abs(f_ref))


def test_openloop_control_parity():
    """The gating metric: at every step along the reference trajectory the
    device solver (bench iteration budgets) commands a next state within
    tolerance of the reference optimum -- per-solve error, free of
    closed-loop compounding and obstacle-side plan multiplicity."""
    problem = build_p2p_holonomic("alm")
    from omg_tools_tpu.problems.batch import BatchedP2PRunner
    from omg_tools_tpu.ops.alm import ALMOptions
    runner = BatchedP2PRunner(problem, dtype=jnp.float32,
                              alm_options=ALMOptions(inner_iter=5))
    start = np.array([-1.5, -1.5])
    goal = np.array([2.0, 2.0])
    x0, p0, _ = runner.make_batch(start[None, :], goal[None, :])
    x0n = np.asarray(x0[0], np.float64)
    p0n = np.asarray(p0[0], np.float64)
    res = openloop_parity(runner, x0n, p0n, 12,
                          budgets=((2, 8), (1, 6)))
    assert res["ref_feas_max"] < 1e-3, "reference must stay feasible"
    assert res["openloop_max_err"] < 0.02, res["per_step"]
    assert float(np.percentile(res["per_step"], 90)) < 5e-3, res["per_step"]


@pytest.mark.slow
def test_rollout_parity_closed_loop():
    """The bench hot path (batched device rollout) tracks the reference
    closed loop: max state deviation below 5 cm over 2 s at 10 Hz
    (trajectories are ~4 m long)."""
    problem = build_p2p_holonomic("alm")
    from omg_tools_tpu.problems.batch import BatchedP2PRunner
    runner = BatchedP2PRunner(problem, dtype=jnp.float32)
    res = rollout_parity(runner, n_steps=12, outer_iter=1)
    assert res["ref_feas_max"] < 1e-3, "reference rollout must stay feasible"
    assert res["parity_max_err"] < 0.05, (
        f"device rollout deviates from the reference closed loop by "
        f"{res['parity_max_err']:.4f}")
