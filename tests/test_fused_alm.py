"""Fused Pallas ALM inner loop (ops/fused_alm.py): plan construction, the
XLA fallback path, and interpret-mode kernel equivalence vs the compact
XLA inner loop.  On TPU the kernel itself runs per outer round inside the
batched rollout; here (CPU suite) the kernel executes via the pallas
interpreter, checked in f64 where the two implementations must agree to
roundoff (f32 differences are reassociation noise on ill-conditioned
Newton systems, bounded instead by the bench parity gates)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omg_tools_tpu import (Holonomic, Environment, Obstacle, Circle,
                           Rectangle, Square, Point2point)

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def bench_problem():
    """The canonical bench configuration (readme example: two rectangles +
    one circle, ref readme.md:195-229)."""
    veh = Holonomic()
    veh.set_initial_conditions([-1.5, -1.5])
    veh.set_terminal_conditions([2.0, 2.0])
    env = Environment(room={"shape": Square(5.0)})
    env.add_obstacle(Obstacle({"position": [-2.1, -0.5]},
                              shape=Rectangle(width=3.0, height=0.2)))
    env.add_obstacle(Obstacle({"position": [1.7, -0.5]},
                              shape=Rectangle(width=3.0, height=0.2)))
    env.add_obstacle(Obstacle({"position": [1.5, 0.5]}, shape=Circle(0.4)))
    prob = Point2point(veh, env, freeT=False)
    prob.set_options({"verbose": 0})
    prob.init()
    return prob


def _batch(runner, B=4, seed=0):
    rng = np.random.default_rng(seed)
    starts = np.tile([-1.5, -1.5], (B, 1)) + rng.uniform(-0.3, 0.3, (B, 2))
    goals = np.tile([2.0, 2.0], (B, 1)) + rng.uniform(-0.3, 0.3, (B, 2))
    return runner.make_batch(starts, goals)


def test_fused_plan_built(bench_problem):
    """The f32 runner builds a FusedPlan with deduplicated tensor tables."""
    from omg_tools_tpu.problems.batch import BatchedP2PRunner
    r = BatchedP2PRunner(bench_problem, dtype=jnp.float32)
    assert r.structure == "compact-arrow-fused"
    plan = r.fused_plan
    # per-obstacle families share tensors: far fewer uniques than families
    assert len(plan.uA) < len(plan.fams)
    assert len(plan.uQ) <= 2
    assert plan.vmem_estimate() < 14 * 2 ** 20
    # every family is classified and mapped
    kinds = {f.kind for f in plan.fams}
    assert kinds <= {"const", "param", "quad"}
    for f in plan.fams:
        assert f.iA >= 0
        if f.kind == "const":
            assert f.iP >= 0


def test_fused_fallback_matches_legacy_compact(bench_problem):
    """CPU path: solver with fshared (vmap of the unbatched XLA fallback)
    must match the legacy resolve_phase compact path bit-for-bit (same
    operations, different plumbing)."""
    from omg_tools_tpu.problems.batch import BatchedP2PRunner
    from omg_tools_tpu.ops.alm import ALMOptions
    r = BatchedP2PRunner(bench_problem, dtype=jnp.float32,
                         alm_options=ALMOptions(inner_iter=4))
    assert r.fused_plan is not None
    x0, p0, state = _batch(r)
    consts = r.consts()
    st_fused = jax.jit(r.init_solver_state)(x0, p0, consts)

    r.fused_plan = None           # legacy ct path
    st_legacy = jax.jit(r.init_solver_state)(x0, p0,
                                             consts._replace(FS=None))
    assert np.max(np.abs(np.asarray(st_fused.x)
                         - np.asarray(st_legacy.x))) < 1e-6
    assert np.max(np.abs(np.asarray(st_fused.feas)
                         - np.asarray(st_legacy.feas))) < 1e-8


def test_fused_kernel_interpret_matches_xla_f64(bench_problem):
    """The pallas kernel (interpret mode, f64) agrees with the XLA compact
    inner loop to roundoff over multiple outer rounds."""
    from omg_tools_tpu.problems.batch import BatchedP2PRunner
    from omg_tools_tpu.ops.alm import ALMOptions
    from omg_tools_tpu.ops.fused_alm import FusedPlan

    r = BatchedP2PRunner(bench_problem, dtype=jnp.float64,
                         alm_options=ALMOptions(inner_iter=2))
    plan = FusedPlan(r.compact)
    r.fused_plan = plan
    x0, p0, state = _batch(r)
    consts = r.consts()
    fs0 = FusedPlan.slice_phase(consts.FS, 0)

    def run(force_interp):
        os.environ["OMG_FUSED_INTERPRET"] = "1" if force_interp else "0"
        solver = r.make_solver(ALMOptions(inner_iter=2))
        solve = jax.jit(jax.vmap(lambda x, p: solver(
            x, p, consts.lb, consts.ub, outer_iter=3, fshared=fs0)))
        return solve(x0, p0)

    try:
        st_ref = run(False)
        st_k = run(True)
    finally:
        os.environ.pop("OMG_FUSED_INTERPRET", None)
    dx = np.max(np.abs(np.asarray(st_k.x) - np.asarray(st_ref.x)))
    assert dx < 1e-8, dx
    dfeas = np.max(np.abs(np.asarray(st_k.feas)
                          - np.asarray(st_ref.feas)))
    assert dfeas < 1e-9, dfeas
