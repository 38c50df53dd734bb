#!/usr/bin/env python
"""Trajectory-parity harness vs the independent CPU reference solver.

BASELINE.md's parity target: closed-loop control sequences of the TPU
solver must match a trusted reference NLP solver within tolerance at the
10 Hz regime (the reference framework anchors on CasADi+Ipopt,
/root/reference/omgtools/problems/problem.py:113; CasADi is unavailable
here, so scipy SLSQP fills the role -- see omg_tools_tpu/ops/refsolver.py).

Two harnesses:

- ``closedloop_parity``: the full host Simulator loop (predict -> solve ->
  store -> plant simulate) run twice on the canonical p2p_holonomic
  configuration, once with the ALM backend and once with the scipy
  reference; compares sampled state/input signals.

- ``rollout_parity``: the bench hot path -- the batched on-device rollout
  (problems/batch.BatchedP2PRunner) for one scenario vs an exact host
  replication of the same rollout scheme (same warm-start shift matrix,
  same ideal plant update, same obstacle propagation) driven by reference
  solves.  This is what gates bench.py.

Run directly:  python tools/parity.py [--steps N] [--outer K]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build_p2p_holonomic(backend="alm", solver_options=None, start=None,
                        goal=None):
    """The canonical bench configuration (readme example: two rectangles +
    one circle, fixed 10 s horizon)."""
    from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                               Circle, Square, Point2point)
    vehicle = Holonomic()
    vehicle.set_initial_conditions(list(start) if start is not None
                                   else [-1.5, -1.5])
    vehicle.set_terminal_conditions(list(goal) if goal is not None
                                    else [2.0, 2.0])
    environment = Environment(room={"shape": Square(5.0)})
    environment.add_obstacle(Obstacle(
        {"position": [-2.1, -0.5]}, shape=Rectangle(width=3.0, height=0.2)))
    environment.add_obstacle(Obstacle(
        {"position": [1.7, -0.5]}, shape=Rectangle(width=3.0, height=0.2)))
    environment.add_obstacle(Obstacle(
        {"position": [1.5, 0.5]}, shape=Circle(0.4)))
    problem = Point2point(vehicle, environment, freeT=False)
    opts = {"verbose": 0, "solver": backend}
    if solver_options:
        opts["solver_options"] = solver_options
    problem.set_options(opts)
    problem.init()
    return problem


def closedloop_parity(n_steps=20, solver_options=None):
    """Run the host closed loop with ALM and with the scipy reference;
    return max state/input deviation over the executed trajectory."""
    from omg_tools_tpu.execution.simulator import Simulator

    signals = {}
    for backend in ("alm", "scipy"):
        problem = build_p2p_holonomic(backend, solver_options)
        simulator = Simulator(problem)
        simulator.deployer.reset()
        for _ in range(n_steps):
            simulator.update()
        veh = problem.vehicles[0]
        signals[backend] = {k: np.asarray(v, dtype=np.float64)
                            for k, v in veh.signals.items()}
    n = min(signals["alm"]["state"].shape[1],
            signals["scipy"]["state"].shape[1])
    d_state = np.max(np.abs(signals["alm"]["state"][:, :n]
                            - signals["scipy"]["state"][:, :n]))
    d_input = np.max(np.abs(signals["alm"]["input"][:, :n]
                            - signals["scipy"]["input"][:, :n]))
    return {"state_max_err": float(d_state),
            "input_max_err": float(d_input),
            "n_samples": int(n)}


def _reference_rollout(runner, x0, p0, n_steps, record_inputs=False):
    """Host replication of BatchedP2PRunner.rollout_fn for ONE scenario,
    with every NLP solved by the scipy reference solver (raw units, f64).
    The plant update goes through the runner's model recipe
    (problems/rollout_models.py), so every vehicle family with a rollout
    model -- Holonomic, Dubins, Quadrotor/3D -- gets the same reference."""
    import jax.numpy as jnp
    from omg_tools_tpu.ops.refsolver import make_ref_solver
    from omg_tools_tpu.utils.devices import on_host

    tr = runner.tr
    solve = make_ref_solver(tr.objective, tr.constraints, tr.n_x,
                            tr.lb, tr.ub)
    lb, ub = tr.bounds(0.0)
    lb = np.asarray(lb, dtype=np.float64)
    ub = np.asarray(ub, dtype=np.float64)
    M = np.asarray(runner.shift_M, dtype=np.float64)
    spk = runner.steps_per_knot
    dt = runner.update_time
    n_coef, n_spl = runner.spline_shape
    model = runner.model

    x = np.asarray(x0, dtype=np.float64).copy()
    p = np.asarray(p0, dtype=np.float64).copy()
    states, inputs, feas = [], [], []
    x_in, p_in = [], []
    for k in range(n_steps):
        phase = k % spk
        if phase == 0 and k > 0:
            x = M @ x
        p[runner.i_t] = phase * dt
        if record_inputs:
            x_in.append(x.copy())
            p_in.append(p.copy())
        st = solve(x, p, lb, ub)
        x = st.x
        feas.append(float(st.feas))
        cfs = jnp.asarray(x[runner.i_splines].reshape(n_coef, n_spl))
        with on_host():
            p_j, state = model.update(jnp.asarray(p), cfs, phase + 1,
                                      runner.horizon)
        p = np.array(p_j, dtype=np.float64)  # owned copy (jax buffers are
        #                                      read-only through asarray)
        states.append(np.asarray(state, dtype=np.float64))
        if hasattr(model, "E1") and hasattr(model, "i_input0"):
            inputs.append(np.asarray(model.E1[phase + 1] @ cfs,
                                     dtype=np.float64) / runner.horizon)
        for (ix, iv, ia) in runner.obstacle_idx:
            pos, vel, acc = p[ix].copy(), p[iv].copy(), p[ia].copy()
            p[ix] = pos + vel * dt + 0.5 * acc * dt * dt
            p[iv] = vel + acc * dt
        for (ic, cshape, M_obs) in getattr(runner, "traj_obstacle_idx", []):
            cfs_o = p[ic].reshape(cshape)
            p[ic] = (np.asarray(M_obs, np.float64) @ cfs_o).reshape(-1)
    if record_inputs:
        return {"states": np.asarray(states), "inputs": np.asarray(inputs),
                "feas": np.asarray(feas), "x_in": np.asarray(x_in),
                "p_in": np.asarray(p_in)}
    return (np.asarray(states), np.asarray(inputs), np.asarray(feas))


def cached_reference_rollout(runner, x0, p0, n_steps):
    """Reference rollout record (states + per-step solve inputs), cached in
    .omg_cache keyed on the runner's problem fingerprint + scenario -- one
    SLSQP rollout is computed once and shared across bench invocations AND
    the parity test suite (the host-side solves dominate wall time)."""
    import hashlib
    from omg_tools_tpu.utils import cache as _cache

    x0 = np.asarray(x0, np.float64)
    p0 = np.asarray(p0, np.float64)
    h = hashlib.sha256()
    h.update(x0.tobytes())
    h.update(p0.tobytes())
    h.update(np.asarray([n_steps]).tobytes())
    pkey = f"{runner._cache_key}_parity3_{h.hexdigest()[:12]}"
    hit = _cache.load_tensors(pkey, "refroll")
    if hit is not None:
        return {k: np.asarray(v) for k, v in hit.items()}
    ref = _reference_rollout(runner, x0, p0, n_steps, record_inputs=True)
    _cache.store_tensors(pkey, "refroll", ref)
    return ref


def openloop_parity(runner, x0, p0, n_steps, outer_iter=2, budgets=None,
                    ref=None):
    """Per-solve control parity along the REFERENCE trajectory.

    The closed-loop trajectory deviation compounds and bifurcates at
    obstacle decision boundaries (two optima within solver tolerance), so
    it cannot separate solver error from plan multiplicity.  This metric
    can: walk the reference rollout, and at every step solve the SAME
    (x_warm, p) with the device solver (its own multiplier warm state
    carried along), then compare the one-period-ahead planned state both
    solutions command.  That is exactly BASELINE's "control sequences
    match the reference within tolerance at 10 Hz", without chaos.

    ``ref``: optionally a precomputed record dict from
    ``_reference_rollout(..., record_inputs=True)`` (bench.py caches it).
    Returns dict with per_step (n_steps,) and max error."""
    import jax
    import jax.numpy as jnp

    if ref is None:
        ref = cached_reference_rollout(runner, x0, p0, n_steps)
    spk = runner.steps_per_knot
    n_coef, n_spl = runner.spline_shape
    model = runner.model
    compact = runner.compact
    consts = runner.consts()

    def _build(solver_fn, n_outer):
        def solve_fn(st_in, x_warm, p, phase):
            if compact is not None:
                from omg_tools_tpu.ops.compact import resolve_phase
                ct = resolve_phase(compact, consts.CT, phase, p)
                return solver_fn(x_warm, p, consts.lb, consts.ub,
                                 state0=st_in, outer_iter=n_outer, ct=ct)
            return solver_fn(x_warm, p, consts.lb, consts.ub, state0=st_in,
                             outer_iter=n_outer,
                             cA=runner._cA_at(consts, phase, p) if
                             runner.affine_cA else None, Q=consts.Q)
        return jax.jit(solve_fn)

    if budgets is not None:
        (ho, hi), (eo, ei) = budgets
        hard = _build(runner.make_solver(
            runner._alm_options._replace(inner_iter=hi)), ho)
        easy = _build(runner.make_solver(
            runner._alm_options._replace(inner_iter=ei)), eo)
    else:
        hard = easy = _build(runner.solver, outer_iter)

    # initial warm state: the same converged cold solve the rollout uses
    st = jax.tree_util.tree_map(
        lambda a: a[0], jax.jit(runner.init_solver_state)(
            jnp.asarray(x0, dtype=runner.dtype)[None],
            jnp.asarray(p0, dtype=runner.dtype)[None],
            jax.tree_util.tree_map(jnp.asarray, consts)))

    errs = []
    i_spl = runner.i_splines
    for k in range(n_steps):
        phase = k % spk
        p_k = jnp.asarray(ref["p_in"][k], dtype=runner.dtype)
        if k > 0:
            # warm start from the reference iterate, device budgets
            x_warm = jnp.asarray(ref["x_in"][k], dtype=runner.dtype)
            st_in = st._replace(x=x_warm,
                                feas=jnp.full_like(st.feas, jnp.inf),
                                stat=jnp.full_like(st.stat, jnp.inf),
                                n_iter=jnp.zeros_like(st.n_iter))
            fn = hard if phase == 0 else easy
            st = fn(st_in, x_warm, p_k, jnp.asarray(phase))
        # k == 0: the device's step-0 solution IS the converged cold solve
        # (init_solver_state above) -- exactly what rollout_fn executes;
        # re-solving the cold problem with the warm-step budget would gate
        # a code path the rollout never runs
        cfs = jnp.asarray(st.x)[jnp.asarray(i_spl)].reshape(n_coef, n_spl)
        _, state_dev = model.update(p_k, cfs, phase + 1, runner.horizon)
        errs.append(float(np.max(np.abs(np.asarray(state_dev, np.float64)
                                        - ref["states"][k]))))
    errs = np.asarray(errs)
    return {"per_step": errs, "openloop_max_err": float(errs.max()),
            "ref_feas_max": float(ref["feas"].max())}


def rollout_parity(runner, n_steps=20, outer_iter=1, start=None, goal=None,
                   device_states=None, x0p0=None):
    """Device-rollout vs reference-rollout parity for one scenario.

    ``device_states``: optionally reuse already-computed device states
    (n_steps, n_spl) for the scenario whose (x0, p0) are in ``x0p0`` --
    bench.py passes scenario 0 of its timing batch.  Otherwise a fresh
    single-scenario rollout is executed here."""
    import jax
    import jax.numpy as jnp

    start = np.asarray(start if start is not None else [-1.5, -1.5])
    goal = np.asarray(goal if goal is not None else [2.0, 2.0])

    if device_states is None:
        x0, p0, state = runner.make_batch(start[None, :], goal[None, :])
        consts = jax.device_put(runner.consts())
        st = jax.jit(runner.init_solver_state)(x0, p0, consts)
        roll = jax.jit(runner.rollout_fn(n_steps, outer_iter=outer_iter))
        carry, states = roll(st, p0, state, consts)
        device_states = np.asarray(states[0], dtype=np.float64)
        x0p0 = (np.asarray(x0[0]), np.asarray(p0[0]))

    ref = cached_reference_rollout(runner, x0p0[0], x0p0[1], n_steps)
    ref_states, ref_feas = ref["states"], ref["feas"]
    d = np.abs(device_states[:n_steps] - ref_states)
    return {"parity_max_err": float(np.max(d)),
            "parity_final_err": float(np.max(d[-1])),
            "ref_feas_max": float(np.max(ref_feas)),
            "ref_states": ref_states,
            "device_states": device_states}


def main():
    import argparse
    import jax.numpy as jnp
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--outer", type=int, default=1)
    parser.add_argument("--mode", choices=["rollout", "closedloop", "both"],
                        default="rollout")
    args = parser.parse_args()

    if args.mode in ("rollout", "both"):
        from omg_tools_tpu.problems.batch import BatchedP2PRunner
        problem = build_p2p_holonomic("alm")
        runner = BatchedP2PRunner(problem, dtype=jnp.float32)
        res = rollout_parity(runner, n_steps=args.steps,
                             outer_iter=args.outer)
        print(f"[rollout  parity] outer={args.outer} steps={args.steps} "
              f"max_err={res['parity_max_err']:.4f} "
              f"final_err={res['parity_final_err']:.4f} "
              f"ref_feas_max={res['ref_feas_max']:.2e}")
    if args.mode in ("closedloop", "both"):
        res = closedloop_parity(n_steps=args.steps)
        print(f"[closedloop parity] steps={args.steps} "
              f"state_max_err={res['state_max_err']:.4f} "
              f"input_max_err={res['input_max_err']:.4f}")


if __name__ == "__main__":
    main()
