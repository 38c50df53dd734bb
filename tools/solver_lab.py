"""Solver tuning lab: evaluates ALM option sets over a fixed instance suite.

Usage: python tools/solver_lab.py [f32|f64]

Instances: cold start, warm re-solve, knot-shift warm solve on the readme
p2p_holonomic configuration.  Prints feasibility/stationarity/iterations per
(option set x instance).
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                           Circle, Square, Point2point)
from omg_tools_tpu.ops.alm import make_alm_solver, ALMOptions, ALMState
from omg_tools_tpu.ops.solver import gradient_row_scales


def build_problem():
    vehicle = Holonomic()
    vehicle.set_initial_conditions([-1.5, -1.5])
    vehicle.set_terminal_conditions([2.0, 2.0])
    environment = Environment(room={"shape": Square(5.0)})
    environment.add_obstacle(Obstacle({"position": [-2.1, -0.5]},
                                      shape=Rectangle(width=3.0, height=0.2)))
    environment.add_obstacle(Obstacle({"position": [1.7, -0.5]},
                                      shape=Rectangle(width=3.0, height=0.2)))
    environment.add_obstacle(Obstacle({"position": [1.5, 0.5]},
                                      shape=Circle(0.4)))
    problem = Point2point(vehicle, environment, freeT=False)
    problem.set_options({"verbose": 0})
    problem.init()
    problem.initialize(0.0)
    vehicle.predict(0.0, 0.1, 0.01, enforce_states=True)
    problem.reinitialize()
    return problem, vehicle


def instances(problem, vehicle):
    tr = problem.transcription
    x0 = tr.initial_guess()
    p0 = problem.pack_parameters(0.0)
    lb, ub = (np.asarray(v) for v in tr.bounds(0.0))
    # reference f64 solution for warm starts
    ref = problem._solver(jnp.asarray(x0), jnp.asarray(p0),
                          jnp.asarray(lb), jnp.asarray(ub))
    x_sol = np.asarray(ref.x)
    # warm: slightly perturbed params (one MPC period later)
    p1 = p0.copy()
    sl, _ = tr.par_slice(problem, "t")
    p1[sl] = 0.1
    sl, _ = tr.par_slice(vehicle, "state0")
    p1[sl] += 0.03
    # shift: advance warm start over a knot
    M = tr.spline_shift_matrix(lambda basis: basis.shiftoverknot_T())
    x_shift = M @ x_sol
    return {
        "cold": (x0, p0, lb, ub, None),
        "warm": (x_sol, p1, lb, ub, "reuse"),
        "shift": (x_shift, p0, lb, ub, "reuse"),
    }


def evaluate(option_sets, dtype):
    problem, vehicle = build_problem()
    tr = problem.transcription
    x0 = jnp.asarray(tr.initial_guess())
    p0 = jnp.asarray(problem.pack_parameters(0.0))
    row_scale = gradient_row_scales(jax.jacfwd(tr.constraints), x0, p0,
                                    max_gradient=100.0)
    g0 = np.asarray(jax.grad(tr.objective)(x0, p0))
    obj_scale = 1.0 / max(1.0, np.abs(g0).max() / 100.0)
    inst = instances(problem, vehicle)
    cast = lambda v: jnp.asarray(np.asarray(v), dtype=dtype)
    for name, opts in option_sets.items():
        solver = make_alm_solver(tr.objective, tr.constraints, tr.n_x,
                                 tr.lb, tr.ub, opts, row_scale=row_scale,
                                 obj_scale=obj_scale)
        for iname, (x, p, lb, ub, warm) in inst.items():
            state0 = None
            if warm == "reuse":
                state0 = ALMState(
                    x=cast(x), lam=cast(np.zeros(tr.n_g)),
                    rho=cast(opts.rho_init), feas=cast(np.inf),
                    stat=cast(np.inf), n_iter=jnp.asarray(0))
            t0 = time.time()
            st = solver(cast(x), cast(p), cast(lb), cast(ub), state0=state0)
            wall = time.time() - t0
            obj = float(tr.objective(st.x.astype(jnp.float64), p0))
            print(f"{name:24s} {iname:6s} feas {float(st.feas):9.2e} "
                  f"stat {float(st.stat):9.2e} it {int(st.n_iter):4d} "
                  f"rho {float(st.rho):8.0e} obj {obj:7.3f} ({wall:.1f}s)")


if __name__ == "__main__":
    dtype = jnp.float32 if (len(sys.argv) > 1 and sys.argv[1] == "f32") \
        else jnp.float64
    only = os.environ.get("LAB_ONLY")
    option_sets = {
        "base(40x6,rho10,g10)": ALMOptions(),
        "long(20x12,rho10,g10,max1e8)": ALMOptions(
            outer_iter=20, inner_iter=12, rho_max=1e8),
        "f32ish(rho100,g5,max1e4)": ALMOptions(
            outer_iter=40, inner_iter=8, rho_init=100.0, rho_growth=5.0,
            rho_max=1e4, tol=1e-3, feas_tol=1e-4),
        "hirho(rho1e3,g10,max1e5)": ALMOptions(
            outer_iter=30, inner_iter=8, rho_init=1e3, rho_growth=10.0,
            rho_max=1e5, tol=1e-3, feas_tol=1e-4),
        "gn(default)": ALMOptions(hessian="gn"),
        "gn(long)": ALMOptions(hessian="gn", outer_iter=60, inner_iter=10),
    }
    if only:
        option_sets = {k: v for k, v in option_sets.items() if only in k}
    evaluate(option_sets, dtype)
