"""Solver back-end comparison on the canonical p2p configuration: the
batched ALM (default), the interior-point backend (ops/solver.py), and the
independent scipy reference are run on the same problem and their
objectives/feasibility compared (reference
examples/p2p_holonomic_solvertest.py, which switches Ipopt/WORHP/SNOPT --
here the backends are the framework's own)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import numpy as np
import jax.numpy as jnp
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                           Circle, Square, Point2point)

results = {}
for solver in ("alm", "ipm", "scipy"):
    vehicle = Holonomic(options={"safety_distance": 0.1})
    vehicle.set_initial_conditions([-1.5, -1.5])
    vehicle.set_terminal_conditions([2.0, 2.0])
    environment = Environment(room={"shape": Square(5.0)})
    environment.add_obstacle(Obstacle({"position": [1.7, -0.5]},
                                      shape=Rectangle(width=3.0, height=0.2)))
    environment.add_obstacle(Obstacle({"position": [1.5, 0.5]},
                                      shape=Circle(0.4)))
    problem = Point2point(vehicle, environment,
                          {"verbose": 0, "solver": solver}, freeT=False)
    problem.init()
    problem.initialize(0.0)
    problem.solve(0.0, 0.1)
    tr = problem.transcription
    f = float(tr.objective(jnp.asarray(problem._x_result),
                           jnp.asarray(problem.pack_parameters(0.0))))
    results[solver] = (f, problem.solver_stats.get("feas",
                                                   problem.solver_stats["kkt_err"]))
    print(f"{solver:6s} objective={f:.6f}  feas={results[solver][1]:.2e}  "
          f"t={problem.solver_stats['time']*1000:.1f} ms")

f_ref = results["scipy"][0]
for solver in ("alm", "ipm"):
    gap = abs(results[solver][0] - f_ref)
    print(f"{solver} vs scipy objective gap: {gap:.2e}")
assert abs(results["alm"][0] - f_ref) < 5e-2 * max(1.0, abs(f_ref))
