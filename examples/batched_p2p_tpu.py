"""TPU flagship: thousands of randomized p2p MPC scenarios solved in one
batched, jitted rollout on a single chip -- the data-parallel axis the
reference (one process, one Ipopt) does not have."""
import os

import numpy as np
import jax
import jax.numpy as jnp

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                           Circle, Square, Point2point)
from omg_tools_tpu.problems.batch import BatchedP2PRunner

SMOKE = bool(os.environ.get("OMG_SMOKE"))
BATCH = 8 if SMOKE else 256
N_STEPS = 2 if SMOKE else 20

vehicle = Holonomic()
vehicle.set_initial_conditions([-1.5, -1.5])
vehicle.set_terminal_conditions([2.0, 2.0])
environment = Environment(room={"shape": Square(5.0)})
environment.add_obstacle(Obstacle({"position": [1.5, 0.5]},
                                  shape=Circle(0.4)))
problem = Point2point(vehicle, environment, freeT=False)
problem.set_options({"verbose": 0})
problem.init()

runner = BatchedP2PRunner(problem, dtype=jnp.float32)
rng = np.random.default_rng(0)
starts = np.tile([-1.5, -1.5], (BATCH, 1)) + rng.uniform(-0.3, 0.3, (BATCH, 2))
goals = np.tile([2.0, 2.0], (BATCH, 1)) + rng.uniform(-0.3, 0.3, (BATCH, 2))
x0, p0, state = runner.make_batch(starts, goals)
consts = jax.device_put(runner.consts())
st = jax.jit(runner.init_solver_state)(x0, p0, consts)
roll = jax.jit(runner.rollout_fn(N_STEPS, outer_iter=4))
carry, states = roll(st, p0, state, consts)
jax.block_until_ready(states)
d1 = np.linalg.norm(np.asarray(states)[:, -1] - goals, axis=1)
print(f"batched_p2p_tpu: {BATCH} scenarios x {N_STEPS} steps,"
      f" median final goal distance {np.median(d1):.3f} m")
