"""True per-inner-iteration cost of the rollout: one dispatch of a
10-step rollout at outer_iter=1 vs 2 — the delta is 8 inner iterations."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from omg_tools_tpu.utils.devices import enable_host_backend
enable_host_backend()
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                           Circle, Square, Point2point)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
vehicle = Holonomic()
vehicle.set_initial_conditions([-1.5, -1.5])
vehicle.set_terminal_conditions([2.0, 2.0])
env = Environment(room={"shape": Square(5.0)})
env.add_obstacle(Obstacle({"position": [-2.1, -0.5]},
                          shape=Rectangle(width=3.0, height=0.2)))
env.add_obstacle(Obstacle({"position": [1.7, -0.5]},
                          shape=Rectangle(width=3.0, height=0.2)))
env.add_obstacle(Obstacle({"position": [1.5, 0.5]}, shape=Circle(0.4)))
problem = Point2point(vehicle, env, freeT=False)
problem.set_options({"verbose": 0})
problem.init()
from omg_tools_tpu.problems.batch import BatchedP2PRunner
runner = BatchedP2PRunner(problem, dtype=jnp.float32)
rng = np.random.default_rng(0)
starts = np.tile([-1.5, -1.5], (B, 1)) + rng.uniform(-0.3, 0.3, (B, 2))
goals = np.tile([2.0, 2.0], (B, 1)) + rng.uniform(-0.3, 0.3, (B, 2))
x0, p0, state = runner.make_batch(starts, goals)
consts = jax.device_put(runner.consts())
st = jax.jit(runner.init_solver_state)(x0, p0, consts)
jax.block_until_ready(st.x)

N = 10
for outer in (1, 2):
    roll = jax.jit(runner.rollout_fn(N, outer_iter=outer))
    out = roll(st, p0, state, consts)
    jax.block_until_ready(out[1])
    t0 = time.time()
    out = roll(st, p0, state, consts)
    jax.block_until_ready(out[1])
    dt = time.time() - t0
    print(f"outer={outer}: {dt/N*1e3:8.1f} ms/step "
          f"({B*N/dt:.0f} solves/s)")
