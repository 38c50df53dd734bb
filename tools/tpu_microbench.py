"""Micro-benchmark of the ALM inner-step constituents at bench sizes on the
real TPU: identifies which op to target with a Pallas kernel.

Run:  python tools/tpu_microbench.py [B] [m] [n]
(defaults: read the real sizes from the canonical bench problem if no args)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3  # ms


def main():
    if len(sys.argv) >= 4:
        B, m, n = (int(a) for a in sys.argv[1:4])
    else:
        from omg_tools_tpu.utils.devices import enable_host_backend
        enable_host_backend()
        from omg_tools_tpu import (Holonomic, Environment, Obstacle,
                                   Rectangle, Circle, Square, Point2point)
        vehicle = Holonomic()
        vehicle.set_initial_conditions([-1.5, -1.5])
        vehicle.set_terminal_conditions([2.0, 2.0])
        env = Environment(room={"shape": Square(5.0)})
        env.add_obstacle(Obstacle({"position": [-2.1, -0.5]},
                                  shape=Rectangle(width=3.0, height=0.2)))
        env.add_obstacle(Obstacle({"position": [1.7, -0.5]},
                                  shape=Rectangle(width=3.0, height=0.2)))
        env.add_obstacle(Obstacle({"position": [1.5, 0.5]},
                                  shape=Circle(0.4)))
        problem = Point2point(vehicle, env, freeT=False)
        problem.set_options({"verbose": 0})
        problem.init()
        tr = problem.transcription
        B, m, n = 256, len(np.asarray(tr.lb)), tr.n_x
    print(f"sizes: B={B} m={m} n={n}")

    rng = np.random.default_rng(0)
    dt = jnp.float32
    Q = jnp.asarray(rng.standard_normal((m, n, n)) * 0.01, dtype=dt)
    A = jnp.asarray(rng.standard_normal((m, n)), dtype=dt)
    x = jnp.asarray(rng.standard_normal((B, n)), dtype=dt)
    y = jnp.asarray(rng.standard_normal((B, m)), dtype=dt)
    act = jnp.asarray((rng.random((B, m)) > 0.5), dtype=dt)
    g = jnp.asarray(rng.standard_normal((B, n)), dtype=dt)

    with jax.default_matmul_precision("highest"):
        J_fn = jax.jit(lambda x: A[None] + 2.0
                       * jnp.einsum("kij,bj->bki", Q, x))
        J = J_fn(x)

        H_fn = jax.jit(lambda J, act: jnp.einsum("bki,bk,bkj->bij", J, act, J)
                       + jnp.eye(n, dtype=dt)[None] * 1e-3)
        H = H_fn(J, act)

        grad_fn = jax.jit(lambda J, y: jnp.einsum("bki,bk->bi", J, y))

        def chol_solve(H, g):
            cho = jax.scipy.linalg.cho_factor(H)
            return jax.scipy.linalg.cho_solve(cho, g)
        chol_fn = jax.jit(jax.vmap(chol_solve))

        lu_fn = jax.jit(jax.vmap(lambda H, g: jnp.linalg.solve(H, g)))

        print(f"J = A + 2 Q x      : {timeit(J_fn, x):8.3f} ms")
        print(f"H = J'DJ           : {timeit(H_fn, J, act):8.3f} ms")
        print(f"grad = J'y         : {timeit(grad_fn, J, y):8.3f} ms")
        print(f"cholesky solve     : {timeit(chol_fn, H, g):8.3f} ms")
        print(f"lu solve           : {timeit(lu_fn, H, g):8.3f} ms")
    print("device:", jax.devices()[0])


if __name__ == "__main__":
    main()
