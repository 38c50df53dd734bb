"""Compare solver build/structure modes on the canonical p2p problem: the
analog of the reference's CasADi codegen comparison
(examples/compare_buildoptions.py) -- here the modes are the transcription
structure paths: generic AD, dense-quadratic, and the scipy reference."""
import time
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                           Circle, Square, Point2point, Simulator)
from _smoke import SMOKE

n_steps = 2 if SMOKE else 10
results = {}
for mode, opts in (("alm-generic", {"solver": "alm"}),
                   ("alm-quadratic", {"solver": "alm",
                                      "exploit_structure": True}),
                   ("scipy-ref", {"solver": "scipy"})):
    vehicle = Holonomic()
    vehicle.set_initial_conditions([-1.5, -1.5])
    vehicle.set_terminal_conditions([2.0, 2.0])
    environment = Environment(room={"shape": Square(5.0)})
    environment.add_obstacle(Obstacle({"position": [0.3, 0.2]},
                                      shape=Circle(0.4)))
    problem = Point2point(vehicle, environment, freeT=False)
    problem.set_options({"verbose": 0, **opts})
    t0 = time.time()
    problem.init()
    build_s = time.time() - t0
    simulator = Simulator(problem)
    problem.initialize(0.0)
    t0 = time.time()
    for _ in range(n_steps):
        simulator.update()
    solve_s = (time.time() - t0) / n_steps
    results[mode] = (build_s, solve_s)
    print(f"compare_buildoptions: {mode:14s} build {build_s:7.2f}s "
          f"per-step {solve_s * 1000.0:8.1f}ms")
