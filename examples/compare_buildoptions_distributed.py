"""Build-option comparison for the DISTRIBUTED problem: first-call compile
(+ persistent-cache reuse) vs warm calls of the formation ADMM, host loop
vs the fused on-device loop (reference
examples/compare_buildoptions_distributed.py compares CasADi codegen modes;
the analog here is jit compile/cache/device-loop placement)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import numpy as np
from omg_tools_tpu import (Holonomic, Fleet, Environment, Obstacle,
                           Rectangle, Square, FormationPoint2point)
from omg_tools_tpu.environment.shapes import RegularPolyhedron

def build():
    N = 4
    fleet = Fleet([Holonomic() for _ in range(N)])
    configuration = RegularPolyhedron(0.2, N, np.pi / 4.0).vertices.T
    fleet.set_configuration(configuration.tolist())
    fleet.set_initial_conditions(([-1.5, -1.5] + configuration).tolist())
    fleet.set_terminal_conditions(([2.0, 2.0] + configuration).tolist())
    environment = Environment(room={"shape": Square(5.0)})
    environment.add_obstacle(Obstacle(
        {"position": [1.7, -0.5]}, shape=Rectangle(width=3.0, height=0.2)))
    problem = FormationPoint2point(fleet, environment,
                                   options={"rho": 2.0, "verbose": 0})
    t0 = time.time()
    problem.init()
    return problem, time.time() - t0

for mode in ("host-loop", "device-loop"):
    problem, t_build = build()
    if mode == "device-loop":
        problem.enable_device_loop()
    t0 = time.time()
    problem.dual_update(0.0)          # first call: jit compile
    t_first = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        problem.dual_update(0.0)      # warm calls
    t_warm = (time.time() - t0) / 5.0
    pri, dua = problem.residuals[-1]
    print(f"{mode:12s} build={t_build:.2f}s first={t_first:.2f}s "
          f"warm={t_warm*1000:.1f}ms/iter  pri={pri:.2e} dua={dua:.2e}")
