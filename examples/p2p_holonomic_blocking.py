"""Fault injection: hard stop mid-flight (reference
examples/p2p_holonomic_blocking.py + simulator.py:113-143)."""
import numpy as np
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Holonomic, Environment, Square, Point2point,
                           Simulator)

vehicle = Holonomic()
vehicle.set_initial_conditions([-1.5, -1.5])
vehicle.set_terminal_conditions([2.0, 2.0])
environment = Environment(room={"shape": Square(5.0)})
problem = Point2point(vehicle, environment, freeT=False)
problem.set_options({"verbose": 0})
problem.init()
simulator = Simulator(problem)
simulator.run_once(hard_stop={"time": 1.0, "state": [-1.0, -1.0]})
assert np.allclose(vehicle.signals["state"][:, -1], [-1.0, -1.0])
print("p2p_holonomic_blocking: stopped at",
      vehicle.signals["pose"][:2, -1])
