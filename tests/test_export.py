"""Export-layer test: export the embedded C++ runtime, build it with make,
and run the 50-iteration MPC harness (the reference's export test pattern,
tests/test_examples.py:29-37)."""

import os
import shutil
import subprocess
import tempfile

import pytest

from omg_tools_tpu import (Holonomic, Environment, Obstacle, Rectangle,
                           Circle, Square, Point2point)
from omg_tools_tpu.export.export_p2p import ExportP2P


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_export_build_run():
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
    out = tempfile.mkdtemp(prefix="omg_export_")
    try:
        ExportP2P(problem, {"directory": out}).run()
        subprocess.run(["make"], cwd=out, check=True, capture_output=True)
        res = subprocess.run(["./test", "."], cwd=out, check=True,
                             capture_output=True, text=True, timeout=300)
        assert "PASSED" in res.stdout
    finally:
        shutil.rmtree(out, ignore_errors=True)
