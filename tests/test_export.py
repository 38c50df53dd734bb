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

pytestmark = pytest.mark.slow


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_export_formation_build_run():
    """Two-phase distributed ADMM runtime: export, build, run the 4-agent
    in-process ring harness (reference export/tests/formation/test.cpp)."""
    import numpy as np
    from omg_tools_tpu import Fleet, FormationPoint2point
    from omg_tools_tpu.environment.shapes import RegularPolyhedron
    N = 4
    vehicles = [Holonomic() for _ in range(N)]
    fleet = Fleet(vehicles)
    configuration = RegularPolyhedron(0.4 * np.sqrt(2), N,
                                      np.pi / 4).vertices.T
    fleet.set_configuration(configuration.tolist())
    fleet.set_initial_conditions(
        (np.array([-1.5, -1.5]) + configuration).tolist())
    fleet.set_terminal_conditions(
        (np.array([2.0, 2.0]) + configuration).tolist())
    env = Environment(room={"shape": Square(5.0)})
    problem = FormationPoint2point(fleet, env,
                                   options={"horizon_time": 10, "rho": 1.0})
    problem.set_options({"verbose": 0})
    problem.init()
    out = tempfile.mkdtemp(prefix="omg_export_f_")
    try:
        problem.export({"directory": out}).run()
        subprocess.run(["make", "formation"], cwd=out, check=True,
                       capture_output=True)
        res = subprocess.run(["./test_formation", "."], cwd=out, check=True,
                             capture_output=True, text=True, timeout=600)
        assert "PASSED" in res.stdout
    finally:
        shutil.rmtree(out, ignore_errors=True)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_export_rendezvous_build_run():
    """Free-terminal consensus runtime (reference
    export/tests/rendezvous/test.cpp)."""
    import numpy as np
    from omg_tools_tpu import Fleet, RendezVous
    N = 4
    vehicles = [Holonomic() for _ in range(N)]
    fleet = Fleet(vehicles)
    rel = np.array([[0.3, 0.3], [0.3, -0.3], [-0.3, -0.3], [-0.3, 0.3]])
    fleet.set_configuration(rel.tolist())
    starts = np.array([[-1.6, -1.6], [1.6, -1.6], [1.6, 1.6], [-1.6, 1.6]])
    fleet.set_initial_conditions(starts.tolist())
    fleet.set_terminal_conditions((starts * 0).tolist())
    env = Environment(room={"shape": Square(5.0)})
    problem = RendezVous(fleet, env, options={"horizon_time": 10,
                                              "rho": 1.0})
    problem.set_options({"verbose": 0})
    problem.init()
    out = tempfile.mkdtemp(prefix="omg_export_r_")
    try:
        problem.export({"directory": out}).run()
        subprocess.run(["make", "rendezvous"], cwd=out, check=True,
                       capture_output=True)
        res = subprocess.run(["./test_rendezvous", "."], cwd=out, check=True,
                             capture_output=True, text=True, timeout=600)
        assert "PASSED" in res.stdout
    finally:
        shutil.rmtree(out, ignore_errors=True)


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


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_export_obstraj_build_run():
    """Spline-trajectory obstacle through the embedded runtime: the caller
    sets the coefficient spline once; the runtime advances it per period
    (reference examples/p2p_holonomic_obstraj_export.py +
    export.py:446-476 traj_coeffs marshalling)."""
    import numpy as np
    vehicle = Holonomic(options={"safety_distance": 0.1})
    vehicle.set_initial_conditions([-1.5, -1.5])
    vehicle.set_terminal_conditions([2.0, 2.0])
    basis = vehicle.basis
    n_b = len(basis)
    coeffs = np.stack([np.linspace(1.5, 0.5, n_b),
                       np.linspace(0.5, 0.9, n_b)], axis=1)
    env = Environment(room={"shape": Square(5.0)})
    env.add_obstacle(Obstacle({"position": [1.7, -0.5]},
                              shape=Rectangle(width=3.0, height=0.2)))
    obstacle = Obstacle({"position": [1.5, 0.5]}, shape=Circle(0.4))
    obstacle.set_options({"spline_traj": True,
                          "spline_params": {"knots": basis.knots,
                                            "degree": basis.degree,
                                            "coeffs": coeffs}})
    env.add_obstacle(obstacle)
    problem = Point2point(vehicle, env, freeT=False)
    problem.set_options({"verbose": 0})
    problem.init()
    out = tempfile.mkdtemp(prefix="omg_export_ot_")
    try:
        ExportP2P(problem, {"directory": out}).run()
        subprocess.run(["make", "obstraj"], cwd=out, check=True,
                       capture_output=True)
        res = subprocess.run(["./test_obstraj", "."], cwd=out, check=True,
                             capture_output=True, text=True, timeout=300)
        assert "PASSED" in res.stdout
    finally:
        shutil.rmtree(out, ignore_errors=True)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_export_admm_socket_transport():
    """Caller-communicates contract ACROSS ADDRESS SPACES: four OS
    processes, one ADMMPoint2Point agent each, shared vectors + edge
    multipliers exchanged over TCP ring sockets (the stand-in for the
    reference's ROS wiring, examples/ros_example/)."""
    import numpy as np
    import socket as _socket
    from omg_tools_tpu import Fleet, FormationPoint2point
    from omg_tools_tpu.environment.shapes import RegularPolyhedron
    N = 4
    vehicles = [Holonomic() for _ in range(N)]
    fleet = Fleet(vehicles)
    configuration = RegularPolyhedron(0.4 * np.sqrt(2), N,
                                      np.pi / 4).vertices.T
    fleet.set_configuration(configuration.tolist())
    fleet.set_initial_conditions(
        (np.array([-1.5, -1.5]) + configuration).tolist())
    fleet.set_terminal_conditions(
        (np.array([2.0, 2.0]) + configuration).tolist())
    env = Environment(room={"shape": Square(5.0)})
    problem = FormationPoint2point(fleet, env,
                                   options={"horizon_time": 10, "rho": 1.0})
    problem.set_options({"verbose": 0})
    problem.init()
    out = tempfile.mkdtemp(prefix="omg_export_sock_")
    try:
        problem.export({"directory": out}).run()
        subprocess.run(["make", "admm_agent"], cwd=out, check=True,
                       capture_output=True)
        with _socket.socket() as s:    # free port block base
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        port = max(20000, min(port, 60000))
        procs = [subprocess.Popen(
            ["./admm_agent", ".", str(i), str(N), str(port)],
            cwd=out, stdout=subprocess.PIPE, text=True)
            for i in range(N)]
        outs = []
        for p in procs:
            o, _ = p.communicate(timeout=600)
            outs.append(o)
            assert p.returncode == 0
        assert "PASSED" in outs[0], outs[0]
    finally:
        shutil.rmtree(out, ignore_errors=True)
