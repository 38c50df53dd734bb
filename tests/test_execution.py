"""Execution-layer tests: Deployer hardware-delay compensation (reference
deployer.py:43-79) and obstacle forced-input simulation regressions."""

import numpy as np
import pytest

from omg_tools_tpu import (Holonomic, Environment, Obstacle, Circle, Square,
                           Point2point, Deployer)




def build_problem():
    vehicle = Holonomic()
    vehicle.set_options({"ideal_prediction": True})
    vehicle.set_initial_conditions([-1.5, -1.5])
    vehicle.set_terminal_conditions([2.0, 2.0])
    environment = Environment(room={"shape": Square(5.0)})
    problem = Point2point(vehicle, environment, freeT=False)
    problem.set_options({"verbose": 0})
    problem.init()
    return vehicle, problem


def test_deployer_delay_compensation():
    """A slow solve (caller clock advanced past update_time) shifts the
    predict window by the measured delay; an on-time solve does not."""
    vehicle, problem = build_problem()
    dep = Deployer(problem, sample_time=0.01, update_time=0.1)
    dep.update(0.0)
    traj = {k: np.asarray(v).copy() for k, v in vehicle.trajectories.items()}
    # solver took 0.15 s wall-clock instead of the 0.1 s control period:
    # delay = (0.15 - 0.0 - 0.1) / 0.01 = 5 samples
    dep.update(0.15)
    n_samp = 10
    np.testing.assert_allclose(vehicle.prediction["state"],
                               traj["state"][:, n_samp + 5])
    # on-time update: no shift
    traj = {k: np.asarray(v).copy() for k, v in vehicle.trajectories.items()}
    dep.update(0.25)
    np.testing.assert_allclose(vehicle.prediction["state"],
                               traj["state"][:, n_samp])


def test_deployer_delay_clamped_to_stored_trajectory():
    """A delay that would overrun the stored trajectory is dropped
    (reference deployer.py:63-66)."""
    vehicle, problem = build_problem()
    dep = Deployer(problem, sample_time=0.01, update_time=0.1)
    dep.update(0.0)
    traj = {k: np.asarray(v).copy() for k, v in vehicle.trajectories.items()}
    horizon_end = float(traj["time"].ravel()[-1])
    # clock jumped past the whole stored horizon: compensation impossible
    dep.update(horizon_end + 0.2)
    n_samp = 10
    np.testing.assert_allclose(vehicle.prediction["state"],
                               traj["state"][:, n_samp])


def test_obstacle_forced_input_1d_series():
    """A scalar-input linear model with a flat input time series simulates
    without shape errors (advisor round-3 regression; the reference accepts
    this format via interp1d)."""
    # double integrator in 2D driven by one scalar input on x-acceleration
    A = np.zeros((6, 6))
    A[0, 2], A[1, 3] = 1.0, 1.0   # pos' = vel
    A[2, 4], A[3, 5] = 1.0, 1.0   # vel' = acc
    B = np.zeros((6, 1))
    B[4, 0] = 1.0                 # u -> x-acceleration rate
    obstacle = Obstacle(
        {"position": [0.0, 0.0]}, shape=Circle(0.2),
        simulation={"model": {"A": A, "B": B},
                    "trajectories": {"input": {
                        "time": [0.0, 0.5],
                        "values": [1.0, -1.0]}}})
    obstacle.simulate(1.0, 0.01)
    sig = obstacle.signals
    assert sig["position"].shape[1] == 101
    # the scalar input actually acted on the x-acceleration channel
    # (u=+1 for 0.5 s then -1: the x-acc ramps to ~0.5 and back)
    assert np.abs(sig["acceleration"][0]).max() > 0.4
    assert np.abs(sig["acceleration"][1]).max() < 1e-9
    assert np.all(np.isfinite(sig["position"]))
