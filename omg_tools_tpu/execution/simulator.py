"""Closed-loop MPC simulation + deployment API.

Mirrors /root/reference/omgtools/execution/simulator.py and deployer.py:
Simulator.run drives the receding-horizon loop (deployer.update ->
problem.simulate -> stop_criterium) with adaptive final-step timing;
Deployer exposes the real-system update API (predict -> solve -> store).
"""

from __future__ import annotations

import time as _time

import numpy as np

from .plotlayer import PlotLayer

__all__ = ["Simulator", "Deployer"]


class Deployer:

    def __init__(self, problem, sample_time=0.01, update_time=0.1):
        self.problem = problem
        self.sample_time = sample_time
        self.update_time = update_time
        self.current_time = 0.0
        self.iteration0 = True

    def reset(self):
        self.iteration0 = True
        self.problem.reinitialize()

    def update(self, current_time, states=None, inputs=None, dinputs=None,
               update_time=None, enforce_states=False, enforce_inputs=False):
        current_time = float(current_time)
        if update_time is None:
            update_time = self.update_time
        if self.iteration0:
            self.iteration0 = False
            self.problem.initialize(current_time)
            delay = 0
        else:
            delay = 0
        self.problem.predict(current_time, update_time, self.sample_time,
                             states, delay, enforce_states, enforce_inputs)
        self.problem.solve(current_time, update_time)
        self.problem.store(current_time, update_time, self.sample_time)
        self.current_time = current_time
        return {v: v.trajectories for v in self.problem.vehicles}


class Simulator:

    def __init__(self, problem, sample_time=0.01, update_time=0.1):
        self.problem = problem
        self.sample_time = sample_time
        self.update_time = update_time
        self.current_time = 0.0
        self.deployer = Deployer(problem, sample_time, update_time)
        # class-level back-pointer used by plot time indexing
        # (reference simulator.py:32)
        PlotLayer.simulator = self

    def set_problem(self, problem):
        self.problem = problem
        self.deployer.problem = problem

    def run(self, init_reset=True, max_steps=10000):
        """Closed MPC loop until the problem's stop criterion fires
        (reference simulator.py:39-62)."""
        if init_reset:
            self.deployer.reset()
        self.current_time = 0.0
        stop = False
        steps = 0
        while not stop and steps < max_steps:
            stop = self.update()
            steps += 1
        self.problem.final()
        trajectories, signals = {}, {}
        for vehicle in self.problem.vehicles:
            trajectories[str(vehicle)] = vehicle.trajectories
            signals[str(vehicle)] = vehicle.signals
        return trajectories, signals

    def update(self):
        """One MPC cycle: solve + plant simulation
        (reference simulator.py:92-111)."""
        self.deployer.update(self.current_time)
        self.problem.simulate(self.current_time, self.update_time,
                              self.sample_time)
        self.current_time += self.update_time
        return bool(self.problem.stop_criterium(self.current_time,
                                                self.update_time))

    def step(self, update_time=None):
        """Single open cycle returning the new state
        (reference simulator.py:64-90)."""
        update_time = update_time or self.update_time
        self.deployer.update(self.current_time)
        self.problem.simulate(self.current_time, update_time,
                              self.sample_time)
        self.current_time += update_time
        return {v: v.signals["state"][:, -1] for v in self.problem.vehicles}

    def run_once(self, simulation_time=None, hard_stop=None):
        """Open-loop: one solve, then simulate the whole horizon
        (reference simulator.py:113-143)."""
        self.current_time = 0.0
        self.deployer.reset()
        self.deployer.update(self.current_time)
        if simulation_time is None:
            horizon = self.problem.vehicles[0].trajectories["time"]
            simulation_time = float(horizon[-1] - horizon[0])
        if hard_stop is not None:
            t_stop = hard_stop["time"]
            self.problem.simulate(self.current_time, t_stop, self.sample_time)
            for vehicle in self.problem.vehicles:
                vehicle.overrule_state(hard_stop["state"])
                vehicle.overrule_input(np.zeros_like(
                    vehicle.signals["input"][:, -1]))
        else:
            self.problem.simulate(self.current_time, simulation_time,
                                  self.sample_time)
        self.problem.final()
        trajectories, signals = {}, {}
        for vehicle in self.problem.vehicles:
            trajectories[str(vehicle)] = vehicle.trajectories
            signals[str(vehicle)] = vehicle.signals
        return trajectories, signals

    def sleep(self, sleep_time):
        self.problem.sleep(self.current_time, sleep_time, self.sample_time)
        self.current_time += sleep_time

    def time2index(self, time):
        return int(np.round(time / self.sample_time, 6))
