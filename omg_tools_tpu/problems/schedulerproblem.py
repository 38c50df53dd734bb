"""Scheduler problem: receding-frame orchestration for vast environments.

Reference: /root/reference/omgtools/problems/schedulerproblem.py.  The flow
(A* global path -> moving frames -> local problems, with frame switching
when the vehicle enters the overlap region) is preserved; local problems
are FreeT point-to-point NLPs over the frame sub-environment.  Where the
reference rebuilds the CasADi NLP from scratch at every frame switch
(schedulerproblem.py:726, a multi-hundred-ms hiccup), this implementation
caches transcriptions+solvers keyed by the frame's obstacle signature, so
repeated frame layouts reuse the compiled solve.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .globalplanner import AStarPlanner
from .point2point import FreeTPoint2point
from .problem import Problem
from ..environment.environment import Environment
from ..environment.frame import ShiftFrame, CorridorFrame

__all__ = ["SchedulerProblem"]


class SchedulerProblem(Problem):

    def __init__(self, fleet, environment, options=None, **kwargs):
        Problem.__init__(self, fleet, environment, options,
                         label="schedulerproblem")
        if len(self.vehicles) > 1:
            raise NotImplementedError("scheduler supports one vehicle")
        self.vehicle = self.vehicles[0]
        self.frame_type = kwargs.get("frame_type",
                                     self.options.get("frame_type",
                                                      "shift_frame"))
        self.frame_size = kwargs.get("frame_size", 2.5)
        self.n_cells = kwargs.get("n_cells", [20, 20])
        self.start_time = 0.0
        self._problem_cache: Dict = {}
        self.cnt_frame_switches = 0

    def set_default_options(self):
        Problem.set_default_options(self)
        self.options["frame_type"] = "shift_frame"

    # -- build -------------------------------------------------------------
    def init(self):
        self.goal = np.asarray(self.vehicle.poseT[:2], dtype=np.float64)
        self.curr_state = np.asarray(self.vehicle.prediction["state"][:2],
                                     dtype=np.float64)
        veh_size = getattr(self.vehicle.shapes[0], "radius", 0.2)
        self.planner = AStarPlanner(self.environment, self.n_cells,
                                    self.curr_state, self.goal,
                                    vehicle_size=veh_size)
        self._make_frame_and_problem()

    def _global_path(self):
        path = self.planner.get_path(self.curr_state, self.goal)
        if path is None:
            raise RuntimeError("global planner found no path")
        return path

    def _make_frame(self):
        path = self._global_path()
        if self.frame_type == "corridor":
            frame = CorridorFrame(self.environment, self.curr_state,
                                  self.goal, global_path=path)
        else:
            frame = ShiftFrame(self.environment, self.curr_state, self.goal,
                               self.frame_size, global_path=path)
        frame.fill_obstacles(horizon_time=10.0)
        return frame

    def _frame_signature(self, frame):
        obs = frame.stationary_obstacles + frame.moving_obstacles
        return (len(obs), tuple(type(o.shape).__name__ for o in obs))

    def _make_frame_and_problem(self):
        self.frame = self._make_frame()
        frame = self.frame
        sig = self._frame_signature(frame)
        local_env = Environment(room=frame.room())
        for obs in frame.stationary_obstacles + frame.moving_obstacles:
            local_env.add_obstacle(obs)
        self.vehicle.set_terminal_conditions(list(frame.goal))
        if sig in self._problem_cache:
            # reuse the compiled local problem; only parameters change
            self.local_problem = self._problem_cache[sig]
            self.local_problem.environment.obstacles = local_env.obstacles
            self.local_problem.environment.room = local_env.room
            self.local_problem.reinitialize()
        else:
            problem = FreeTPoint2point(self.vehicle, local_env,
                                      {"verbose": 0})
            problem.init()
            self._problem_cache[sig] = problem
            self.local_problem = problem
        self.local_problem.initialize(0.0)
        self.cnt_frame_switches += 1

    # -- frame management --------------------------------------------------
    def _check_frame(self):
        """Valid while the goal is in the frame or the vehicle is not yet
        near the frame's local endpoint (reference :409-431)."""
        if self.frame.point_in_frame(self.goal):
            return True
        dist = np.linalg.norm(self.curr_state - self.frame.goal)
        return dist > 0.25 * max(self.frame.width, self.frame.height) * 0.5

    # -- lifecycle ---------------------------------------------------------
    def initialize(self, current_time):
        self.start_time = current_time
        self.local_problem.initialize(current_time)

    def reinitialize(self, father=None):
        self.local_problem.reinitialize()

    def predict(self, current_time, predict_time, sample_time, states=None,
                delay=0, enforce_states=False, enforce_inputs=False):
        self.local_problem.predict(current_time, predict_time, sample_time,
                                   states, delay, enforce_states,
                                   enforce_inputs)

    def solve(self, current_time, update_time):
        self.curr_state = np.asarray(self.vehicle.prediction["state"][:2],
                                     dtype=np.float64)
        if not self._check_frame():
            self._make_frame_and_problem()
            self.local_problem.initialize(current_time)
            self.local_problem.predict(current_time, update_time, 0.01,
                                       enforce_states=True)
        self.local_problem.solve(current_time, update_time)
        self.solver_stats = self.local_problem.solver_stats
        self.update_times = self.local_problem.update_times
        self.iteration = self.local_problem.iteration

    def store(self, current_time, update_time, sample_time):
        self.local_problem.store(current_time, update_time, sample_time)

    def simulate(self, current_time, simulation_time, sample_time):
        self.local_problem.simulate(current_time, simulation_time,
                                    sample_time)

    def stop_criterium(self, current_time, update_time):
        if not self.frame.point_in_frame(self.goal):
            return False
        return self.local_problem.stop_criterium(current_time, update_time)

    def sleep(self, current_time, sleep_time, sample_time):
        self.local_problem.sleep(current_time, sleep_time, sample_time)

    def compute_objective(self):
        return self.local_problem.compute_objective()

    def final(self):
        if self.options["verbose"] >= 1:
            print("\nWe reached our target!")
            print("%-18s %d" % ("Frame switches:", self.cnt_frame_switches))
        self.local_problem.final()
