"""G-code machining problems.

- GCodeProblem (reference /root/reference/omgtools/problems/gcodeproblem.py):
  MultiFrame-style free-time NLP where each "room" is a G-code segment
  (rectangular tolerance tube for G00/G01, ring annulus for G02/G03) and the
  vehicle is a Tool; C^(degree-1) continuity at joints, head/tail coefficient
  skipping on border segments.
- GCodeSchedulerProblem (reference gcodeschedulerproblem.py): rolls a window
  of n_segments over the block list, regenerating/reusing the local
  GCodeProblem as segments complete.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .problem import Problem
from ..modeling.opti import BIG
from ..ops.spline import evalspline
from ..environment.environment import Environment
from ..environment.shapes import Rectangle, Ring
from ..gui.gcode_block import G00, G01, G02, G03

__all__ = ["GCodeProblem", "GCodeSchedulerProblem", "blocks_to_segments"]


def blocks_to_segments(blocks, tolerance):
    """Tolerance tubes around G-code blocks (reference
    gcodeschedulerproblem.py:230-505, straight/arc cases)."""
    segments = []
    for b in blocks:
        start, end = np.asarray(b.start), np.asarray(b.end)
        if isinstance(b, (G02, G03)):
            segments.append({
                "shape": Ring(radius_in=b.radius - tolerance,
                              radius_out=b.radius + tolerance,
                              start=np.arctan2(start[1] - b.center[1],
                                               start[0] - b.center[0]),
                              end=np.arctan2(end[1] - b.center[1],
                                             end[0] - b.center[0]),
                              direction="CW" if isinstance(b, G02) else "CCW"),
                "pose": list(b.center), "start": list(start),
                "end": list(end), "number": b.number})
        else:
            vec = end[:2] - start[:2]
            length = float(np.linalg.norm(vec))
            orientation = float(np.arctan2(vec[1], vec[0])) if length > 1e-12 \
                else 0.0
            mid = 0.5 * (start + end)
            segments.append({
                "shape": Rectangle(width=length + 2 * tolerance,
                                   height=2 * tolerance,
                                   orientation=orientation),
                "pose": [float(mid[0]), float(mid[1]), float(mid[2])],
                "start": list(start), "end": list(end), "number": b.number})
    return segments


class GCodeProblem(Problem):

    def __init__(self, fleet, environment, n_segments, options=None):
        Problem.__init__(self, fleet, environment, options,
                         label="gcodeproblem")
        self.n_segments = n_segments
        self.init_time = None
        self.start_time = 0.0
        self.objective = 0.0

    def set_default_options(self):
        Problem.set_default_options(self)
        self.options["no_term_con_der"] = False

    def construct(self):
        tool = self.vehicles[0]
        self.t = self.define_parameter("t")[0]
        self.motion_times = [
            self.define_variable(f"T{k}", value=10.0)[0]
            for k in range(self.n_segments)]
        for child in self.children:
            child.problem_t = self.t
            child.problem_T = self.motion_times[0]
        self.define_objective(sum(self.motion_times))
        for T in self.motion_times:
            self.define_constraint(-T, -BIG, 0.0)
        tool.init()
        total_splines = tool.define_splines(n_seg=self.n_segments)
        for idx in range(self.n_segments):
            if idx == 0 and self.n_segments > 1:
                skip = (1, 0)
            elif idx == self.n_segments - 1 and self.n_segments > 1:
                skip = (0, 1)
            else:
                skip = ()
            tool.define_trajectory_constraints(
                total_splines[idx], self.motion_times[idx], skip=skip)
            tool.define_collision_constraints(
                self.environment.room[idx], total_splines[idx],
                self.motion_times[idx])
        self.define_init_constraints()
        self.define_terminal_constraints()
        self.define_connection_constraints()

    def define_init_constraints(self):
        tool = self.vehicles[0]
        init_con = tool.get_initial_constraints(tool.splines[0],
                                                self.motion_times[0])
        for spline, condition in init_con:
            self.define_constraint(
                evalspline(spline, self.t / self.motion_times[0])
                - condition, 0.0, 0.0)

    def define_terminal_constraints(self):
        tool = self.vehicles[0]
        term_con, term_con_der = tool.get_terminal_constraints(
            tool.splines[-1], horizon_time=self.motion_times[-1])
        if self.options.get("no_term_con_der", False):
            term_con_der = []
        for spline, condition in term_con + term_con_der:
            self.define_constraint(
                evalspline(spline, np.asarray(1.0)) - condition, 0.0, 0.0)

    def define_connection_constraints(self):
        tool = self.vehicles[0]
        degree = tool.degree
        for j in range(self.n_segments - 1):
            for s1, s2 in zip(tool.splines[j], tool.splines[j + 1]):
                for d in range(degree):
                    v1 = evalspline(s1.derivative(d), np.asarray(1.0))
                    v2 = evalspline(s2.derivative(d), np.asarray(0.0))
                    self.define_constraint(
                        v1 * self.motion_times[j + 1] ** d
                        - v2 * self.motion_times[j] ** d, 0.0, 0.0)

    def set_parameters(self, current_time):
        parameters = {self: {}}
        parameters[self]["t"] = 0.0 if self.init_time is None \
            else self.init_time
        return parameters

    def time_parameter(self, current_time):
        return 0.0 if self.init_time is None else float(self.init_time)

    # -- lifecycle ---------------------------------------------------------
    def initialize(self, current_time):
        self.start_time = current_time

    def segment_times(self):
        return [float(self.get_variables(self, f"T{k}")[0])
                for k in range(self.n_segments)]

    def reinitialize(self, father=None):
        tool = self.vehicles[0]
        tr = self.transcription
        # straight-line guesses between segment start/end points
        for k in range(self.n_segments):
            seg = self.environment.room[k]
            n = len(tool.basis)
            init = np.stack([np.linspace(seg["start"][d], seg["end"][d], n)
                             for d in range(3)], axis=1)
            sl, _ = tr.var_slice(tool, f"splines_seg{k}")
            self._x_result[sl] = init.reshape(-1)
            # motion-time guess: path length over half max velocity
            length = np.linalg.norm(np.asarray(seg["end"])
                                    - np.asarray(seg["start"]))
            vmax = max(abs(tool.vxmax), abs(tool.vzmax), 1e-6)
            slT, _ = tr.var_slice(self, f"T{k}")
            self._x_result[slT] = max(2.0 * length / vmax, 0.1)
        self._ip_state = None

    def store(self, current_time, update_time, sample_time):
        segment_times = self.segment_times()
        horizon_time = sum(segment_times)
        rel = 0.0 if self.init_time is None else self.init_time
        if horizon_time < sample_time:
            return
        tool = self.vehicles[0]
        n_samp = int(round((horizon_time - rel) / sample_time, 6)) + 1
        time_axis = np.linspace(rel, rel + (n_samp - 1) * sample_time, n_samp)
        segments = [self.get_variables(tool, f"splines_seg{k}")
                    for k in range(tool.n_seg)]
        tool.store(current_time, sample_time, segments, segment_times,
                   time_axis)

    def init_step(self, current_time, update_time):
        if (current_time - self.start_time) > 0:
            T = sum(self.segment_times())
            target_time = T if T < 2 * update_time else T - update_time
            M = self.transcription.spline_shift_matrix(
                lambda basis: basis.shift_spline_T(update_time / target_time),
                block_filter=lambda blk: "seg0" in blk.name)
            self.transform_primal_splines(M)
            T0 = float(self.get_variables(self, "T0")[0])
            self.set_variables(np.array([max(T0 - update_time, 1e-3)]),
                               self, "T0")

    def simulate(self, current_time, simulation_time, sample_time):
        horizon_time = sum(self.segment_times())
        if horizon_time < sample_time:
            return
        simulation_time = min(simulation_time, horizon_time)
        self.objective = current_time + simulation_time - self.start_time
        Problem.simulate(self, current_time, simulation_time, sample_time)

    def stop_criterium(self, current_time, update_time):
        if sum(self.segment_times()) < update_time:
            return True
        return all(v.check_terminal_conditions() for v in self.vehicles)

    def compute_objective(self):
        return self.objective

    def final(self):
        if self.options["verbose"] >= 1:
            print("\nMachining done!")


class GCodeSchedulerProblem(Problem):
    """Rolling window of n_segments local GCodeProblems over the block list
    (reference gcodeschedulerproblem.py:38+)."""

    def __init__(self, tool, gcode_blocks, options=None, n_segments=2,
                 **kwargs):
        environment = Environment(room=[{"shape": Rectangle(1.0, 1.0)}])
        Problem.__init__(self, tool, environment, options,
                         label="gcodeschedulerproblem")
        self.tool = self.vehicles[0]
        self.blocks = list(gcode_blocks)
        self.n_segments = min(n_segments, len(self.blocks))
        self.segments_all = blocks_to_segments(self.blocks,
                                               self.tool.tolerance)
        self.window_start = 0
        self.cnt_windows = 0

    def init(self):
        self._make_window_problem()

    def _make_window_problem(self):
        segs = self.segments_all[self.window_start:
                                 self.window_start + self.n_segments]
        rooms = [dict(s) for s in segs]
        for room in rooms:
            room.setdefault("position", room["pose"][:2])
            room.setdefault("draw", True)
        local_env = Environment(room=rooms)
        self.tool.set_terminal_conditions(list(segs[-1]["end"]))
        self.local_problem = GCodeProblem(self.tool, local_env,
                                          len(segs), {"verbose": 0})
        self.local_problem.init()
        self.local_problem.reinitialize()
        self.cnt_windows += 1

    def _segment_done(self):
        seg0 = self.segments_all[self.window_start]
        pos = self.tool.prediction["state"][:3]
        return np.linalg.norm(np.asarray(pos) - np.asarray(seg0["end"])) \
            < max(self.tool.tolerance, 1e-3)

    # -- lifecycle ---------------------------------------------------------
    def initialize(self, current_time):
        self.start_time = current_time
        self.local_problem.initialize(current_time)

    def reinitialize(self, father=None):
        self.local_problem.reinitialize()

    def predict(self, *args, **kwargs):
        self.local_problem.predict(*args, **kwargs)

    def solve(self, current_time, update_time):
        if self._segment_done() and \
                self.window_start + self.n_segments < len(self.segments_all):
            self.window_start += 1
            self._make_window_problem()
            self.local_problem.initialize(current_time)
        self.local_problem.solve(current_time, update_time)
        self.solver_stats = self.local_problem.solver_stats
        self.update_times = self.local_problem.update_times
        self.iteration = self.local_problem.iteration

    def store(self, *args):
        self.local_problem.store(*args)

    def simulate(self, *args):
        self.local_problem.simulate(*args)

    def stop_criterium(self, current_time, update_time):
        last = self.window_start + self.n_segments >= len(self.segments_all)
        return last and self.local_problem.stop_criterium(current_time,
                                                          update_time)

    def compute_objective(self):
        return self.local_problem.compute_objective()

    def final(self):
        if self.options["verbose"] >= 1:
            print("\nMachining done! windows:", self.cnt_windows)
