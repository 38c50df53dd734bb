"""3D quadrotors.

- SimpleQuadrotor3D (reference /root/reference/omgtools/vehicles/
  quadrotor3d_simple.py): x, y, z splines of degree 4; thrust u1 and
  roll/pitch rates u2/u3 recovered from 2nd/3rd derivatives with
  small-angle decoupling; polynomial input/attitude bounds.
- Quadrotor3D (reference quadrotor3d.py): the full model introduces spline
  substitutions for thrust/attitude; here the simplified derivative-based
  transcription is used for both (full-substitution variant planned).
"""

from __future__ import annotations

import numpy as np

from .base import Vehicle
from ..environment.shapes import Sphere
from ..modeling.opti import BIG
from ..ops.spline import sample_spline

__all__ = ["SimpleQuadrotor3D", "Quadrotor3D"]


class SimpleQuadrotor3D(Vehicle):

    def __init__(self, radius=0.2, options=None, bounds=None):
        bounds = bounds or {}
        Vehicle.__init__(self, n_spl=3, degree=4, shapes=Sphere(radius),
                         options=options)
        self.radius = radius
        self.g = 9.81
        self.u1min = bounds.get("u1min", 1.0)
        self.u1max = bounds.get("u1max", 15.0)
        self.u2min = bounds.get("u2min", -8.0)
        self.u2max = bounds.get("u2max", 8.0)
        self.u3min = bounds.get("u3min", -8.0)
        self.u3max = bounds.get("u3max", 8.0)
        self.phimin = bounds.get("phimin", -np.pi / 6)
        self.phimax = bounds.get("phimax", np.pi / 6)
        self.thetamin = bounds.get("thetamin", -np.pi / 6)
        self.thetamax = bounds.get("thetamax", np.pi / 6)

    def set_default_options(self):
        Vehicle.set_default_options(self)
        self.options["stop_tol"] = 1.0e-2

    def define_trajectory_constraints(self, splines, horizon_time):
        x, y, z = splines
        ddx, ddy, ddz = (x.derivative(2), y.derivative(2), z.derivative(2))
        dddx, dddy, dddz = (x.derivative(3), y.derivative(3), z.derivative(3))
        T = horizon_time
        g_tf = self.g * (T ** 2)
        zz = ddz + g_tf
        # thrust magnitude
        self.define_constraint(
            -(ddx * ddx + ddy * ddy + zz * zz) + (T ** 4) * self.u1min ** 2,
            -BIG, 0.0)
        self.define_constraint(
            (ddx * ddx + ddy * ddy + zz * zz) - (T ** 4) * self.u1max ** 2,
            -BIG, 0.0)
        # roll rate u2
        self.define_constraint(
            -dddy * zz + dddz * ddy - (zz * zz) * T * self.u2max, -BIG, 0.0)
        self.define_constraint(
            dddy * zz - dddz * ddy + (zz * zz) * T * self.u2min, -BIG, 0.0)
        # pitch rate u3
        self.define_constraint(
            dddx * zz - dddz * ddx - (zz * zz) * T * self.u3max, -BIG, 0.0)
        self.define_constraint(
            -dddx * zz + dddz * ddx + (zz * zz) * T * self.u3min, -BIG, 0.0)
        # attitude bounds
        self.define_constraint(-ddy - zz * self.phimax, -BIG, 0.0)
        self.define_constraint(ddy + zz * self.phimin, -BIG, 0.0)
        self.define_constraint(ddx - zz * self.thetamax, -BIG, 0.0)
        self.define_constraint(-ddx + zz * self.thetamin, -BIG, 0.0)

    def get_initial_constraints(self, splines, horizon_time):
        spl0 = self.define_parameter("spl0", 3)
        dspl0 = self.define_parameter("dspl0", 3)
        ddspl0 = self.define_parameter("ddspl0", 3)
        T = horizon_time
        con = []
        for k, s in enumerate(splines):
            con.append((s, spl0[k]))
            con.append((s.derivative(), T * dspl0[k]))
            con.append((s.derivative(2), (T ** 2) * ddspl0[k]))
        return con

    def get_terminal_constraints(self, splines, horizon_time=None):
        position = self.define_parameter("positionT", 3)
        term_con = [(s, position[k]) for k, s in enumerate(splines)]
        term_con_der = []
        for d in range(1, self.degree + 1):
            term_con_der.extend([(s.derivative(d), 0.0) for s in splines])
        return [term_con, term_con_der]

    def set_initial_conditions(self, state, input=None):
        state = np.asarray(state, dtype=np.float64)
        self.prediction["state"] = np.r_[state[:3], np.zeros(3)][:6]
        self.prediction["dspl"] = np.zeros(3)
        self.prediction["ddspl"] = np.zeros(3)

    def set_terminal_conditions(self, position):
        self.positionT = np.asarray(position, dtype=np.float64)
        self.poseT = self.positionT

    def get_init_spline_value(self):
        n = len(self.basis)
        d = self.degree
        pos0 = self.prediction["state"][:3]
        init = np.zeros((n, 3))
        for k in range(3):
            init[:, k] = np.r_[pos0[k] * np.ones(d),
                               np.linspace(pos0[k], self.positionT[k],
                                           n - 2 * d),
                               self.positionT[k] * np.ones(d)]
        return [init]

    def check_terminal_conditions(self):
        tol = self.options["stop_tol"]
        return (np.linalg.norm(self.signals["state"][:3, -1]
                               - self.positionT) <= tol and
                np.linalg.norm(self.signals["dspl"][:, -1]) <= tol)

    def set_parameters(self, current_time):
        parameters = Vehicle.set_parameters(self, current_time)
        parameters[self]["spl0"] = self.prediction["state"][:3]
        parameters[self]["dspl0"] = self.prediction["dspl"]
        parameters[self]["ddspl0"] = self.prediction["ddspl"]
        parameters[self]["positionT"] = self.positionT
        return parameters

    def define_collision_constraints(self, hyperplanes, room, splines,
                                     horizon_time):
        self.define_collision_constraints_3d(hyperplanes, room, list(splines),
                                             horizon_time)

    def splines2signals(self, splines, time):
        x, y, z = splines
        pos = np.vstack([sample_spline(s, time) for s in splines])
        vel = np.vstack([sample_spline(s.derivative(), time)
                         for s in splines])
        acc = np.vstack([sample_spline(s.derivative(2), time)
                         for s in splines])
        u1 = np.sqrt(acc[0] ** 2 + acc[1] ** 2 + (acc[2] + self.g) ** 2)
        phi = -np.arctan2(acc[1], acc[2] + self.g)
        theta = np.arctan2(acc[0], acc[2] + self.g)
        return {
            "state": np.vstack([pos, vel]),
            "input": np.vstack([u1, phi, theta]),
            "dspl": vel, "ddspl": acc,
        }

    def state2pose(self, state):
        return np.r_[np.asarray(state)[:3], 0.0, 0.0, 0.0]

    def ode(self, state, input):
        # state: pos (3), vel (3); input: u1, phi, theta (small angles)
        u1, phi, theta = input[0], input[1], input[2]
        acc = np.r_[u1 * np.sin(theta), -u1 * np.sin(phi),
                    u1 * np.cos(phi) * np.cos(theta) - self.g]
        return np.r_[state[3:6], acc]


class Quadrotor3D(SimpleQuadrotor3D):
    """Full 3D quadrotor interface (reference quadrotor3d.py); currently
    shares the simplified transcription -- the exact spline-substitution
    variant (f_til + quaternion-like attitude splines) is planned."""
