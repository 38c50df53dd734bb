"""omg_tools_tpu -- TPU-native spline-MPC motion-planning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
meco-group/omg-tools: trajectories as B-spline coefficient vectors, dynamics
and separating-hyperplane collision constraints transcribed on spline
coefficients, warm-started receding-horizon NLP solves -- batched over
thousands of scenarios per chip, with distributed multi-vehicle consensus
(ADMM / dual decomposition) mapped onto a TPU device mesh.

Public API mirrors the reference's ``from omgtools import *`` surface
(reference omgtools/__init__.py:1-7).
"""

__version__ = "0.1.0"

# honor an explicit CPU request: some images pin the TPU platform through
# sitecustomize-level jax config, which silently overrides the standard
# JAX_PLATFORMS=cpu environment contract that test harnesses rely on
import os as _os
if _os.environ.get("JAX_PLATFORMS") == "cpu":
    try:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

# make the CPU backend available alongside a pinned TPU platform BEFORE any
# backend initialization: all one-time host-side setup (transcription
# probes, AD structure detection, warm starts) runs on the host via
# utils.devices.on_host() instead of round-tripping the remote chip
from .utils.devices import enable_host_backend as _enable_host_backend
_enable_host_backend()

from .ops.basis import Basis, clamped_basis, clamped_knots
from .ops.spline import (BSpline, evalspline, running_integral,
                         definite_integral, sample_spline)
from .environment.shapes import (Circle, Cylinder, Ring, Polyhedron, Beam,
                                 RegularPolyhedron, Rectangle, Square, UFO,
                                 Sphere, Polyhedron3D, RegularPrisma, Cuboid,
                                 Cube, Plate)
from .environment.environment import Environment
from .environment.obstacle import Obstacle
from .models.base import Vehicle
from .models.holonomic import Holonomic
from .models.holonomic1d import Holonomic1D
from .models.holonomic3d import Holonomic3D
from .models.holonomicorient import HolonomicOrient
from .models.dubins import Dubins
from .models.quadrotor import Quadrotor
from .models.bicycle import Bicycle
from .models.agv import AGV
from .models.quadrotor3d import Quadrotor3D, SimpleQuadrotor3D
from .models.trailer import Trailer
from .models.tool import Tool
from .models.fleet import Fleet, get_fleet_vehicles
from .problems.problem import Problem
from .problems.point2point import (Point2point, FixedTPoint2point,
                                   FreeTPoint2point, FreeEndPoint2point)
from .problems.admm import ADMMProblem, DistributedProblem
from .problems.formation import FormationPoint2point
from .problems.formation_central import FormationPoint2pointCentral
from .problems.rendezvous import RendezVous
from .problems.dualdecomposition import (DDProblem,
    FormationPoint2pointDualDecomposition)
from .problems.multiframeproblem import MultiFrameProblem
from .problems.schedulerproblem import SchedulerProblem
from .problems.gcodeproblem import GCodeProblem, GCodeSchedulerProblem
from .problems.globalplanner import AStarPlanner, Grid
from .environment.frame import Frame, ShiftFrame, CorridorFrame
from .execution.simulator import Simulator, Deployer
from .execution.plotlayer import PlotLayer
from .export.export_p2p import ExportP2P
from .export.export_formation import ExportFormation, ExportADMM
from .export.export_rendezvous import ExportRendezVous
from .gui.gcode_reader import GCodeReader
from .gui.gcode_block import GCodeBlock
from .gui.svg_reader import SVGReader
from .gui.gui import EnvironmentGUI
from .ops.spline import Nurbs, TensorBSpline, circle_arc_splines
