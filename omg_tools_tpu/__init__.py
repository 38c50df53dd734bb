"""omg_tools_tpu -- TPU-native spline-MPC motion-planning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
meco-group/omg-tools: trajectories as B-spline coefficient vectors, dynamics
and separating-hyperplane collision constraints transcribed on spline
coefficients, warm-started receding-horizon NLP solves -- batched over
thousands of scenarios per chip, with distributed multi-vehicle consensus
(ADMM / dual decomposition) mapped onto a TPU device mesh.
"""

__version__ = "0.1.0"

from .ops.basis import Basis, clamped_basis, clamped_knots
from .ops.spline import (BSpline, evalspline, running_integral,
                         definite_integral, sample_spline)
