from .simulator import Simulator, Deployer
from .plotlayer import PlotLayer

__all__ = ["Simulator", "Deployer", "PlotLayer"]
