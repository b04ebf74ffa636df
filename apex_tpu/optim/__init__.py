from .common import ConvergenceConfig, IterationStats, SolverResult, Status
from .dogleg import DogLeg, DogLegConfig
from .gauss_newton import GaussNewton, GaussNewtonConfig
from .lm import LevenbergMarquardt, LevenbergMarquardtConfig

__all__ = [
    "Status",
    "SolverResult",
    "IterationStats",
    "ConvergenceConfig",
    "LevenbergMarquardt",
    "LevenbergMarquardtConfig",
    "GaussNewton",
    "GaussNewtonConfig",
    "DogLeg",
    "DogLegConfig",
]
