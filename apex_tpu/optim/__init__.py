from .common import ConvergenceConfig, IterationStats, SolverResult, Status
from .lm import LevenbergMarquardt, LevenbergMarquardtConfig

__all__ = [
    "Status",
    "SolverResult",
    "IterationStats",
    "ConvergenceConfig",
    "LevenbergMarquardt",
    "LevenbergMarquardtConfig",
]
