from .base import AutoDiffFactor, Factor
from .between import BetweenFactor
from .prior import ManifoldPriorFactor, PriorFactor

__all__ = [
    "Factor",
    "AutoDiffFactor",
    "BetweenFactor",
    "PriorFactor",
    "ManifoldPriorFactor",
]
