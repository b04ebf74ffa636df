from . import datasets, synthetic
from .bal import BalDataset, load_bal, save_bal
from .g2o import load_g2o, save_g2o
from .graph import Edge, Graph
from .toro import load_toro, save_toro

__all__ = [
    "Graph",
    "Edge",
    "load_g2o",
    "save_g2o",
    "load_toro",
    "save_toro",
    "BalDataset",
    "load_bal",
    "save_bal",
    "datasets",
    "synthetic",
]
