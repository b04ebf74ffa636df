"""Optimization-state checkpointing.

The reference has no checkpoint/resume (SURVEY.md §5 suggests adding real
iteration-state checkpointing: dump the variable pytree + damping). This
module provides exactly that: save/restore of (values, damping, nu, cost,
iteration) to a single .npz so long solves survive preemption — the
TPU-production analogue of the reference's save-optimized-graph escape
hatch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from .problem import CompiledProblem


@dataclasses.dataclass
class OptimizerCheckpoint:
    values: Tuple[np.ndarray, ...]
    damping: float
    nu: float
    cost: float
    iteration: int

    def save(self, path):
        arrays = {f"pool_{i}": np.asarray(v) for i, v in enumerate(self.values)}
        np.savez(
            path,
            _meta=np.array([self.damping, self.nu, self.cost, float(self.iteration)]),
            _n_pools=np.array([len(self.values)]),
            **arrays,
        )

    @classmethod
    def load(cls, path) -> "OptimizerCheckpoint":
        z = np.load(path)
        n = int(z["_n_pools"][0])
        meta = z["_meta"]
        return cls(
            values=tuple(z[f"pool_{i}"] for i in range(n)),
            damping=float(meta[0]),
            nu=float(meta[1]),
            cost=float(meta[2]),
            iteration=int(meta[3]),
        )

    def validate_against(self, cp: CompiledProblem):
        if len(self.values) != len(cp.pools):
            raise ValueError(
                f"checkpoint has {len(self.values)} pools, problem has {len(cp.pools)}"
            )
        for i, (v, p) in enumerate(zip(self.values, cp.pools)):
            expected = (len(p.names), p.manifold.storage_dim)
            if v.shape != expected:
                raise ValueError(f"pool {i}: checkpoint shape {v.shape} != {expected}")


class CheckpointObserver:
    """Observer that snapshots optimizer state every N iterations.

    Note: observers receive named variables; this observer re-packs them
    into pool arrays using the compiled problem's layout."""

    def __init__(self, cp: CompiledProblem, path, every: int = 5):
        self.cp = cp
        self.path = path
        self.every = every
        self._last: Optional[OptimizerCheckpoint] = None

    def on_step(self, variables, iteration, cost, gradient_norm, damping,
                step_norm, step_quality):
        if iteration % self.every != 0:
            return
        values = []
        for pool in self.cp.pools:
            values.append(np.stack([np.asarray(variables[n]) for n in pool.names]))
        ck = OptimizerCheckpoint(
            values=tuple(values), damping=damping, nu=2.0, cost=cost,
            iteration=iteration,
        )
        ck.save(self.path)
        self._last = ck

    def notify_complete(self, variables, iterations):
        pass
