"""Prior factors.

``PriorFactor`` is the reference's Euclidean anchor (src/factors/
prior_factor.rs:52-110): r = x - x_prior on the raw parameter vector with
identity Jacobian. It is only well-posed when storage_dim == dof (Rn, SE2,
SO2) — the reference notes the same limitation.

``ManifoldPriorFactor`` is the manifold-aware extension the reference
doc suggests ("consider using manifold-aware priors"): r = x ⊟ prior with
J = Jr^{-1}(r).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..manifolds import get as get_manifold
from .base import Factor


class PriorFactor(Factor):
    kind = "prior"

    def __init__(self, prior, manifold=None):
        self.prior = np.asarray(prior, dtype=np.float64)
        if manifold is None:
            manifold = f"R{self.prior.shape[0]}"
        if isinstance(manifold, str):
            manifold = get_manifold(manifold)
        if manifold.storage_dim != manifold.dof:
            raise ValueError(
                f"Euclidean PriorFactor requires storage_dim == dof; "
                f"{manifold.name} has {manifold.storage_dim} != {manifold.dof}. "
                f"Use ManifoldPriorFactor instead."
            )
        self.manifold = manifold

    def signature(self):
        return ("prior", self.manifold.name)

    def var_manifolds(self) -> List[str]:
        return [self.manifold.name]

    def residual_dim(self) -> int:
        return self.manifold.dof

    def data(self) -> Dict[str, np.ndarray]:
        return {"prior": self.prior}

    @classmethod
    def linearize(cls, manifolds, data, params, compute_jacobian):
        r = params[0] - data["prior"]
        if not compute_jacobian:
            return r, None
        d = r.shape[-1]
        J = jnp.broadcast_to(jnp.eye(d, dtype=r.dtype), r.shape[:-1] + (d, d))
        return r, [J]


class ManifoldPriorFactor(Factor):
    kind = "manifold_prior"

    def __init__(self, manifold, prior):
        if isinstance(manifold, str):
            manifold = get_manifold(manifold)
        self.manifold = manifold
        self.prior = np.asarray(prior, dtype=np.float64)
        if self.prior.shape != (manifold.storage_dim,):
            raise ValueError(
                f"ManifoldPriorFactor<{manifold.name}> prior must have shape "
                f"({manifold.storage_dim},), got {self.prior.shape}"
            )

    def signature(self):
        return ("manifold_prior", self.manifold.name)

    def var_manifolds(self) -> List[str]:
        return [self.manifold.name]

    def residual_dim(self) -> int:
        return self.manifold.dof

    def data(self) -> Dict[str, np.ndarray]:
        return {"prior": self.prior}

    @classmethod
    def linearize(cls, manifolds, data, params, compute_jacobian):
        G = manifolds[0]
        if not compute_jacobian:
            return G.minus(params[0], data["prior"]), None
        r, jx, _ = G.minus_j(params[0], data["prior"])
        return r, [jx]
