"""BetweenFactor — relative-pose constraint for any Lie group.

Semantics match the reference (src/factors/between_factor.rs:268-322):
params = [pose_i, pose_j] and

    d = pose_j.between(pose_i) = T_j^{-1} ∘ T_i        (step 1)
    e = d ∘ T_meas                                      (step 2)
    r = Log(e)                                          (step 3)

with the analytic chain-rule Jacobian [dr/dpose_i | dr/dpose_j],
shape (dof, 2*dof). Here the whole 3-step chain is one fused batched kernel
per manifold type (SURVEY.md §3.3's "TPU mapping").
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np
from ..linalg.smallmm import es as _es

from ..manifolds import get as get_manifold
from .base import Factor


class BetweenFactor(Factor):
    kind = "between"

    def __init__(self, manifold, measurement):
        if isinstance(manifold, str):
            manifold = get_manifold(manifold)
        self.manifold = manifold
        self.measurement = np.asarray(measurement, dtype=np.float64)
        if self.measurement.shape != (manifold.storage_dim,):
            raise ValueError(
                f"BetweenFactor<{manifold.name}> measurement must have shape "
                f"({manifold.storage_dim},), got {self.measurement.shape}"
            )

    def signature(self):
        return ("between", self.manifold.name)

    def var_manifolds(self) -> List[str]:
        return [self.manifold.name, self.manifold.name]

    def residual_dim(self) -> int:
        return self.manifold.dof

    def data(self) -> Dict[str, np.ndarray]:
        return {"meas": self.measurement}

    @classmethod
    def linearize(cls, manifolds, data, params, compute_jacobian):
        G = manifolds[0]
        xi, xj = params
        meas = data["meas"]
        if not compute_jacobian:
            r = G.log(G.compose(G.between(xj, xi), meas))
            return r, None

        # Step 1: d = xj.between(xi), Jacobians wrt xj and xi
        d, jd_xj, jd_xi = G.between_j(xj, xi)
        # Step 2: e = d ∘ meas, Jacobian wrt d only
        e, je_d, _ = G.compose_j(d, meas)
        # Step 3: r = Log(e)
        r, jr_e = G.log_j(e)

        chain = _es("...ij,...jk->...ik", jr_e, je_d)
        j_xi = _es("...ij,...jk->...ik", chain, jd_xi)
        j_xj = _es("...ij,...jk->...ik", chain, jd_xj)
        return r, [j_xi, j_xj]
