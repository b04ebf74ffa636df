"""Factor protocol for apex-tpu.

The reference (src/factors/mod.rs:191-228) defines a ``Factor`` trait with
``linearize(&[DVector], compute_jacobian)`` evaluated per residual block via
dynamic dispatch. TPU-first redesign: a factor instance is a lightweight
host-side **descriptor**; all instances sharing a signature are compiled into
one **factor group**, and linearization is a single fused, batched kernel
over stacked parameter/data arrays — no per-block dispatch.

A Factor subclass provides:
- ``signature()``: hashable grouping key (same signature => one kernel)
- ``var_manifolds()``: manifold name per variable slot
- ``residual_dim()``
- ``data()``: dict of per-factor constant arrays (stacked along axis 0 when
  the group is built)
- classmethod ``linearize(manifolds, data, params, compute_jacobian)``:
  batched kernel mapping stacked params ``[K, S_i]`` to residuals ``[K, d]``
  and per-slot Jacobians ``[K, d, dof_i]``.

Custom factors (the reference's Rosenbrock-style extension path,
levenberg_marquardt.rs:1103-1137) subclass Factor and implement the same
batched kernel; autodiff Jacobians are available via
:class:`AutoDiffFactor`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Factor:
    kind: str = "factor"

    def signature(self):
        raise NotImplementedError

    def var_manifolds(self) -> List[str]:
        raise NotImplementedError

    def residual_dim(self) -> int:
        raise NotImplementedError

    def data(self) -> Dict[str, np.ndarray]:
        return {}

    @classmethod
    def linearize(
        cls,
        manifolds: Sequence,
        data: Dict[str, jnp.ndarray],
        params: Sequence[jnp.ndarray],
        compute_jacobian: bool,
    ) -> Tuple[jnp.ndarray, Optional[List[jnp.ndarray]]]:
        raise NotImplementedError


class AutoDiffFactor(Factor):
    """Base for custom factors: implement only the batched residual
    ``residual(manifolds, data, params) -> [K, d]``; Jacobians (with respect
    to right perturbations of each variable slot) come from forward-mode
    autodiff, exactly like a hand-chained manifold Jacobian."""

    @classmethod
    def residual(cls, manifolds, data, params):
        raise NotImplementedError

    @classmethod
    def linearize(cls, manifolds, data, params, compute_jacobian):
        r = cls.residual(manifolds, data, params)
        if not compute_jacobian:
            return r, None

        jacs = []
        for slot, G in enumerate(manifolds):
            def single(deltas, *per_block):
                ps = list(per_block[: len(params)])
                ds = per_block[len(params):]
                ps[slot] = G.plus(ps[slot], deltas)
                d1 = {k: v for k, v in zip(sorted(data.keys()), ds)}
                return cls.residual(manifolds, d1, ps)

            data_leaves = [data[k] for k in sorted(data.keys())]

            def per_block_fn(delta, *args):
                return single(delta, *args)

            zero = jnp.zeros(params[0].shape[:-1] + (G.dof,), dtype=params[0].dtype)
            jac_fn = jax.vmap(
                lambda d, *a: jax.jacfwd(lambda dd: per_block_fn(dd[None], *[x[None] for x in a])[0])(d)
            )
            jacs.append(jac_fn(zero, *params, *data_leaves))
        return r, jacs
