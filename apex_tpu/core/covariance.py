"""Covariance estimation post-convergence.

Mirrors reference problem.rs:1100-1147 + linalg/mod.rs:190-213: invert the
(undamped) Gauss-Newton Hessian H = J^T J at the solution and extract the
per-variable diagonal blocks in tangent space.

Note (SURVEY.md §3.4): the dense H^{-1} is O(D^2) memory — fine for
small/medium problems; use `compute_covariances_for` with a subset of
variables to solve only selected columns on large problems.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..linalg.dense import covariance_from_hessian
from .problem import CompiledProblem


def _global_free_mask(cp: CompiledProblem) -> np.ndarray:
    free = np.ones(cp.total_dof)
    for pool in cp.pools:
        cols = np.asarray(pool.cols)
        mask = np.asarray(pool.free_mask)
        for i in range(len(pool.names)):
            c = int(cols[i])
            free[c : c + pool.manifold.dof] = mask[i]
    return free


def _regularize_fixed(H, free):
    """Fixed DOFs have zeroed J columns, so H is singular there; pin them
    with unit diagonal so the factorization succeeds, then zero their
    covariance (a fixed variable has zero uncertainty)."""
    f = jnp.asarray(free, dtype=H.dtype)
    return H * f[:, None] * f[None, :] + jnp.diag(1.0 - f)


def compute_covariances(
    cp: CompiledProblem, values, names: Optional[Sequence[str]] = None
) -> Dict[str, np.ndarray]:
    H, _, _ = jax.jit(cp.assemble_normal)(values)
    free = _global_free_mask(cp)
    Sigma = covariance_from_hessian(_regularize_fixed(H, free))
    Sigma = np.asarray(Sigma) * free[:, None] * free[None, :]
    out = {}
    for pool in cp.pools:
        dof = pool.manifold.dof
        cols = np.asarray(pool.cols)
        for i, n in enumerate(pool.names):
            if names is not None and n not in names:
                continue
            c = int(cols[i])
            out[n] = Sigma[c : c + dof, c : c + dof]
    return out


def compute_covariances_for(
    cp: CompiledProblem, values, names: Sequence[str]
) -> Dict[str, np.ndarray]:
    """Block-diagonal covariance for selected variables only: solve
    H X = E_i for the selected columns (O(D * sum dof) instead of O(D^2))."""
    H, _, _ = jax.jit(cp.assemble_normal)(values)
    free = _global_free_mask(cp)
    cf = jax.scipy.linalg.cho_factor(_regularize_fixed(H, free), lower=True)
    out = {}
    for n in names:
        pid, row = cp.var_loc[n]
        pool = cp.pools[pid]
        dof = pool.manifold.dof
        c = int(np.asarray(pool.cols)[row])
        E = jnp.zeros((cp.total_dof, dof), dtype=H.dtype)
        E = E.at[c + jnp.arange(dof), jnp.arange(dof)].set(1.0)
        X = jax.scipy.linalg.cho_solve(cf, E)
        out[n] = np.asarray(X[c : c + dof, :])
    return out
