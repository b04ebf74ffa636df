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
    H X = E_i for the selected columns (O(D * sum dof) instead of O(D^2)).

    Band-shaped problems (post-RCM bandwidth within the panel budget)
    never materialize the dense H: the block-tridiagonal storage is
    assembled once and each unit column rides the banded CR solve —
    O(D*W) memory, so covariance queries work at 50k-pose scale where
    the dense [D, D] H would be hundreds of GB (reference parity:
    faer-factorization covariance, linalg/mod.rs:190-213)."""
    from ..linalg import banded as _banded

    D = cp.total_dof
    W = _banded.block_bandwidth(cp)
    if W <= 1536 and D > 4096:
        return _banded_covariances_for(cp, values, names)
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


def _banded_covariances_for(
    cp: CompiledProblem, values, names: Sequence[str]
) -> Dict[str, np.ndarray]:
    """Selected covariance blocks via the block-tridiagonal band: fixed
    DOFs are pinned in band form (rows/cols zeroed, unit diagonal), then
    each requested unit column is one banded CR solve."""
    from ..linalg import banded as _banded

    asm = _banded.BandedNormalAssembler(cp)
    core = _banded.make_blocktri_cr_core(cp.total_dof, asm.m, cp.dtype)
    D, m, n_blk, Dp = asm.D, asm.m, asm.n, asm.Dp
    Dg, Cg, _, _ = asm.assemble(values)
    Dg = asm.pad_diag_ones(Dg)
    free = _global_free_mask(cp)
    fb = jnp.asarray(
        np.pad(free, (0, Dp - D), constant_values=1.0).reshape(n_blk, m),
        dtype=cp.dtype)
    fb_prev = jnp.concatenate([fb[:1] * 0.0, fb[:-1]])
    Dg = Dg * fb[:, :, None] * fb[:, None, :]
    # unit diagonal on pinned DOFs so the factorization stays SPD
    eye_mask = (1.0 - fb)[:, :, None] * jnp.eye(m, dtype=cp.dtype)[None]
    Dg = Dg + eye_mask
    Cg = Cg * fb[:, :, None] * fb_prev[:, None, :]

    solve = jax.jit(lambda bp: core(Dg, Cg, bp))
    out = {}
    for nme in names:
        pid, row = cp.var_loc[nme]
        pool = cp.pools[pid]
        dof = pool.manifold.dof
        c = int(np.asarray(pool.cols)[row])
        cols = []
        for j in range(dof):
            e = jnp.zeros((Dp,), dtype=cp.dtype).at[c + j].set(1.0)
            cols.append(np.asarray(solve(e.reshape(n_blk, m)))[c:c + dof])
        Sigma = np.stack(cols, axis=1)
        fblk = free[c:c + dof]
        out[nme] = Sigma * fblk[:, None] * fblk[None, :]
    return out
