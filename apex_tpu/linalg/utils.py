"""Small linear-algebra utilities (reference src/linalg/utils.rs:14-41)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sparse_to_dense(rows, cols, vals, shape):
    """COO triplets -> dense matrix (duplicates accumulate)."""
    M = jnp.zeros(shape, dtype=jnp.asarray(vals).dtype)
    return M.at[jnp.asarray(rows), jnp.asarray(cols)].add(jnp.asarray(vals))


def dense_to_sparse(M, threshold: float = 0.0):
    """Dense matrix -> COO triplets, dropping |v| <= threshold.
    Host-side (numpy) — sparsity patterns are static metadata in this
    framework."""
    M = np.asarray(M)
    rows, cols = np.nonzero(np.abs(M) > threshold)
    return rows.astype(np.int32), cols.astype(np.int32), M[rows, cols]


def block_diag_matvec(blocks, bases, x):
    """y = blockdiag(blocks) @ x where blocks[i] sits at bases[i]."""
    d = blocks.shape[-1]
    cols = bases[:, None] + jnp.arange(d, dtype=bases.dtype)
    xb = x[cols]
    y = jnp.zeros_like(x)
    return y.at[cols].add(jnp.einsum("kij,kj->ki", blocks, xb))
