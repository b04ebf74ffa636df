"""Small linear-algebra utilities (reference src/linalg/utils.rs:14-41)."""

from __future__ import annotations

import jax
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


def spd_clamped_inv(blocks, rel_floor=None):
    """Batched symmetric inverse with eigenvalue clamping, guaranteed SPD.

    Replaces jnp.linalg.inv on preconditioner blocks for two reasons:
    (1) TPU's LuDecomposition only implements f32, so f64 problems failed
    to compile on TPU; (2) the entity-merged Schur-Jacobi blocks omit the
    pose<->intrinsics cross terms of S's true diagonal blocks and can be
    genuinely indefinite (observed min eigenvalue -4.8e3 on a 5-camera
    self-calibration problem) — a plain inverse then yields an indefinite
    preconditioner, which PCG does not tolerate in general. Clamping the
    eigenspectrum to a positive floor gives the nearest-in-spirit SPD
    preconditioner. eigh lowers on every backend at both dtypes."""
    if blocks.size == 0:
        return blocks
    if rel_floor is None:
        rel_floor = 1e-6 if blocks.dtype == jnp.float32 else 1e-12
    w, V = jnp.linalg.eigh(blocks)
    floor = jnp.maximum(jnp.max(jnp.abs(w), axis=-1, keepdims=True), 1.0)
    w = jnp.maximum(w, rel_floor * floor)
    hp = jax.lax.Precision.HIGHEST
    return jnp.matmul(V / w[..., None, :], jnp.swapaxes(V, -1, -2),
                      precision=hp)
