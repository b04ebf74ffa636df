"""Recursive blocked Cholesky (linalg/dense_chol.py): parity with the
reference factorization/solve across sizes that exercise the recursion
(leaf, one split, deep unaligned splits), both dtypes, and the compensated
matmul hook used on degraded-MXU backends."""

import numpy as np
import jax.numpy as jnp
import pytest

from apex_tpu.linalg.dense_chol import (
    recursive_cholesky,
    recursive_cho_solve,
    tri_solve_right_t,
)
from apex_tpu.linalg.banded import _mm_split


def _spd(n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    return (M @ M.T + n * np.eye(n)).astype(dtype)


@pytest.mark.parametrize("n", [64, 512, 700, 1290, 2049])
def test_recursive_cholesky_matches_reference(n):
    A = _spd(n, np.float64)
    L = np.asarray(recursive_cholesky(jnp.asarray(A), leaf=256))
    Lref = np.linalg.cholesky(A)
    assert np.abs(L - Lref).max() / np.abs(Lref).max() < 1e-12
    assert np.abs(np.triu(L, 1)).max() == 0.0


@pytest.mark.parametrize("n", [700, 1290])
def test_recursive_cho_solve(n):
    A = _spd(n, np.float64, seed=1)
    rng = np.random.default_rng(2)
    b = rng.normal(size=(n,))
    L = recursive_cholesky(jnp.asarray(A), leaf=256)
    x = np.asarray(recursive_cho_solve(L, jnp.asarray(b), leaf=256))
    xref = np.linalg.solve(A, b)
    assert np.abs(x - xref).max() / np.abs(xref).max() < 1e-10
    # matrix RHS
    B = rng.normal(size=(n, 3))
    X = np.asarray(recursive_cho_solve(L, jnp.asarray(B), leaf=256))
    assert np.abs(X - np.linalg.solve(A, B)).max() < 1e-8


def test_tri_solve_right_t_matches_reference():
    n, m = 900, 300
    A = _spd(n, np.float64, seed=3)
    L = np.linalg.cholesky(A)
    rng = np.random.default_rng(4)
    B = rng.normal(size=(m, n))
    X = np.asarray(tri_solve_right_t(jnp.asarray(L), jnp.asarray(B),
                                     leaf=256))
    assert np.abs(X @ L.T - B).max() < 1e-9


def test_recursive_cholesky_f32_with_compensated_mm():
    """The compensated (hi/lo split) GEMM hook keeps f32 factorization
    accuracy when plugged in — same API the general-sparse core uses on
    degraded-MXU backends."""
    n = 1100
    A = _spd(n, np.float32, seed=5)
    L = np.asarray(recursive_cholesky(jnp.asarray(A), leaf=256,
                                      mm=_mm_split))
    Lref = np.linalg.cholesky(A.astype(np.float64))
    assert np.abs(L - Lref).max() / np.abs(Lref).max() < 1e-4
