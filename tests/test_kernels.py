"""Pallas kernel tests (interpret mode on the CPU suite)."""

import jax
import jax.numpy as jnp
import numpy as np

from apex_tpu.kernels import invert_landmark_blocks_pallas
from apex_tpu.linalg.schur import invert_landmark_blocks


def _blocks(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, 3, 3))
    H = A @ np.transpose(A, (0, 2, 1)) + 0.1 * np.eye(3)
    H[5] = np.diag([1e-15, 1.0, 1.0])  # near-singular
    H[17] = np.zeros((3, 3))  # fully degenerate
    H[100] *= 1e12  # huge scale
    return H


def test_pallas_matches_xla_formulation():
    H = _blocks()
    ref = np.asarray(invert_landmark_blocks(jnp.asarray(H)))
    ker = np.asarray(invert_landmark_blocks_pallas(jnp.asarray(H)))
    rel = np.abs(ref - ker) / (np.abs(ref) + 1.0)
    assert rel.max() < 1e-7
    assert np.all(np.isfinite(ker))


def test_pallas_nontile_size():
    H = _blocks(777, seed=3)
    ref = np.asarray(invert_landmark_blocks(jnp.asarray(H)))
    ker = np.asarray(invert_landmark_blocks_pallas(jnp.asarray(H)))
    np.testing.assert_allclose(ker, ref, rtol=1e-6, atol=1e-10)


def test_pallas_f32():
    H = _blocks(512, seed=5).astype(np.float32)
    ker = np.asarray(invert_landmark_blocks_pallas(jnp.asarray(H)))
    ref = np.asarray(invert_landmark_blocks(jnp.asarray(H)))
    assert np.all(np.isfinite(ker))
    np.testing.assert_allclose(ker, ref, rtol=1e-3, atol=1e-4)


def test_inverse_is_actually_inverse():
    rng = np.random.default_rng(7)
    A = rng.normal(size=(64, 3, 3))
    H = A @ np.transpose(A, (0, 2, 1)) + 0.5 * np.eye(3)
    inv = np.asarray(invert_landmark_blocks_pallas(jnp.asarray(H)))
    prod = np.einsum("kij,kjl->kil", H, inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(3), (64, 1, 1)), atol=1e-8)


# TestStripeSegmentSum removed in round 3: the stripe kernel was retired
# after hardware qualification — at the venice shape (4M rows -> 1M
# segments, f32 [K,3]) it measured 4.22 ms vs the XLA bucket path's
# 3.25 ms with a 234 s first compile (doc/performance.md "Pallas
# qualification"). The bucket gather plan (linalg/segsum.py) remains the
# production path and is tested in test_misc/test_schur suites.
