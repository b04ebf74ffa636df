"""Global numerical configuration for apex-tpu.

The reference solver (apex-solver, Rust) computes everything in f64. On TPU,
f64 is software-emulated and slow, so apex-tpu threads an explicit dtype
policy through the whole stack:

- ``default_dtype()`` — dtype used for manifold storage, residuals, Jacobians.
- f64 requires ``jax_enable_x64``; we turn it on at import unless the user
  opts out with ``APEX_TPU_NO_X64=1`` (then everything runs in f32).

Hot paths are written dtype-generic; precision-critical accumulations
(H, g, PCG dot products) are always promoted to the accumulation dtype.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_X64_DISABLED = os.environ.get("APEX_TPU_NO_X64", "0") == "1"

if not _X64_DISABLED:
    jax.config.update("jax_enable_x64", True)

# TPU matmuls default to bf16 inputs on the MXU; for a second-order solver
# that silently destroys the normal equations (observed: f32 BA diverging
# to NaN on TPU while bit-identical on CPU). The framework therefore keeps
# every solver-critical small contraction OFF the MXU via unrolled VPU
# multiply-adds (linalg/smallmm.py) instead of raising the global matmul
# precision — forcing "high"/"highest" crashes the current libtpu at scale.
# APEX_TPU_MATMUL_PRECISION=(high|highest) remains available for platforms
# where it is stable.
_prec = os.environ.get("APEX_TPU_MATMUL_PRECISION", "")
if _prec and _prec != "default":
    jax.config.update("jax_default_matmul_precision", _prec)


def default_dtype() -> jnp.dtype:
    """Storage/compute dtype for manifold values, residuals and Jacobians."""
    return jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 else jnp.dtype(jnp.float32)


def accum_dtype() -> jnp.dtype:
    """Accumulation dtype for H/g assembly and PCG inner products."""
    return jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 else jnp.dtype(jnp.float32)


# Threshold for switching between exact formulas and Taylor expansions in
# small-angle computations. Compared against theta^2, matching the reference
# (apex-manifolds lib.rs:47-61): effective angle threshold ~1e-5 rad.
SMALL_ANGLE_THRESHOLD = 1e-10


def small_angle_threshold(dtype) -> float:
    """Small-angle switch threshold, loosened in f32 where 1e-10 underflows
    the usable precision of the exact branch."""
    if jnp.dtype(dtype) == jnp.float32:
        return 1e-6
    return SMALL_ANGLE_THRESHOLD
