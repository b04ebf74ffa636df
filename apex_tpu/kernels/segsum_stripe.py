"""Pallas TPU kernel: stripe-layout sorted segment sum (gathers only,
static writes).

The Schur pipeline's widest reduction is out[s] = sum of [K, D] rows per
landmark segment (venice: K=5M rows to P~1M segments per PCG product).
XLA's scatter-add runs it at ~1% of HBM bandwidth (doc/performance.md).
Formulation here:

- **host plan**: segments are grouped into stripes of exactly M
  consecutive segments. A static gather matrix [nb, B, D-rows] pulls each
  stripe's member rows (zero-padded to the max stripe population B);
  local ids [nb, B] give each row's segment slot 0..M-1 inside its
  stripe.
- **kernel**: grid over stripes; per stripe build the one-hot [B, M]
  in-register from the local ids and contract it with the value rows —
  out[b] = onehot^T @ vals — entirely static shapes, each output block
  written exactly once. f32 exactness: the contraction runs at
  ``jax.lax.Precision.HIGHEST`` (3-pass MXU split); the one-hot operand
  is exactly representable, so results match the VPU reference to f32
  rounding.
- output [nb*M, D] rows ARE the segments in order (P padded up to
  nb*M) — no combine pass, no scatter anywhere.

Skew guard: a stripe whose population exceeds ``max_blowup``x the mean
makes the padded gather too wasteful — ``plan_stripes`` reports it and
callers fall back to the bucket path (linalg/segsum.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8
LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class StripePlan:
    num_segments: int
    num_rows: int  # K
    M: int  # segments per stripe
    B: int  # padded rows per stripe
    gather_idx: jnp.ndarray  # [nb, B] int32 into padded operand (K = zero row)
    local_ids: jnp.ndarray  # [nb, B] int32 slot 0..M-1 (pad rows -> M: no hit)
    nb: int


def plan_stripes(
    dest_ids, num_segments: int, segments_per_stripe: int = 512,
    max_blowup: float = 4.0,
) -> Optional[StripePlan]:
    """Host-side stripe plan over (possibly unsorted) dest_ids; the sort is
    composed into the gather indices. Returns None when stripe-population
    skew would pad more than ``max_blowup``x the mean (caller falls back)."""
    dest_ids = np.asarray(dest_ids).reshape(-1)
    K = int(dest_ids.shape[0])
    if K == 0 or num_segments == 0:
        return None
    M = int(min(segments_per_stripe, num_segments))
    nb = -(-num_segments // M)
    order = np.argsort(dest_ids, kind="stable").astype(np.int64)
    sorted_ids = dest_ids[order]
    stripe_of = sorted_ids // M
    pop = np.bincount(stripe_of, minlength=nb)
    B = int(pop.max())
    mean = max(K / nb, 1.0)
    if B > max_blowup * mean and B > 256:
        return None
    B = _round_up(max(B, SUBLANES), SUBLANES)

    starts = np.zeros(nb, dtype=np.int64)
    np.cumsum(pop[:-1], out=starts[1:])
    r = np.arange(B)
    pos = starts[:, None] + r[None, :]
    valid = r[None, :] < pop[:, None]
    gi = np.where(valid, order[np.minimum(pos, K - 1)], K)
    loc = np.where(valid, sorted_ids[np.minimum(pos, K - 1)] % M, M)
    return StripePlan(
        num_segments=num_segments,
        num_rows=K,
        M=M,
        B=B,
        gather_idx=jnp.asarray(gi.astype(np.int32)),
        local_ids=jnp.asarray(loc.astype(np.int32)),
        nb=nb,
    )


def _kernel(loc_ref, val_ref, out_ref, *, M, B):
    # loc_ref: [1, B] int32; val_ref: [1, B, D]; out_ref: [1, M, D]
    loc = loc_ref[0, :]
    onehot = (
        loc[:, None] == jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    ).astype(val_ref.dtype)
    # one-hot rows are exact in any precision; HIGHEST keeps the value
    # operand's f32 mantissa through the MXU (3-pass split)
    out_ref[0] = jax.lax.dot_general(
        onehot, val_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=val_ref.dtype,
    )


def apply_stripes(plan: StripePlan, vals, interpret: bool = False):
    """out[s] = sum of vals rows with dest_ids == s; vals [K, D]."""
    K, D = vals.shape
    assert K == plan.num_rows
    pad = jnp.zeros((1, D), vals.dtype)
    vp = jnp.concatenate([vals, pad], axis=0)
    gathered = vp[plan.gather_idx]  # [nb, B, D] — static, near-contiguous
    Dp = _round_up(D, 1)
    out = pl.pallas_call(
        lambda l, v, o: _kernel(l, v, o, M=plan.M, B=plan.B),
        grid=(plan.nb,),
        in_specs=[
            pl.BlockSpec((1, plan.B), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, plan.B, Dp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, plan.M, Dp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((plan.nb, plan.M, Dp), vals.dtype),
        interpret=interpret,
    )(plan.local_ids, gathered)
    return out.reshape(plan.nb * plan.M, Dp)[: plan.num_segments, :D]
