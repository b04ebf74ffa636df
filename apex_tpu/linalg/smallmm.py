"""Exact small-contraction einsum for TPU.

TPU matmuls run the MXU at bf16 input precision by default, which corrupts
second-order solver math in f32 (observed: BA diverging on TPU, clean on
CPU); forcing higher matmul precision crashes the current libtpu at scale.
The TPU-native answer for the tiny contractions that dominate this
framework (3x3 rotation chains, [K,2,9] Jacobian blocks, 9-DOF entity
blocks) is to keep them OFF the MXU entirely: unroll the contracted axis
into full-width VPU multiply-adds — exact f32 and faster than bf16
tiny-batched matmuls.

``es(spec, a, b)`` is a drop-in for ``jnp.einsum`` on two operands: when
the spec contracts exactly one axis of size <= MAX_UNROLL it unrolls,
otherwise it falls back to jnp.einsum.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_UNROLL = 16


def _letters(s: str):
    return s.replace("...", "")


def _axis_of(sub: str, letter: str) -> int:
    """Axis index (negative, from the right) of `letter` in subscript `sub`
    which may start with '...'."""
    tail = _letters(sub)
    return -(len(tail) - tail.index(letter))


def es(spec: str, a, b):
    """Two-operand einsum with exact unrolled contraction for small axes."""
    ins, out = spec.split("->")
    sa, sb = ins.split(",")
    contracted = [
        c for c in set(_letters(sa)) & set(_letters(sb)) if c not in _letters(out)
    ]
    if len(contracted) != 1:
        return jnp.einsum(spec, a, b)
    c = contracted[0]
    ax_a = _axis_of(sa, c)
    ax_b = _axis_of(sb, c)
    n = a.shape[ax_a]
    if n == 0 or n > MAX_UNROLL:
        return jnp.einsum(spec, a, b)
    sa2 = sa.replace(c, "")
    sb2 = sb.replace(c, "")
    spec2 = f"{sa2},{sb2}->{out}"
    acc = None
    for i in range(n):
        term = jnp.einsum(spec2, jnp.take(a, i, axis=ax_a), jnp.take(b, i, axis=ax_b))
        acc = term if acc is None else acc + term
    return acc


def vdot(a, b):
    """Exact f32 inner product (elementwise multiply + sum reduction —
    reductions don't go through the MXU)."""
    return jnp.sum(a * b)
