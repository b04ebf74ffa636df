"""Pallas TPU kernel: batched eigenvalue-conditioned symmetric 3x3 inverse.

The hottest per-landmark primitive in the Schur pipeline (venice: ~1M block
inverses per LM iteration; reference implicit_schur.rs:685-778 does this on
a rayon pool). TPU-native formulation:

- the [P, 3, 3] symmetric blocks are stored as 6 component PLANES of shape
  [P] laid out along lanes ([6, P] with P padded to the 128-lane tile), so
  every arithmetic op is a full-width VPU op — no 3x3 shapes anywhere;
- closed-form trigonometric eigenvalues decide the regularization (the
  reference's cond > 1e10 / min-eig floor rule), then the adjugate/det
  inverse — all elementwise;
- a 1D grid over lane-tiles streams the planes HBM -> VMEM.

Falls back to interpret mode off-TPU (used by the CPU test suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES  # 1024 blocks per grid step


def _kernel(h_ref, out_ref, *, eig_floor, cond_max, rel):
    # h_ref: [6, TILE] planes (a00, a01, a02, a11, a12, a22)
    a, b, c = h_ref[0, :], h_ref[1, :], h_ref[2, :]
    d, e = h_ref[3, :], h_ref[4, :]
    f = h_ref[5, :]

    # --- closed-form symmetric eigenvalue extrema (trigonometric) --------
    p1 = b * b + c * c + e * e
    q = (a + d + f) / 3.0
    p2 = (a - q) ** 2 + (d - q) ** 2 + (f - q) ** 2 + 2.0 * p1
    diag_only = p2 < 1e-30
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    ip = 1.0 / p
    B00, B11, B22 = (a - q) * ip, (d - q) * ip, (f - q) * ip
    B01, B02, B12 = b * ip, c * ip, e * ip
    detB = (
        B00 * (B11 * B22 - B12 * B12)
        - B01 * (B01 * B22 - B12 * B02)
        + B02 * (B01 * B12 - B11 * B02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    # cos(acos(r)/3) without acos (Mosaic has no acos lowering): solve the
    # triple-angle cubic 4t^3 - 3t = r for t in [0.5, 1] by Newton from the
    # near-exact init t0 = 0.5 + 0.5*sqrt((1+r)/2).
    t = 0.5 + 0.5 * jnp.sqrt(jnp.maximum((1.0 + r) * 0.5, 0.0))
    for _ in range(6):
        ft = 4.0 * t * t * t - 3.0 * t - r
        fp = jnp.maximum(12.0 * t * t - 3.0, 1e-3)
        t = jnp.clip(t - ft / fp, 0.5, 1.0)
    cos_phi = t
    sin_phi = jnp.sqrt(jnp.maximum(1.0 - t * t, 0.0))  # phi in [0, pi/3]
    e1 = q + 2.0 * p * cos_phi
    # cos(phi + 2pi/3) = -cos_phi/2 - (sqrt(3)/2) sin_phi
    e3 = q + 2.0 * p * (-0.5 * cos_phi - 0.8660254037844386 * sin_phi)
    e2 = 3.0 * q - e1 - e3
    emax = jnp.maximum(jnp.maximum(e1, e2), e3)
    emin = jnp.minimum(jnp.minimum(e1, e2), e3)
    dmax = jnp.maximum(jnp.maximum(a, d), f)
    dmin = jnp.minimum(jnp.minimum(a, d), f)
    emax = jnp.where(diag_only, dmax, emax)
    emin = jnp.where(diag_only, dmin, emin)

    # --- regularization ----------------------------------------------------
    bad = (emin < eig_floor) | (emax > cond_max * jnp.maximum(emin, eig_floor * 1e-3))
    reg = jnp.where(bad, jnp.abs(emin) + rel * jnp.maximum(emax, 1.0) + eig_floor, 0.0)
    a = a + reg
    d = d + reg
    f = f + reg

    # --- adjugate / determinant inverse -------------------------------------
    A11 = d * f - e * e
    A12 = c * e - b * f
    A13 = b * e - c * d
    A22 = a * f - c * c
    A23 = b * c - a * e
    A33 = a * d - b * b
    det = a * A11 + b * A12 + c * A13
    inv_det = 1.0 / det
    out_ref[0, :] = A11 * inv_det
    out_ref[1, :] = A12 * inv_det
    out_ref[2, :] = A13 * inv_det
    out_ref[3, :] = A22 * inv_det
    out_ref[4, :] = A23 * inv_det
    out_ref[5, :] = A33 * inv_det
    out_ref[6, :] = jnp.zeros_like(a)
    out_ref[7, :] = jnp.zeros_like(a)


@functools.partial(jax.jit, static_argnames=("interpret",))
def invert_landmark_blocks_pallas(Hpp, interpret: bool | None = None):
    """[P, 3, 3] symmetric blocks -> regularized inverses [P, 3, 3].

    Same semantics as linalg.schur.invert_landmark_blocks; layout is
    transformed to 6 lane-aligned component planes around the kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P = Hpp.shape[0]
    dt = Hpp.dtype
    f32 = dt == jnp.float32
    eig_floor = 1e-5 if f32 else 1e-12
    cond_max = 1e6 if f32 else 1e10
    rel = 1e-5 if f32 else 1e-8

    planes = jnp.stack(
        [
            Hpp[:, 0, 0], Hpp[:, 0, 1], Hpp[:, 0, 2],
            Hpp[:, 1, 1], Hpp[:, 1, 2], Hpp[:, 2, 2],
            jnp.zeros_like(Hpp[:, 0, 0]),  # pad to 8 sublanes (f32 tile is
            jnp.zeros_like(Hpp[:, 0, 0]),  # (8, 128); a 6-row block faults)
        ]
    )  # [8, P]
    Pp = -(-P // TILE) * TILE
    if Pp != P:
        pad = jnp.zeros((8, Pp - P), dtype=dt)
        pad = pad.at[0].set(1.0).at[3].set(1.0).at[5].set(1.0)  # identity blocks
        planes = jnp.concatenate([planes, pad], axis=1)

    # index map: use i*0 for the leading block index so both components are
    # i32 (a literal 0 traces as i64 under jax_enable_x64, and Mosaic
    # rejects mixed-width index tuples).
    out = pl.pallas_call(
        functools.partial(_kernel, eig_floor=eig_floor, cond_max=cond_max, rel=rel),
        grid=(Pp // TILE,),
        in_specs=[pl.BlockSpec((8, TILE), lambda i: (i * 0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, TILE), lambda i: (i * 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Pp), dt),
        interpret=interpret,
    )(planes)

    out = out[:6, :P]
    i00, i01, i02, i11, i12, i22 = out
    row0 = jnp.stack([i00, i01, i02], axis=-1)
    row1 = jnp.stack([i01, i11, i12], axis=-1)
    row2 = jnp.stack([i02, i12, i22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
