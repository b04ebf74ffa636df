"""Plane-layout implicit-Schur pipeline for uniform (bucketed) BA layouts.

Why this exists: TPU tiles pad the trailing two dims of every array to
(8, 128), so the block-shaped intermediates of the generic Schur path —
W [K, 9, 3], H_pp [P, 3, 3], J [K, 2, 6] — cost 14-85x their logical
bytes in HBM (a venice-scale [5M, 6, 6] buffer allocates 20.5 GB), and
K-sized gathers/scatters run scalar-bound. With the bucketed canonical
layout from build_ba_problem (landmarks renumbered bucket-major, each
landmark's observation run padded to a power-of-two cap with weight-0
rows), everything collapses:

- per-observation blocks live as PLANES ([d, K] rows of K) — tile
  padding ~1x instead of 14-85x;
- every landmark-direction segment sum is a dense
  ``reshape(n, cap).sum(1)`` placed at a static slice;
- every landmark-direction gather is a static slice + broadcast;
- landmark 3x3 blocks are six symmetric planes [6, P] with a closed-form
  eigenvalue-clamped inverse (same math as linalg/schur.py's
  invert_landmark_blocks, reference implicit_schur.rs:685-778);
- only the camera-entity direction (E ~ thousands) keeps a gather and a
  scatter segment-sum per product, both over small tables.

SchurContext builds a UniformSchur when every factor group fits the
layout; schur.py's block path remains the general fallback.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# symmetric 3x3 plane order
SYM6 = {(0, 0): 0, (0, 1): 1, (0, 2): 2, (1, 1): 3, (1, 2): 4, (2, 2): 5}


def sym6_matvec(h6, v3):
    """[6, ...] x [3, ...] -> [3, ...]."""
    return jnp.stack([
        h6[0] * v3[0] + h6[1] * v3[1] + h6[2] * v3[2],
        h6[1] * v3[0] + h6[3] * v3[1] + h6[4] * v3[2],
        h6[2] * v3[0] + h6[4] * v3[1] + h6[5] * v3[2],
    ])


def sym6_eig_extrema(h6):
    """(min, max) eigenvalues of symmetric 3x3 planes (trigonometric)."""
    a, b, c, d, e, f = h6[0], h6[1], h6[2], h6[3], h6[4], h6[5]
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
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    lo = jnp.minimum(jnp.minimum(e1, e2), e3)
    hi = jnp.maximum(jnp.maximum(e1, e2), e3)
    dlo = jnp.minimum(jnp.minimum(a, d), f)
    dhi = jnp.maximum(jnp.maximum(a, d), f)
    return jnp.where(diag_only, dlo, lo), jnp.where(diag_only, dhi, hi)


def sym6_clamped_inv(h6):
    """Eigenvalue-conditioned regularized inverse on planes — the plane
    form of linalg/schur.py::invert_landmark_blocks (same thresholds)."""
    f32 = h6.dtype == jnp.float32
    eig_floor = 1e-5 if f32 else 1e-12
    cond_max = 1e6 if f32 else 1e10
    rel = 1e-5 if f32 else 1e-8
    emin, emax = sym6_eig_extrema(h6)
    bad = (emin < eig_floor) | (emax > cond_max * jnp.maximum(emin, eig_floor * 1e-3))
    reg = jnp.where(bad, jnp.abs(emin) + rel * jnp.maximum(emax, 1.0) + eig_floor, 0.0)
    a = h6[0] + reg
    b, c = h6[1], h6[2]
    d = h6[3] + reg
    e = h6[4]
    f = h6[5] + reg
    A11 = d * f - e * e
    A12 = c * e - b * f
    A13 = b * e - c * d
    A22 = a * f - c * c
    A23 = b * c - a * e
    A33 = a * d - b * b
    det = a * A11 + b * A12 + c * A13
    inv_det = 1.0 / det
    return jnp.stack([A11, A12, A13, A22, A23, A33]) * inv_det


@dataclasses.dataclass(frozen=True)
class _UGroup:
    """Uniform factor group: landmark runs of length cap covering the
    consecutive landmark range [lo, lo+n)."""

    gi: int
    cap: int
    lo: int
    n: int
    ent_ids: jnp.ndarray  # [K]
    perm_ent: Optional[jnp.ndarray]
    ent_sorted: Optional[jnp.ndarray]
    cam_locs: Dict[int, int]  # cam slot -> entity-local column offset
    lm_slot: Optional[int]


def detect_uniform(ctx) -> Optional["UniformSchur"]:
    """Build the plane pipeline when every group fits the uniform layout:
    all camera slots have a fixed entity-local offset, and each group's
    landmark ids are consecutive runs of equal length covering a
    consecutive range disjoint from other groups'.

    Also records host-side per-group metadata (``host_meta``) so the
    sharded twin (parallel/schur_planes_sharded.py) can partition the
    observation planes and landmark ranges across a device mesh without
    pulling anything back from the device."""
    cp = ctx.cp
    ugroups: List[_UGroup] = []
    host_meta = []
    ranges = []
    for gi, g in enumerate(cp.groups):
        kinds = ctx.slot_kind[gi]
        lm_slots = [s for s, k in enumerate(kinds) if k == "lm"]
        cam_slots = [s for s, k in enumerate(kinds) if k == "cam"]
        mci = ctx._mc_of_group.get(gi)
        if lm_slots and mci is None:
            return None  # landmark-only group (e.g. landmark prior)
        cam_locs = {}
        if mci is not None:
            mc = ctx.mcouplings[mci]
            for s in cam_slots:
                kind, loc = mc.slot_loc[s]
                if kind != "u":
                    return None
                cam_locs[s] = loc
            lm, ent_host = ctx._mc_host[mci]  # host copies — never pull from device
            K = lm.shape[0]
            runs = np.nonzero(np.diff(lm))[0]
            cap = int(runs[0] + 1) if runs.size else K
            if cap == 0 or K % cap:
                return None
            lm_u = lm[::cap]
            if not (lm.reshape(-1, cap) == lm_u[:, None]).all():
                return None
            if lm_u.size > 1 and not (np.diff(lm_u) == 1).all():
                return None
            lo, n = int(lm_u[0]), int(lm_u.size)
            ranges.append((lo, lo + n))
            ugroups.append(_UGroup(
                gi=gi, cap=cap, lo=lo, n=n,
                ent_ids=mc.ent_ids, perm_ent=mc.perm_ent,
                ent_sorted=mc.ent_sorted, cam_locs=cam_locs,
                lm_slot=mc.lm_slot,
            ))
            host_meta.append(dict(gi=gi, cap=cap, lo=lo, n=n,
                                  ent_host=ent_host, cam_locs=cam_locs,
                                  lm_slot=mc.lm_slot))
        else:
            # camera-only group (e.g. pose priors): offsets must still be
            # uniform, and its entity ids come straight from the reduced
            # column map (all slots of one factor share an entity).
            ent_host = None
            for s in cam_slots:
                base = ctx.red_of_global[ctx._gcols(gi, s)]
                loc = base - (base // ctx.entity_dof) * ctx.entity_dof
                if loc.size and not (loc == loc[0]).all():
                    return None
                cam_locs[s] = int(loc[0]) if loc.size else 0
                if ent_host is None:
                    ent_host = (base // ctx.entity_dof).astype(np.int64)
            if ent_host is None:  # no slots at all — degenerate group
                ent_host = np.zeros(g.count, dtype=np.int64)
            ugroups.append(_UGroup(
                gi=gi, cap=0, lo=0, n=0,
                ent_ids=jnp.asarray(ent_host.astype(np.int32)),
                perm_ent=None, ent_sorted=None,
                cam_locs=cam_locs, lm_slot=None,
            ))
            host_meta.append(dict(gi=gi, cap=0, lo=0, n=0,
                                  ent_host=ent_host, cam_locs=cam_locs,
                                  lm_slot=None))
    ranges.sort()
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        if b0 < a1:
            return None  # overlapping landmark ranges
    u = UniformSchur(ctx, ugroups)
    u.host_meta = host_meta
    return u


class UniformSchur:
    def __init__(self, ctx, ugroups: List[_UGroup]):
        self.ctx = ctx
        self.ugroups = ugroups
        # landmark-plane extent: the sharded subclass narrows this to its
        # per-chip partition (sum of local range lengths)
        self.num_landmarks = ctx.num_landmarks
        self.host_meta = None  # set by detect_uniform

    # -- sharding hooks ----------------------------------------------------
    # The multi-chip twin (parallel/schur_planes_sharded.py) subclasses
    # with: _group -> the chip-local factor group, _allreduce -> psum over
    # the mesh axis. Single-chip semantics are the identity versions.

    def _group(self, gi):
        return self.ctx.cp.groups[gi]

    def _allreduce(self, x):
        return x

    def _pvary(self, x):
        """Mark a replicated value as device-varying (shard_map loop
        carries must match the varying type of the sharded body output;
        identity on one chip)."""
        return x

    # -- helpers ----------------------------------------------------------

    # rows per chunk when reducing wide [K, n] stacks to entities: the
    # stacked operand tile-pads n -> 128 lanes, so chunking bounds that
    # transient at CHUNK*128*4 bytes (~0.5 GB) instead of K*128*4 (~3.3 GB
    # per stack at venice scale, several of which used to be live at once).
    ENT_CHUNK = 1 << 20

    # entity count below which the one-hot contraction is preferred on
    # TPU: its cost scales with K*E (one-hot tiles), the scatter's with K
    # alone, so it only pays while E fits a few MXU tiles. BA entity
    # tables (cameras) are O(thousands); measured at venice scale
    # (K=6.3M, E=1778): scatter 49 ms vs one-hot 21 ms per 9-plane sum.
    ONEHOT_MAX_E = 4096
    ONEHOT_CHUNK = 8192
    ONEHOT_MIN_K = 1 << 17

    def _ent_planes_segsum(self, ug: _UGroup, planes, exact=False):
        """list of n [K] planes -> [E, n] entity sums, chunked over K.
        ``exact`` requests f32-faithful accumulation on the one-hot MXU
        path (hi/lo split); the segment-sum paths are exact already."""
        E = self.ctx.num_entities
        n = len(planes)
        K = int(planes[0].shape[0])
        if (K >= self.ONEHOT_MIN_K and E <= self.ONEHOT_MAX_E
                and jax.default_backend() == "tpu"):
            return self._onehot_segsum(ug, planes, exact=exact)
        C = self.ENT_CHUNK
        if K <= C:
            return jax.ops.segment_sum(
                jnp.stack(planes, axis=1), ug.ent_ids, num_segments=E)
        arr = jax.lax.optimization_barrier(jnp.stack(planes, axis=0))  # [n, K]
        nc = -(-K // C)
        Kp = nc * C
        arr = jnp.pad(arr, ((0, 0), (0, Kp - K)))
        ids = jnp.pad(ug.ent_ids, (0, Kp - K), constant_values=E)

        def body(i, acc):
            sl = jax.lax.dynamic_slice(arr, (0, i * C), (n, C))
            ii = jax.lax.dynamic_slice(ids, (i * C,), (C,))
            return acc + jax.ops.segment_sum(sl.T, ii, num_segments=E + 1)

        acc0 = jnp.zeros((E + 1, n), dtype=planes[0].dtype)
        return jax.lax.fori_loop(0, nc, body, acc0)[:E]

    def _onehot_segsum(self, ug: _UGroup, planes, exact=False):
        """Entity segment-sum as a chunked one-hot MXU contraction:
        out[e, i] = sum_k [ids[k] == e] * planes[i][k]. The random-access
        scatter-add becomes per-chunk (one_hot[C, E+1])^T @ planes[n, C]^T
        dots — every memory access is sequential and the reduction rides
        the MXU. The [n, K] stack keeps K in the lane dimension (a [K, n]
        layout would tile-pad n -> 128 lanes, 14x HBM at BA scale), and
        fori_loop + dynamic_slice avoids scan's materialized xs operand.

        Precision: the TPU MXU truncates f32 operands to bf16 (measured
        2.3e-3 max relative error vs an exact f64 sum at venice scale; the
        per-op Precision flag is IGNORED by the current libtpu — HIGH and
        HIGHEST return the same bf16-level error, and forcing a global
        default crashes it, see commit bd49e71). ``exact=True`` splits the
        values into hi/lo bf16-representable halves and runs two dot
        products with exactly-representable operands (error ~2^-18,
        ~500x tighter, 2x the matmul time) — used for the once-per-LM-
        iteration H/g ASSEMBLY sums; the per-PCG-iteration products keep
        the single pass (PCG tolerance is orders above 2.3e-3)."""
        E = self.ctx.num_entities
        n = len(planes)
        K = int(planes[0].shape[0])
        dt = planes[0].dtype
        C = self.ONEHOT_CHUNK
        arr = jax.lax.optimization_barrier(jnp.stack(planes, axis=0))  # [n, K]
        nc = -(-K // C)
        Kp = nc * C
        if Kp > K:
            arr = jnp.pad(arr, ((0, 0), (0, Kp - K)))
        ids = jnp.pad(ug.ent_ids, (0, Kp - K), constant_values=E)
        split = exact and dt == jnp.float32
        if split:
            # mask-based bf16 rounding (banded._bf16_trunc), NOT
            # astype(bf16).astype(f32): XLA folds convert chains feeding a
            # default-precision dot back to the unsplit operand, which
            # would silently cancel the hi/lo correction (measured on TPU:
            # a convert-form split returns bit-identical error to a plain
            # default matmul — see banded._bf16_trunc docstring).
            from .banded import _bf16_trunc

            hi = _bf16_trunc(arr)
            arr = jnp.concatenate([hi, arr - hi], axis=0)  # [2n, K]

        def body(i, acc):
            sl = jax.lax.dynamic_slice(
                arr, (0, i * C), (2 * n if split else n, C))
            ii = jax.lax.dynamic_slice(ids, (i * C,), (C,))
            oh = (ii[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (C, E + 1), 1)).astype(dt)  # [C, E+1]
            return acc + jax.lax.dot_general(
                oh, sl, (((0,), (1,)), ((), ())),
                preferred_element_type=dt)  # [E+1, n or 2n]

        acc0 = jnp.zeros((E + 1, 2 * n if split else n), dtype=dt)
        out = jax.lax.fori_loop(0, nc, body, acc0)[:E]
        if split:
            out = out[:, :n] + out[:, n:]
        return out

    def _lm_reduce(self, ug: _UGroup, plane):
        """[K] plane -> [n] sums over each landmark's cap-run.

        When the cap divides the 128-lane tile, the run sum is a matmul
        against a constant [128, 128/cap] 0/1 matrix: each 128-lane row of
        the plane holds 128/cap whole runs, and the VPU-hostile cross-lane
        ``reshape(n, cap).sum(1)`` becomes an MXU contraction. Measured at
        venice scale (6.3M obs, caps 4/8/16) inside wt_x: 130 ms -> 60 ms
        for the whole product (reshape-sum variant vs matmul variant)."""
        cap, n = ug.cap, ug.n
        if cap > 1 and 128 % cap == 0:
            L = 128 // cap
            M = np.zeros((128, L), np.float32)
            for l in range(L):
                M[l * cap:(l + 1) * cap, l] = 1.0
            K = n * cap
            rows = -(-K // 128)
            pad = rows * 128 - K
            pl = jnp.pad(plane, (0, pad)) if pad else plane
            out = pl.reshape(rows, 128) @ jnp.asarray(M, plane.dtype)
            return out.reshape(-1)[:n]
        return plane.reshape(n, cap).sum(axis=1)

    def _lm_expand(self, ug: _UGroup, seg):
        """[n, ...] -> [K, ...] broadcast each landmark row over its run."""
        reps = jnp.broadcast_to(
            seg[:, None], (ug.n, ug.cap) + seg.shape[1:])
        return reps.reshape((ug.n * ug.cap,) + seg.shape[1:])

    def _linearize_planes(self, values, g):
        """Linearize and materialize residual/Jacobians ONCE in compact
        plane form, with the robust corrector applied plane-wise. The
        barriers matter: without them XLA either materializes the
        [K, rd, dof] block shapes (tile-padded up to 85x at venice scale —
        the generic path's corrector even concatenates a [K, rd, sum_dof]
        Jacobian) or re-fuses the whole linearization into each of the
        ~27 downstream plane reads."""
        cp = self.ctx.cp
        params = cp._gather(values, g)
        r, jacs = g.kernel(g.manifolds, g.data, params, True)
        if g.weights is not None:
            r = r * g.weights[:, None]
            jacs = [j * g.weights[:, None, None] for j in jacs]
        if any(m is not None for m in g.free_masks):
            jacs = [
                j if m is None else j * m[:, None, :]
                for j, m in zip(jacs, g.free_masks)
            ]
        rp = jax.lax.optimization_barrier(r.T)  # [rd, K]
        Jp = [jax.lax.optimization_barrier(jnp.transpose(j, (1, 2, 0)))
              for j in jacs]  # [rd, dof, K]
        if g.loss_kind == "l2":
            return rp, Jp

        # plane-form Ceres corrector (core/corrector.py):
        #   r~ = residual_scaling * r
        #   J~ = sqrt_rho1 * (J - alpha/s * r (r^T J))
        from ..core.corrector import corrector_coefficients

        rd = rp.shape[0]
        s = sum(rp[d] * rp[d] for d in range(rd))  # [K]
        sqrt_rho1, res_scale, alpha_sq = jax.lax.optimization_barrier(
            corrector_coefficients(g.loss_kind, g.loss_params, s))
        Jp_c = []
        for Jps in Jp:
            dof_s = Jps.shape[1]
            c = [sum(rp[d] * Jps[d, i] for d in range(rd))
                 for i in range(dof_s)]  # r^T J columns, each [K]
            Jp_c.append(jnp.stack([
                jnp.stack([
                    sqrt_rho1 * (Jps[d, i] - alpha_sq * rp[d] * c[i])
                    for i in range(dof_s)])
                for d in range(rd)]))
        rp_c = res_scale[None, :] * rp
        return rp_c, Jp_c

    # -- assembly ----------------------------------------------------------

    def assemble(self, values, damping=None):
        """Returns (Hcc [E,De,De], gc [Dc], hpp6 [6,P], gp3 [3,P],
        Wps {gi: [De*3, K]}, cost)."""
        ctx = self.ctx
        cp = ctx.cp
        dt = cp.dtype
        E, De, P = ctx.num_entities, ctx.entity_dof, self.num_landmarks
        Hcc = jnp.zeros((E, De, De), dtype=dt)
        gc = jnp.zeros((E, De), dtype=dt)
        hpp6 = jnp.zeros((6, P), dtype=dt)
        gp3 = jnp.zeros((3, P), dtype=dt)
        cost = jnp.zeros((), dtype=dt)
        Wps: Dict[int, jnp.ndarray] = {}

        for ug in self.ugroups:
            g = self._group(ug.gi)
            rp, Jp = self._linearize_planes(values, g)
            rd = rp.shape[0]
            cost = cost + 0.5 * jnp.sum(rp * rp)
            kinds = ctx.slot_kind[ug.gi]
            nslots = len(g.manifolds)

            for s in range(nslots):
                dof_s = g.manifolds[s].dof
                gs = [
                    sum(Jp[s][d, i] * rp[d] for d in range(rd))
                    for i in range(dof_s)
                ]
                if kinds[s] == "cam":
                    l0 = ug.cam_locs[s]
                    gsum = self._ent_planes_segsum(ug, gs, exact=True)  # [E, ds]
                    gc = gc.at[:, l0:l0 + dof_s].add(gsum)
                else:
                    for i in range(3):
                        gp3 = gp3.at[i, ug.lo:ug.lo + ug.n].add(
                            self._lm_reduce(ug, gs[i]))

            # pair blocks
            w_rows = [None] * (De * 3)
            for s in range(nslots):
                ds_ = g.manifolds[s].dof
                for t in range(nslots):
                    dt_ = g.manifolds[t].dof
                    if kinds[s] == "lm" and kinds[t] == "cam":
                        continue
                    if kinds[s] == "cam" and kinds[t] == "cam":
                        planes = [
                            sum(Jp[s][d, i] * Jp[t][d, j] for d in range(rd))
                            for i in range(ds_) for j in range(dt_)
                        ]
                        Hsum = self._ent_planes_segsum(ug, planes, exact=True)
                        ls0, lt0 = ug.cam_locs[s], ug.cam_locs[t]
                        Hcc = Hcc.at[:, ls0:ls0 + ds_, lt0:lt0 + dt_].add(
                            Hsum.reshape(E, ds_, dt_))
                    elif kinds[s] == "lm" and kinds[t] == "lm":
                        for (i, j), pidx in SYM6.items():
                            plane = sum(
                                Jp[s][d, i] * Jp[t][d, j] for d in range(rd))
                            hpp6 = hpp6.at[pidx, ug.lo:ug.lo + ug.n].add(
                                self._lm_reduce(ug, plane))
                    else:  # cam-lm -> W planes
                        l0 = ug.cam_locs[s]
                        for i in range(ds_):
                            for j in range(3):
                                plane = sum(
                                    Jp[s][d, i] * Jp[t][d, j]
                                    for d in range(rd))
                                row = (l0 + i) * 3 + j
                                w_rows[row] = (
                                    plane if w_rows[row] is None
                                    else w_rows[row] + plane)
            if ug.lm_slot is not None:
                K = int(ug.ent_ids.shape[0])
                zero = jnp.zeros((K,), dtype=dt)
                Wps[ug.gi] = jnp.stack(
                    [zero if r is None else r for r in w_rows])  # [De*3, K]

        # entity-direction partials reduce over the mesh (identity on one
        # chip); landmark planes (hpp6/gp3) stay chip-local — each chip
        # owns its landmark partition outright.
        Hcc = self._allreduce(Hcc)
        gc = self._allreduce(gc)
        cost = self._allreduce(cost)

        eye = jnp.eye(De, dtype=dt)
        Hcc = Hcc + ctx._pad_diag.astype(dt)[:, :, None] * eye
        if damping is not None:
            Hcc = Hcc + damping * eye
            shift = ctx._pp_shift(damping)
            for pidx in (SYM6[(0, 0)], SYM6[(1, 1)], SYM6[(2, 2)]):
                hpp6 = hpp6.at[pidx].add(shift)
        return Hcc, gc.reshape(-1), hpp6, gp3, Wps, cost

    # -- products ----------------------------------------------------------

    def wt_x(self, Wps, xc):
        """[Dc] -> [3, P]: t = W^T x. Chip-local even when sharded: every
        landmark's full observation run lives on one chip."""
        ctx = self.ctx
        E, De, P = ctx.num_entities, ctx.entity_dof, self.num_landmarks
        xe = xc.reshape(E, De)
        t = jnp.zeros((3, P), dtype=xc.dtype)
        for ug in self.ugroups:
            if ug.lm_slot is None:
                continue
            Wp = Wps[ug.gi]
            # ROW gather [K, De]: contiguous 9-float rows stream at memory
            # speed; the lane-major gather xe.T[:, ids] re-walks the table
            # per lane and measured 4x slower at venice scale. The barrier
            # stops XLA from re-fusing the gather into the plane consumers.
            xg = jax.lax.optimization_barrier(xe[ug.ent_ids])
            # ONE einsum for all De*3 terms: the hand-written per-(i,j)
            # multiply-add chain made XLA walk W and xg once per output
            # plane; the fused contraction over De reads each exactly once
            # (measured 44.4 -> 20.7 ms for this product at 5M obs, f32).
            Kg = Wp.shape[-1]
            planes = jnp.einsum(
                "djk,kd->jk", Wp.reshape(De, 3, Kg), xg,
                precision=jax.lax.Precision.HIGHEST)
            for j in range(3):
                t = t.at[j, ug.lo:ug.lo + ug.n].add(
                    self._lm_reduce(ug, planes[j]))
        return t

    def w_u(self, Wps, u3):
        """[3, P] -> [Dc]: y = W u."""
        ctx = self.ctx
        E, De = ctx.num_entities, ctx.entity_dof
        y = jnp.zeros((E, De), dtype=u3.dtype)
        for ug in self.ugroups:
            if ug.lm_slot is None:
                continue
            Wp = Wps[ug.gi]
            ug3 = [self._lm_expand(ug, u3[j, ug.lo:ug.lo + ug.n])
                   for j in range(3)]  # 3 x [K]
            ys = [
                sum(Wp[i * 3 + j] * ug3[j] for j in range(3))
                for i in range(De)
            ]
            y = y + self._ent_planes_segsum(ug, ys)
        return self._allreduce(y).reshape(-1)

    # Chunk width for the fused S-apply: a multiple of every group's cap
    # (caps are powers of two <= this) so no landmark run straddles a
    # chunk, and wide enough that the per-chunk one-hot dots amortize.
    SAPPLY_CHUNK = 8192

    def make_fused_apply_S(self, Hcc, hinv6, Wps):
        """Return ``x -> S x`` with the coupling term ``W Hpp^-1 W^T x``
        evaluated in ONE chunked pass per factor group.

        The composed form (wt_x -> sym6_matvec -> w_u) round-trips
        [K]-sized intermediates through HBM four times per PCG iteration
        (the gathered camera rows, the W^T x planes, the expanded
        landmark update, and the pre-reduction ys planes) and pays a
        separate row-gather pass (measured 15.2 ms at venice scale, vs
        9.7 ms for the same gather as a transposed one-hot MXU
        contraction). Because the bucketed layout keeps each landmark's
        cap-run contiguous and cap divides the chunk width, a chunk is
        CLOSED under the whole middle product: gather -> W^T x ->
        run-reduce -> Hpp^-1 -> expand -> W u -> entity reduce all
        happen on the chunk's [*, C] planes, with exactly two MXU
        contractions against the same per-chunk one-hot (entity gather
        in, entity segment-sum out) and no [K]-sized HBM intermediates.
        Measured at venice scale (K=6.5M, f32): 46 -> ~24 ms per PCG
        iteration vs the composed products.

        Precision: the one-hot entries are exact 0/1 but the TPU MXU
        truncates the gathered/reduced VALUES to bf16 (same tolerance as
        the composed path's one-hot segment-sum, doc/performance.md); the
        exact row-gather wt_x remains in use for the once-per-step
        back-substitution. ``APEX_TPU_FUSED_SAPPLY=0`` restores the
        composed products inside PCG too."""
        ctx = self.ctx
        E, De = ctx.num_entities, ctx.entity_dof
        dt = Hcc.dtype
        preps = []
        for ug in self.ugroups:
            if ug.lm_slot is None:
                continue
            Wp = Wps[ug.gi]
            K = int(Wp.shape[-1])
            cap = ug.cap
            C = self.SAPPLY_CHUNK if self.SAPPLY_CHUNK % cap == 0 else cap
            nc = -(-K // C)
            Kp = nc * C
            Wpad = jnp.pad(Wp, ((0, 0), (0, Kp - K))) if Kp > K else Wp
            idsp = (jnp.pad(ug.ent_ids, (0, Kp - K), constant_values=E)
                    if Kp > K else ug.ent_ids)
            hseg = hinv6[:, ug.lo:ug.lo + ug.n]
            npad = Kp // cap
            if npad > ug.n:
                hseg = jnp.pad(hseg, ((0, 0), (0, npad - ug.n)))
            preps.append((ug.cap, C, nc, Wpad, idsp, hseg))

        def apply(x):
            xe = x.reshape(E, De)
            xT = jnp.pad(xe, ((0, 1), (0, 0))).T  # [De, E+1]
            yT = jnp.zeros((De, E + 1), dtype=dt)
            for cap, C, nc, Wpad, idsp, hseg in preps:
                R = C // cap

                def body(i, acc, Wpad=Wpad, idsp=idsp, hseg=hseg,
                         cap=cap, C=C, R=R):
                    Wc = jax.lax.dynamic_slice(
                        Wpad, (0, i * C), (De * 3, C)).reshape(De, 3, C)
                    ii = jax.lax.dynamic_slice(idsp, (i * C,), (C,))
                    oh = (jax.lax.broadcasted_iota(jnp.int32, (E + 1, C), 0)
                          == ii[None, :]).astype(dt)
                    xgT = jax.lax.dot_general(
                        xT, oh, (((1,), (0,)), ((), ())),
                        preferred_element_type=dt)  # [De, C]
                    t3 = jnp.einsum("djc,dc->jc", Wc, xgT,
                                    precision=jax.lax.Precision.HIGHEST)
                    t3r = t3.reshape(3, R, cap).sum(-1)
                    h6c = jax.lax.dynamic_slice(hseg, (0, i * R), (6, R))
                    u3r = sym6_matvec(h6c, t3r)  # [3, R]
                    u3 = jnp.broadcast_to(
                        u3r[:, :, None], (3, R, cap)).reshape(3, C)
                    ys = jnp.einsum("ijc,jc->ic", Wc, u3,
                                    precision=jax.lax.Precision.HIGHEST)
                    return acc + jax.lax.dot_general(
                        ys, oh, (((1,), (1,)), ((), ())),
                        preferred_element_type=dt)  # [De, E+1]

                yT = jax.lax.fori_loop(0, nc, body, self._pvary(yT))
            y = self._allreduce(yT[:, :E].T.reshape(-1))
            return self.ctx._hcc_matvec(Hcc, x) - y

        return apply

    def prec_blocks(self, Hcc, hinv6, Wps, schur_jacobi: bool):
        """Entity diagonal blocks of S, inverted (Schur-Jacobi).

        Chunk-local like make_fused_apply_S: the composed form expanded
        hinv to [K] planes and materialized the 27 Y and 81 Z correction
        planes in HBM (several GB of transients at venice scale) before
        one monolithic segment-sum; here each chunk computes Y, Z on its
        own [*, C] planes and reduces through one one-hot MXU contraction
        (n = De*De lanes). Measured at venice scale (6.5M obs, f32):
        151 -> ~35 ms per preconditioner build."""
        ctx = self.ctx
        E, De = ctx.num_entities, ctx.entity_dof
        dt = Hcc.dtype
        corrT = jnp.zeros((De * De, E + 1), dtype=dt)
        if schur_jacobi:
            for ug in self.ugroups:
                if ug.lm_slot is None:
                    continue
                Wp = Wps[ug.gi]
                K = int(Wp.shape[-1])
                cap = ug.cap
                C = self.SAPPLY_CHUNK if self.SAPPLY_CHUNK % cap == 0 else cap
                nc = -(-K // C)
                Kp = nc * C
                Wpad = jnp.pad(Wp, ((0, 0), (0, Kp - K))) if Kp > K else Wp
                idsp = (jnp.pad(ug.ent_ids, (0, Kp - K), constant_values=E)
                        if Kp > K else ug.ent_ids)
                hseg = hinv6[:, ug.lo:ug.lo + ug.n]
                npad = Kp // cap
                if npad > ug.n:
                    hseg = jnp.pad(hseg, ((0, 0), (0, npad - ug.n)))
                R = C // cap

                def body(i, acc, Wpad=Wpad, idsp=idsp, hseg=hseg,
                         cap=cap, C=C, R=R):
                    Wc = jax.lax.dynamic_slice(Wpad, (0, i * C), (De * 3, C))
                    ii = jax.lax.dynamic_slice(idsp, (i * C,), (C,))
                    oh = (jax.lax.broadcasted_iota(jnp.int32, (E + 1, C), 0)
                          == ii[None, :]).astype(dt)
                    h6r = jax.lax.dynamic_slice(hseg, (0, i * R), (6, R))
                    hg = jnp.broadcast_to(
                        h6r[:, :, None], (6, R, cap)).reshape(6, C)
                    Y = [[
                        sum(Wc[i_ * 3 + m]
                            * hg[SYM6[(m, j) if m <= j else (j, m)]]
                            for m in range(3))
                        for j in range(3)] for i_ in range(De)]
                    Z = jnp.stack([
                        sum(Y[i_][j] * Wc[l * 3 + j] for j in range(3))
                        for i_ in range(De) for l in range(De)])  # [De*De, C]
                    return acc + jax.lax.dot_general(
                        Z, oh, (((1,), (1,)), ((), ())),
                        preferred_element_type=dt)  # [De*De, E+1]

                corrT = jax.lax.fori_loop(0, nc, body, self._pvary(corrT))
        corr = corrT[:, :E].T.reshape(E, De, De)
        from .utils import spd_clamped_inv

        return spd_clamped_inv(Hcc - self._allreduce(corr))

    # -- full solve --------------------------------------------------------

    def solve(self, values, damping, iteration=None, dx_prev=None):
        """Plane-form twin of SchurContext.solve (iterative variant)."""
        ctx = self.ctx
        cp = ctx.cp
        dt = cp.dtype
        Hcc, gc, hpp6, gp3, Wps, cost = self.assemble(values, damping)
        hinv6 = sym6_clamped_inv(hpp6)

        u_g = sym6_matvec(hinv6, gp3)  # [3, P]
        b = -gc + self.w_u(Wps, u_g)

        import os

        if os.environ.get("APEX_TPU_FUSED_SAPPLY", "1") != "0":
            apply_S = self.make_fused_apply_S(Hcc, hinv6, Wps)
        else:
            def apply_S(x):
                t = self.wt_x(Wps, x)
                u = sym6_matvec(hinv6, t)
                return ctx._hcc_matvec(Hcc, x) - self.w_u(Wps, u)

        if ctx.preconditioner == "none":
            apply_M = lambda x: x  # noqa: E731
        else:
            inv_blocks = self.prec_blocks(
                Hcc, hinv6, Wps,
                schur_jacobi=(ctx.preconditioner == "schur_jacobi"))
            apply_M = lambda x: ctx._entity_prec_apply(inv_blocks, x)  # noqa: E731

        rtol = ctx.pcg_rtol_floor
        if ctx.pcg_forcing and iteration is not None:
            # negative iteration = sentinel for "no forcing" from callers
            # that must pass a traced value (the sharded step)
            k = jnp.asarray(iteration, dt)
            rtol = jnp.where(
                k < 0, jnp.asarray(ctx.pcg_rtol_floor, dt),
                jnp.clip(0.1 * jnp.exp2(-k), ctx.pcg_rtol_floor, 0.1))
        dxc = ctx._pcg(apply_S, apply_M, b, rtol=rtol,
                       x0=ctx._x0_reduced(dx_prev))

        t = self.wt_x(Wps, dxc)
        dxp3 = sym6_matvec(hinv6, -gp3 - t)  # [3, P]

        # landmark-direction dots are chip-local partials when sharded;
        # everything camera-side is replicated
        dot = ctx._dot64
        Hdxc = ctx._hcc_matvec(Hcc, dxc)
        Wdxp = self.w_u(Wps, dxp3)
        Hpp_dxp = sym6_matvec(hpp6, dxp3)
        q_damped = (
            dot(dxc, Hdxc)
            + 2.0 * dot(dxc, Wdxp)
            + self._allreduce(dot(dxp3.reshape(-1), Hpp_dxp.reshape(-1)))
        )
        shift = ctx._pp_shift(damping)
        q = (
            q_damped
            - damping * dot(dxc, dxc)
            - shift * self._allreduce(dot(dxp3.reshape(-1), dxp3.reshape(-1)))
        )
        g_dot_dx = dot(gc, dxc) + self._allreduce(
            dot(gp3.reshape(-1), dxp3.reshape(-1)))
        predicted = (-g_dot_dx - 0.5 * q).astype(dt)

        return self._finish(dxc, gc, dxp3, gp3) + (cost, predicted)

    def _finish(self, dxc, gc, dxp3, gp3):
        """Scatter (step, gradient) back to the global tangent layout.
        The sharded subclass first all-gathers its landmark partition."""
        return self.ctx._scatter_global(dxc, gc, dxp3.T, gp3.T)
