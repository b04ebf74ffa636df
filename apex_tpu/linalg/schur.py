"""Schur-complement linear solvers for bundle adjustment.

The reference implements two variants (src/linalg/sparse/explicit_schur.rs,
implicit_schur.rs): eliminate the landmark block ("pt_*"-named RN(3)
variables, SchurOrdering::should_eliminate :111-134) and solve the reduced
camera system

    S = H_cc - W Hpp^{-1} W^T,      S dxc = -g_c + W Hpp^{-1} g_p
    dxp = Hpp^{-1} (-g_p - W^T dxc)

TPU-first mapping (SURVEY.md §7): during linearization we never materialize
the global sparse H. Per factor group we produce
- dense H_cc scatter-adds (camera-camera blocks)
- batched 3x3 H_pp blocks via segment-sum over landmarks
- per-observation coupling blocks W_k [ds, 3] with static (camera column
  base, landmark id) index arrays

and then either
- **explicit** ("sparse" variant): form dense S via statically enumerated
  per-landmark observation pairs (the reference's per-landmark outer-product
  accumulation, explicit_schur.rs:771-925) and Cholesky-solve it with the
  5-stage escalating regularization retry (:539-634), or
- **implicit** ("iterative"): matrix-free PCG on S·x (implicit_schur.rs:
  163-251) with the Schur-Jacobi block preconditioner (:456-575), landmark
  blocks inverted in closed form with eigenvalue-conditioned regularization
  (:685-778).

LM damping is added to both H_cc's diagonal and the H_pp blocks
(explicit_schur.rs:1179-1215).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from .smallmm import es as _es, vdot as _vdot

from ..core.problem import CompiledProblem
from .dense import solve_cholesky_with_retry
from .segsum import apply_plan as _apply_bucket, make_plan as _make_bucket


# ---------------------------------------------------------------------------
# Batched symmetric 3x3 helpers
# ---------------------------------------------------------------------------


def sym3x3_eigvals(A):
    """Closed-form eigenvalues of symmetric 3x3 (trigonometric method),
    batched; returns (..., 3) ascending-ish (e3 <= e2 <= e1 not guaranteed
    strictly; use min/max)."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = a01**2 + a02**2 + a12**2
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-300))
    diag_only = p2 < 1e-30

    eye = jnp.eye(3, dtype=A.dtype)
    B = (A - q[..., None, None] * eye) / p[..., None, None]
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    eigs = jnp.stack([e1, e2, e3], axis=-1)
    diag = jnp.stack([a00, a11, a22], axis=-1)
    return jnp.where(diag_only[..., None], diag, eigs)


def inv3x3(A):
    """Batched 3x3 inverse via adjugate/determinant."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def invert_landmark_blocks(Hpp):
    """Eigenvalue-conditioned regularized inverse of the landmark blocks
    (mirrors implicit_schur.rs:685-778 / explicit_schur.rs:377-442):
    ill-conditioned or near-singular blocks get a scaled identity added
    before inverting. Thresholds scale with the compute dtype (the
    reference's 1e-12/1e10 are f64 constants; f32 needs ~sqrt of those)."""
    f32 = Hpp.dtype == jnp.float32
    eig_floor = 1e-5 if f32 else 1e-12
    cond_max = 1e6 if f32 else 1e10
    rel = 1e-5 if f32 else 1e-8
    eigs = sym3x3_eigvals(Hpp)
    emin = jnp.min(eigs, axis=-1)
    emax = jnp.max(eigs, axis=-1)
    bad = (emin < eig_floor) | (emax > cond_max * jnp.maximum(emin, eig_floor * 1e-3))
    reg = jnp.where(bad, jnp.abs(emin) + rel * jnp.maximum(emax, 1.0) + eig_floor, 0.0)
    eye = jnp.eye(3, dtype=Hpp.dtype)
    return inv3x3(Hpp + reg[..., None, None] * eye)


def landmark_inverse(Hpp):
    """Dispatch: the Pallas lane-planes kernel on TPU for large batches,
    the XLA formulation otherwise (identical semantics). Qualified on
    hardware in round 3: bit-identical output and 1.29x the XLA
    formulation at 1M f32 blocks (doc/performance.md "Pallas
    qualification"), so it is the DEFAULT on TPU; APEX_TPU_PALLAS=0 opts
    out. (Round 2's crash at 156k blocks was the degraded axon runtime,
    not the kernel.)"""
    import os

    if (os.environ.get("APEX_TPU_PALLAS", "1") != "0"
            and jax.default_backend() == "tpu" and Hpp.shape[0] >= 4096
            and Hpp.dtype == jnp.float32):
        from ..kernels import invert_landmark_blocks_pallas

        return invert_landmark_blocks_pallas(Hpp, interpret=False)
    return invert_landmark_blocks(Hpp)


# ---------------------------------------------------------------------------
# Schur context over a CompiledProblem
# ---------------------------------------------------------------------------


def _seg(vals, perm, idx_sorted, n):
    """Pre-sorted segment-sum with a fusion barrier: XLA otherwise fuses the
    permutation gather into the scatter, making its reads random (~5x slower
    on TPU, see doc/performance.md). ``perm=None`` means the operand is
    already in sorted order (the BA canonical landmark-sorted layout) and
    the permutation gather is skipped entirely."""
    v = vals if perm is None else jax.lax.optimization_barrier(vals[perm])
    return jax.ops.segment_sum(v, idx_sorted, num_segments=n,
                               indices_are_sorted=True)


@dataclasses.dataclass
class _MCoupling:
    """Merged camera-entity <-> landmark coupling for one factor group.

    Every factor in a group binds camera-side variables that all live in the
    SAME camera entity (the union-find construction guarantees this), so the
    group's per-observation coupling blocks merge into one [K, De, 3] array:
    rows [loc_s : loc_s+ds] hold J_s^T J_lm for camera slot s. All W products
    in the PCG hot loop then become ONE gather + ONE sorted segment-sum per
    group (vs. one per (slot, group) pair), and the Schur-Jacobi
    preconditioner captures the full entity diagonal block of S including
    the pose<->intrinsics cross terms through the landmark (the reference's
    per-camera blocks, implicit_schur.rs:456-575, lack those cross terms)."""

    group_idx: int
    lm_slot: int
    cam_slots: tuple  # slot indices contributing rows to W
    slot_loc: dict  # slot -> ("u", int l0) | ("v", [K] int32 per-factor loc)
    ent_ids: jnp.ndarray  # [K] int32 camera-entity id per observation
    lm_ids: jnp.ndarray  # [K] int32 landmark id per observation
    perm_lm: jnp.ndarray  # [K] argsort by landmark
    lm_sorted: jnp.ndarray
    perm_ent: jnp.ndarray  # [K] argsort by entity
    ent_sorted: jnp.ndarray
    lm_plan: object = None  # gather-only SegmentSumPlan -> landmarks
    ent_plan: object = None  # gather-only SegmentSumPlan -> entities


class SchurContext:
    """Precomputed elimination structure + assembly/solve over a
    CompiledProblem. Landmark variables are those whose name starts with
    ``eliminate_prefix`` and live on a 3-DOF Euclidean manifold (the
    reference's SchurOrdering rule, explicit_schur.rs:111-134)."""

    def __init__(
        self,
        cp: CompiledProblem,
        eliminate_prefix: str = "pt_",
        variant: str = "iterative",  # "sparse" (explicit) | "iterative"
        preconditioner: str = "schur_jacobi",  # none | block_diagonal | schur_jacobi
        pcg_max_iterations: int = 200,
        pcg_tolerance: float = 1e-6,
        pcg_forcing: bool = True,
        pp_shift_floor: Optional[float] = None,
        pcg_q_tolerance: Optional[float] = None,
    ):
        self.cp = cp
        self.variant = variant
        self.preconditioner = preconditioner
        self.pcg_max_iterations = pcg_max_iterations
        self.pcg_tolerance = pcg_tolerance
        self.pcg_forcing = pcg_forcing
        # Nash-Sofer Q-stagnation termination (the criterion Ceres uses for
        # ITERATIVE_SCHUR inner solves): stop when the relative per-
        # iteration decrease of the quadratic model Q(x) = 0.5 x'Sx - b'x
        # satisfies  n * (Q_n - Q_{n-1}) / Q_n < q_tol.  The residual norm
        # is a poor proxy for LM *step quality* — Q stagnates (the step
        # stops improving) long before the residual meets an rtol, so this
        # typically cuts inner iterations severalfold at BA scale. None
        # disables (default here; the LM driver opts in).
        self.pcg_q_tol = pcg_q_tolerance
        f32 = jnp.dtype(cp.dtype) == jnp.float32
        # f32 PCG stagnates around 1e-5 relative residual; asking for 1e-6
        # just burns the full iteration budget every LM iteration (observed:
        # 42.7 s vs 5.6 s explicit at ladybug-49 on TPU, round 1).
        self.pcg_rtol_floor = (
            max(pcg_tolerance, 3e-5) if f32 else pcg_tolerance
        )
        # Decoupled landmark-block shift floor: when Nielsen damping
        # collapses (good steps -> lambda ~1e-9), weakly-observed landmark
        # blocks become near-unregularized and their huge steps overwhelm
        # f32 at venice scale (doc/performance.md round-1 notes). The floor
        # bounds ||dxp_k|| <= ||g_k|| / floor independently of LM damping
        # (Ceres caps the LM diagonal the same way, min_lm_diagonal).
        if pp_shift_floor is None:
            pp_shift_floor = 1e-4 if f32 else 0.0
        self.pp_shift_floor = pp_shift_floor

        # --- classify variables ------------------------------------------
        # All structure analysis runs on HOST copies of the index arrays
        # (cp.host_group_cols / host_pool_cols): device arrays pulled back
        # through the remote-TPU tunnel cost ~43 s apiece at venice scale.
        D = cp.total_dof
        host_pool_cols = getattr(cp, "host_pool_cols", None) or {
            pid: np.asarray(pool.cols) for pid, pool in enumerate(cp.pools)}
        host_group_cols = getattr(cp, "host_group_cols", None)

        def gcols(gi, slot):
            if host_group_cols is not None:
                return host_group_cols[gi][slot]
            return np.asarray(cp.groups[gi].cols[slot])

        self._gcols = gcols
        lm_id_of_global = {}  # global col -> landmark id
        lm_id_arr = np.full(D, -1, dtype=np.int64)  # vectorized twin
        P = 0
        for pid, pool in enumerate(cp.pools):
            if pool.manifold.dof != 3 or pool.manifold.storage_dim != 3:
                continue
            rows = [i for i, n in enumerate(pool.names) if n.startswith(eliminate_prefix)]
            if not rows:
                continue
            cols = host_pool_cols[pid]
            rows = np.asarray(rows)
            ids = P + np.arange(len(rows))
            lm_id_arr[cols[rows]] = ids
            lm_id_of_global.update(zip(cols[rows].tolist(), ids.tolist()))
            P += len(rows)
        self.num_landmarks = P
        if P == 0:
            raise ValueError(
                f"Schur solver found no landmark variables (prefix "
                f"{eliminate_prefix!r} on R3 manifolds)"
            )

        # ---- camera-side ENTITY structure --------------------------------
        # H_cc is block-diagonal when camera-side variables only couple
        # within small clusters (e.g. BA: pose_i <-> intr_i through shared
        # observations). Union-find over camera-side variables linked by any
        # factor binding two camera-side slots finds those clusters; the
        # reduced space is laid out entity-major with uniform padding so
        # H_cc is stored as [E, De, De] batched blocks (ladybug: 1 GB dense
        # -> 0.5 MB of 9x9 blocks, and every PCG H_cc matvec is batched).
        cam_vars = []  # (global_col, dof) in col order
        for pid, pool in enumerate(cp.pools):
            cols = host_pool_cols[pid]
            keep = lm_id_arr[cols] < 0
            cam_vars.extend(
                (int(c), pool.manifold.dof) for c in cols[keep])
        cam_vars.sort()
        parent = {c: c for c, _ in cam_vars}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb

        for gi, g in enumerate(cp.groups):
            cam_slots = [
                s for s in range(len(g.manifolds))
                if g.count and lm_id_arr[gcols(gi, s)[0]] < 0
            ]
            for ai in range(len(cam_slots)):
                for bi in range(ai + 1, len(cam_slots)):
                    ca = gcols(gi, cam_slots[ai])
                    cb = gcols(gi, cam_slots[bi])
                    pairs = np.unique(np.stack([ca, cb], axis=1), axis=0)
                    for pa, pb in pairs.tolist():
                        union(int(pa), int(pb))

        dof_of = dict(cam_vars)
        members = {}
        for c, _ in cam_vars:
            members.setdefault(find(c), []).append(c)
        entities = [sorted(v) for v in members.values()]
        entities.sort(key=lambda m: m[0])
        De = max((sum(dof_of[c] for c in m) for m in entities), default=0)
        E = len(entities)

        red_of_global = np.full(D, -1, dtype=np.int64)
        real_mask = np.zeros(E * De, dtype=np.float64)
        for e, m in enumerate(entities):
            off = 0
            for c in m:
                d = dof_of[c]
                red_of_global[c : c + d] = e * De + off + np.arange(d)
                real_mask[e * De + off : e * De + off + d] = 1.0
                off += d
        self.num_entities = E
        self.entity_dof = De
        self.Dc = E * De
        self.real_mask = real_mask
        self.red_of_global = red_of_global
        self._lm_id_of_global = lm_id_of_global
        self._lm_id_arr = lm_id_arr
        # per-entity padding pins: diag 1.0 on padded dims keeps every
        # factorization/solve non-singular with zero right-hand side there
        self._pad_diag = jnp.asarray(
            (1.0 - real_mask).reshape(E, De).astype(np.float64)
        )
        self.pcg_iter_cap = int(min(pcg_max_iterations, max(self.Dc, 1)))

        # camera-side per-pool block info (for block preconditioners)
        self.cam_pools = []  # (pool_id, kept_rows [Nv], red_base [Nv], dof)
        for pid, pool in enumerate(cp.pools):
            cols = host_pool_cols[pid]
            kept = np.nonzero(lm_id_arr[cols] < 0)[0].tolist()
            if kept:
                bases = red_of_global[cols[np.asarray(kept)]]
                self.cam_pools.append(
                    (pid, jnp.asarray(np.asarray(kept, dtype=np.int32)),
                     jnp.asarray(bases.astype(np.int32)), pool.manifold.dof)
                )

        # --- classify group slots ----------------------------------------
        # per group: list of slot kinds; "cam" or "lm"
        self.slot_kind: List[List[str]] = []
        self.slot_red_base: List[List[Optional[jnp.ndarray]]] = []
        self.slot_lm_ids: List[List[Optional[jnp.ndarray]]] = []
        self.mcouplings: List[_MCoupling] = []
        self._mc_of_group = {}
        lm_np_of_mc = []  # host-side copies for pair enumeration
        self._mc_host = []  # (lm, ent) host arrays for lazy plan builds
        for gi, g in enumerate(cp.groups):
            kinds, bases, lmids = [], [], []
            for s in range(len(g.manifolds)):
                cols_s = gcols(gi, s)
                is_lm = lm_id_arr[cols_s] >= 0
                if is_lm.all():
                    kinds.append("lm")
                    bases.append(None)
                    lmids.append(jnp.asarray(lm_id_arr[cols_s].astype(np.int32)))
                elif (~is_lm).all():
                    kinds.append("cam")
                    bases.append(jnp.asarray(red_of_global[cols_s].astype(np.int32)))
                    lmids.append(None)
                else:
                    raise ValueError(
                        "factor group slot mixes eliminated and kept variables; "
                        "name landmarks uniformly (pt_*)"
                    )
            lm_slots = [s for s, k in enumerate(kinds) if k == "lm"]
            if len(lm_slots) > 1:
                raise ValueError("factors binding >1 landmark are not Schur-eliminable")
            self.slot_kind.append(kinds)
            self.slot_red_base.append(bases)
            self.slot_lm_ids.append(lmids)
            cam_slots = tuple(s for s, k in enumerate(kinds) if k == "cam")
            if lm_slots and cam_slots:
                t = lm_slots[0]
                # all camera slots of one factor share an entity (union-find)
                ent = None
                slot_loc = {}
                for s in cam_slots:
                    base = red_of_global[gcols(gi, s)]
                    ent_s = base // De
                    if ent is None:
                        ent = ent_s
                    elif not (ent_s == ent).all():
                        raise AssertionError(
                            "camera slots of one factor span entities")
                    loc = base - ent_s * De
                    if len(loc) == 0 or (loc == loc[0]).all():
                        slot_loc[s] = ("u", int(loc[0]) if len(loc) else 0)
                    else:
                        slot_loc[s] = ("v", jnp.asarray(loc.astype(np.int32)))
                lm = lm_id_arr[gcols(gi, t)].astype(np.int64)
                perm_lm = np.argsort(lm, kind="stable")
                perm_ent = np.argsort(ent, kind="stable")
                id_lm = bool((perm_lm == np.arange(len(lm))).all())
                id_ent = bool((perm_ent == np.arange(len(ent))).all())
                self._mc_of_group[gi] = len(self.mcouplings)
                lm_np_of_mc.append(lm)
                self.mcouplings.append(_MCoupling(
                    group_idx=gi,
                    lm_slot=t,
                    cam_slots=cam_slots,
                    slot_loc=slot_loc,
                    ent_ids=jnp.asarray(ent.astype(np.int32)),
                    lm_ids=jnp.asarray(lm.astype(np.int32)),
                    perm_lm=None if id_lm else jnp.asarray(
                        perm_lm.astype(np.int32)),
                    lm_sorted=jnp.asarray(lm[perm_lm].astype(np.int32)),
                    perm_ent=None if id_ent else jnp.asarray(
                        perm_ent.astype(np.int32)),
                    ent_sorted=jnp.asarray(ent[perm_ent].astype(np.int32)),
                    lm_plan=None,  # built lazily with the block path
                    ent_plan=None,
                ))
                self._mc_host.append((lm.copy(), ent.copy()))

        # --- sorted-segment plans for assembly ------------------------------
        # every scatter-add in assemble() is replaced by a statically
        # pre-sorted segment-sum (TPU scatter-add serializes on duplicates
        # and large 3-index block scatters have crashed the runtime).
        def _plan(dest_idx, num_segments):
            dest_idx = np.asarray(dest_idx).reshape(-1)
            perm = np.argsort(dest_idx, kind="stable")
            identity = bool((perm == np.arange(len(perm))).all())
            return dict(
                perm=None if identity else jnp.asarray(perm.astype(np.int32)),
                idx=jnp.asarray(dest_idx[perm].astype(np.int32)),
                n=num_segments,
                bucket=_make_bucket(dest_idx, num_segments),
            )

        self._plan_fn = _plan
        self._asm_plans = None

        # --- plane-layout fast path for uniform (bucketed) BA layouts -----
        # (see linalg/schur_planes.py; APEX_TPU_UNIFORM=0 disables).
        # Detected BEFORE block-path plan construction: the uniform
        # pipeline needs none of the bucket/segment plans, whose host-side
        # builds cost minutes at venice scale.
        self.uniform = None
        if variant == "iterative" and self.mcouplings:
            import os

            if os.environ.get("APEX_TPU_UNIFORM", "1") == "1":
                from .schur_planes import detect_uniform

                self.uniform = detect_uniform(self)
        if self.uniform is None:
            self._ensure_block_plans()

        # --- static pair enumeration for the explicit variant -------------
        self.pair_indices = None
        if variant == "sparse":
            self.pair_indices = self._enumerate_pairs(lm_np_of_mc)

    def _ensure_block_plans(self):
        """Build the block-path segment plans (bucket gather plans + sorted
        scatter plans) on first need; the uniform plane pipeline never
        touches them."""
        if self._asm_plans is not None:
            return
        cp = self.cp
        E, De = self.num_entities, self.entity_dof
        red_of_global = self.red_of_global
        lm_id_of_global = self._lm_id_of_global
        _plan = self._plan_fn
        for mc, (lm, ent) in zip(self.mcouplings, self._mc_host):
            if mc.lm_plan is None:
                mc.lm_plan = _make_bucket(lm, self.num_landmarks)
                mc.ent_plan = _make_bucket(ent, E)

        self._asm_plans = []
        for gi, g in enumerate(cp.groups):
            kinds = self.slot_kind[gi]
            plans = {"g": {}, "hpp": {}, "hcc": {}}
            # Compact plans: when the entity-local offset of a slot is the
            # same for every factor (uniform entity layout — standard BA),
            # blocks are segment-summed over a [K] entity index and placed
            # at a STATIC (ls, lt) slice: plan memory O(K) instead of
            # O(K * ds * dt) (3+ GB at venice scale otherwise).
            ent_of = {}
            loc_of = {}
            for s in range(len(g.manifolds)):
                if kinds[s] != "cam":
                    continue
                base = red_of_global[self._gcols(gi, s)]
                ent_of[s] = base // De
                loc_of[s] = base - ent_of[s] * De
            for s in range(len(g.manifolds)):
                ds_ = g.manifolds[s].dof
                if kinds[s] == "cam":
                    ls = loc_of[s]
                    uniform = (ls == ls[0]).all() if len(ls) else True
                    if uniform:
                        plans["g"][s] = ("ent", _plan(ent_of[s], E), int(ls[0]) if len(ls) else 0)
                    else:
                        base = red_of_global[self._gcols(gi, s)]
                        dest = base[:, None] + np.arange(ds_)
                        plans["g"][s] = ("flat", _plan(dest, self.Dc), None)
                else:
                    lm = self._lm_id_arr[self._gcols(gi, s)]
                    plans["g"][s] = ("lm", _plan(lm, self.num_landmarks), None)
                for t in range(len(g.manifolds)):
                    dt_ = g.manifolds[t].dof
                    if kinds[s] == "cam" and kinds[t] == "cam":
                        ls, lt = loc_of[s], loc_of[t]
                        uniform = (
                            ((ls == ls[0]).all() and (lt == lt[0]).all())
                            if len(ls) else True
                        )
                        if uniform:
                            l0 = (int(ls[0]), int(lt[0])) if len(ls) else (0, 0)
                            plans["hcc"][(s, t)] = ("ent", _plan(ent_of[s], E), l0)
                        else:
                            bs = red_of_global[self._gcols(gi, s)]
                            bt = red_of_global[self._gcols(gi, t)]
                            dest = (
                                (bs // De)[:, None, None] * (De * De)
                                + (ls[:, None, None] + np.arange(ds_)[None, :, None]) * De
                                + (lt[:, None, None] + np.arange(dt_)[None, None, :])
                            )
                            plans["hcc"][(s, t)] = ("flat", _plan(dest, E * De * De), None)
                    elif kinds[s] == "lm" and kinds[t] == "lm":
                        lm = self._lm_id_arr[self._gcols(gi, s)]
                        plans["hpp"][(s, t)] = ("lm", _plan(lm, self.num_landmarks), None)
            self._asm_plans.append(plans)

    def _enumerate_pairs(self, lm_np_of_mc):
        """For each ordered merged-coupling pair (A, B): indices (ia, ib) of
        observations sharing a landmark — the per-landmark outer products of
        explicit_schur.rs:771-925, enumerated statically over entity
        blocks."""
        by_rec = []
        for ids in lm_np_of_mc:
            order = np.argsort(ids, kind="stable")
            by_lm = {}
            for k in order:
                by_lm.setdefault(int(ids[k]), []).append(int(k))
            by_rec.append(by_lm)
        pairs = []
        for a in range(len(self.mcouplings)):
            for b in range(len(self.mcouplings)):
                ia, ib = [], []
                common = set(by_rec[a]) & set(by_rec[b])
                for lm in common:
                    for k1 in by_rec[a][lm]:
                        for k2 in by_rec[b][lm]:
                            ia.append(k1)
                            ib.append(k2)
                pairs.append(
                    (jnp.asarray(np.asarray(ia, dtype=np.int32)),
                     jnp.asarray(np.asarray(ib, dtype=np.int32)))
                )
        return pairs

    # ------------------------------------------------------------------

    def _segsum(self, vals, perm, idx_sorted, n, bucket_plan):
        """Segment-sum dispatch. Default "auto": the gather-only bucket plan
        for small row tails (<= 32 elements — the PCG products, gradients,
        Hpp blocks; scatter there runs at ~1% of HBM bandwidth on TPU),
        scatter for wide [K, De, De] blocks (bucket padding would double an
        already GB-scale buffer). APEX_TPU_SEGSUM=scatter|bucket forces one
        path globally."""
        import os

        mode = os.environ.get("APEX_TPU_SEGSUM", "auto")
        tail = int(np.prod(vals.shape[1:])) if vals.ndim > 1 else 1
        use_bucket = bucket_plan is not None and (
            mode == "bucket" or (mode == "auto" and tail <= 32)
        )
        if use_bucket:
            return _apply_bucket(bucket_plan, vals)
        return _seg(vals, perm, idx_sorted, n)

    def _pp_shift(self, damping):
        """Effective landmark-block diagonal shift: LM damping floored by
        the decoupled landmark regularization floor."""
        if self.pp_shift_floor > 0.0:
            return jnp.maximum(damping, self.pp_shift_floor)
        return damping

    def assemble(self, values, damping=None):
        """Linearize all groups and build (Hcc, gc, Hpp, gp, Ws, cost).
        Hcc is batched entity blocks [E, De, De]; Ws[i] is the merged
        [K, De, 3] entity<->landmark coupling array for mcouplings[i]."""
        self._ensure_block_plans()
        cp = self.cp
        dt = cp.dtype
        E, De = self.num_entities, self.entity_dof
        Hcc = jnp.zeros((E, De, De), dtype=dt)
        gc = jnp.zeros((self.Dc,), dtype=dt)
        Hpp = jnp.zeros((self.num_landmarks, 3, 3), dtype=dt)
        gp = jnp.zeros((self.num_landmarks, 3), dtype=dt)
        cost = jnp.zeros((), dtype=dt)
        Ws: List[Optional[jnp.ndarray]] = [None] * len(self.mcouplings)

        def seg_flat(plan, vals):
            return self._segsum(vals.reshape(-1), plan["perm"], plan["idx"],
                                plan["n"], plan.get("bucket"))

        def seg_rows(plan, vals):
            """Segment-sum [K, ...] blocks over a [K] id plan."""
            return self._segsum(vals, plan["perm"], plan["idx"], plan["n"],
                                plan.get("bucket"))

        for gi, g in enumerate(cp.groups):
            r, jacs = cp.group_linearize(values, g, True)
            cost = cost + 0.5 * jnp.sum(r * r)
            kinds = self.slot_kind[gi]
            plans = self._asm_plans[gi]
            mci = self._mc_of_group.get(gi)
            mc = self.mcouplings[mci] if mci is not None else None
            W = (
                jnp.zeros((g.count, De, 3), dtype=dt)
                if mc is not None else None
            )
            for s in range(len(g.manifolds)):
                Js = jacs[s]
                ds_ = g.manifolds[s].dof
                gs = _es("kdi,kd->ki", Js, r)
                kind, plan, off = plans["g"][s]
                if kind == "ent":
                    gsum = seg_rows(plan, gs)  # [E, ds]
                    gc = (
                        gc.reshape(E, De).at[:, off : off + ds_].add(gsum).reshape(-1)
                    )
                elif kind == "flat":
                    gc = gc + seg_flat(plan, gs)
                else:  # lm
                    gp = gp + seg_rows(plan, gs)
                for t in range(len(g.manifolds)):
                    Jt = jacs[t]
                    dt_ = g.manifolds[t].dof
                    if kinds[s] == "lm" and kinds[t] == "cam":
                        continue  # transpose of cam-lm; skip
                    Hst = _es("kdi,kdj->kij", Js, Jt)
                    if kinds[s] == "cam" and kinds[t] == "cam":
                        kind, plan, offs = plans["hcc"][(s, t)]
                        if kind == "ent":
                            ls0, lt0 = offs
                            Hsum = seg_rows(plan, Hst)  # [E, ds, dt]
                            Hcc = Hcc.at[:, ls0 : ls0 + ds_, lt0 : lt0 + dt_].add(Hsum)
                        else:
                            Hcc = Hcc + seg_flat(plan, Hst).reshape(E, De, De)
                    elif kinds[s] == "lm" and kinds[t] == "lm":
                        _, plan, _ = plans["hpp"][(s, t)]
                        Hpp = Hpp + seg_rows(plan, Hst)
                    elif kinds[s] == "cam" and kinds[t] == "lm":
                        lk, loc = mc.slot_loc[s]
                        if lk == "u":
                            W = W.at[:, loc : loc + ds_, :].add(Hst)
                        else:
                            rows = loc[:, None] + jnp.arange(ds_, dtype=loc.dtype)
                            W = W.at[
                                jnp.arange(g.count)[:, None], rows, :
                            ].add(Hst)
            if mc is not None:
                Ws[mci] = W

        # pin padded dims so every downstream factorization is non-singular
        eye = jnp.eye(De, dtype=dt)
        Hcc = Hcc + self._pad_diag.astype(dt)[:, :, None] * eye
        if damping is not None:
            Hcc = Hcc + damping * eye
            Hpp = Hpp + self._pp_shift(damping) * jnp.eye(3, dtype=dt)
        return Hcc, gc, Hpp, gp, Ws, cost

    def _hcc_dense(self, Hcc_blocks):
        """Materialize the [Dc, Dc] dense H_cc from entity blocks (explicit
        variant only — small camera counts)."""
        E, De = self.num_entities, self.entity_dof
        dense = jnp.zeros((self.Dc, self.Dc), dtype=Hcc_blocks.dtype)
        e = jnp.arange(E)[:, None, None]
        i = jnp.arange(De)[None, :, None]
        j = jnp.arange(De)[None, None, :]
        rows = jnp.broadcast_to(e * De + i, (E, De, De))
        cols = jnp.broadcast_to(e * De + j, (E, De, De))
        return dense.at[rows, cols].add(Hcc_blocks)

    def _hcc_matvec(self, Hcc_blocks, x):
        E, De = self.num_entities, self.entity_dof
        return _es("eij,ej->ei", Hcc_blocks, x.reshape(E, De)).reshape(-1)

    # ------------------------------------------------------------------

    def _wt_x(self, Ws, xc):
        """t_p = sum_k W_k^T xc[entity block k]: one gather + one sorted
        segment-sum per merged coupling."""
        E, De = self.num_entities, self.entity_dof
        xe = xc.reshape(E, De)
        t = jnp.zeros((self.num_landmarks, 3), dtype=xc.dtype)
        for mc, W in zip(self.mcouplings, Ws):
            vals = _es("kij,ki->kj", W, xe[mc.ent_ids])  # [K, 3]
            t = t + self._segsum(vals, mc.perm_lm, mc.lm_sorted,
                                 self.num_landmarks, mc.lm_plan)
        return t

    def _w_u(self, Ws, u):
        """y = sum_k W_k u[lm_k]: one gather + one sorted segment-sum per
        merged coupling, landing directly on entity blocks."""
        E, De = self.num_entities, self.entity_dof
        y = jnp.zeros((E, De), dtype=u.dtype)
        for mc, W in zip(self.mcouplings, Ws):
            sk = _es("kij,kj->ki", W, u[mc.lm_ids])  # [K, De]
            y = y + self._segsum(sk, mc.perm_ent, mc.ent_sorted, E,
                                 mc.ent_plan)
        return y.reshape(-1)

    def _entity_prec_inv(self, Hcc_blocks, Hpp_inv, Ws, schur_jacobi: bool):
        """Entity-level block-diagonal preconditioner of S, inverted.
        With merged couplings each subtracted block is the FULL De x De
        entity diagonal block of W Hpp^-1 W^T — including pose<->intrinsics
        cross terms — i.e. the exact diagonal block of S per entity
        (strictly stronger than the reference's per-camera Schur-Jacobi,
        implicit_schur.rs:456-575)."""
        E, De = self.num_entities, self.entity_dof
        acc = Hcc_blocks
        if schur_jacobi:
            for mc, W in zip(self.mcouplings, Ws):
                Y = _es("kij,kjl->kil", W, Hpp_inv[mc.lm_ids])  # [K, De, 3]
                Z = _es("kil,kml->kim", Y, W)  # [K, De, De]
                acc = acc - self._segsum(Z, mc.perm_ent, mc.ent_sorted, E,
                                         mc.ent_plan)
        from .utils import spd_clamped_inv

        return spd_clamped_inv(acc)

    def _entity_prec_apply(self, inv_blocks, x):
        E, De = self.num_entities, self.entity_dof
        return _es("eij,ej->ei", inv_blocks, x.reshape(E, De)).reshape(-1)

    @staticmethod
    def _apply_blocks(blocks, x):
        y = jnp.zeros_like(x)
        for bases, d, inv in blocks:
            cols = bases[:, None] + jnp.arange(d, dtype=bases.dtype)
            y = y.at[cols].add(_es("kij,kj->ki", inv, x[cols]))
        return y

    @staticmethod
    def _dot64(a, b):
        """Inner product accumulated in f64 when x64 is live (PCG recurrence
        scalars are the first thing f32 noise corrupts); falls back to the
        input dtype otherwise."""
        if jax.config.jax_enable_x64:
            return _vdot(a.astype(jnp.float64), b.astype(jnp.float64))
        return _vdot(a, b)

    def _pcg(self, apply_S, apply_M, b, rtol=None, max_iter=None, x0=None):
        """Block-preconditioned conjugate gradients (implicit_schur.rs:
        577-679). Recurrence dot products accumulate in f64; ``rtol`` may be
        a traced scalar (forcing sequence).

        ``x0`` warm-starts from the previous LM iteration's camera step:
        late in a solve, consecutive reduced systems differ only by small
        damping/linearization changes, so the old solution's residual is
        far below ||b|| and PCG needs a fraction of the iterations (the
        round-2 venice late-phase cliff was ~200 PCG iterations per LM
        step from a zero start). Guarded: if S x0 - b is not actually
        smaller than b (big damping jump, rejected step), fall back to the
        zero start. The warm residual S·x0 is computed INSIDE the loop's
        first pass (a lax.cond init branch) so it reuses the loop body's
        S-apply transients — a standalone apply_S(x0) allocated a second
        set of venice-scale plane buffers and pushed compile-time peak
        HBM 3.4 GB over capacity."""
        if rtol is None:
            rtol = self.pcg_rtol_floor
        if max_iter is None:
            max_iter = self.pcg_iter_cap
        q_tol = self.pcg_q_tol
        dot = self._dot64
        bb = dot(b, b)
        tol2 = jnp.asarray(rtol, bb.dtype) ** 2 * bb
        warm = x0 is not None
        it_off = 1 if warm else 0  # iteration 0 is the init pass

        def q_of(x, r):
            # Q(x) = 0.5 x'Sx - b'x = -0.5 (x'b + x'r)  since r = b - Sx
            return -0.5 * (dot(x, b) + dot(x, r))

        def q_continue(Qp, Qn, Q0, it):
            """False once the quadratic model stagnates (Nash-Sofer
            criterion, as in Ceres' conjugate_gradients_solver). Progress
            is measured relative to THIS call's starting model value Q0
            (0 for a zero start — classic criterion): a good warm start
            makes the absolute Q large immediately, and n(Qn-Qp)/Qn would
            read "stagnant" at n=2 and hand back ~x0, the previous LM
            step over again (measured: venice stalls at RMSE 0.749 where
            the zero-start solve reaches the 0.68 noise floor)."""
            if q_tol is None:
                return jnp.asarray(True)
            n = (it - it_off).astype(bb.dtype)
            dq = Qn - Q0
            zeta = n * (Qn - Qp) / jnp.where(dq == 0, -1.0, dq)
            return (n < 2) | (zeta >= q_tol)

        # state: (x, r, z, p, rz, Q_prev, Q, Q_start, it)
        def cg_update(state, Sp):
            x, r, z, p, rz, Qp, Qn, Q0, it = state
            denom = dot(p, Sp)
            alpha = (rz / jnp.where(denom == 0, 1.0, denom)).astype(b.dtype)
            x = x + alpha * p
            r = r - alpha * Sp
            z = apply_M(r)
            rz_new = dot(r, z)
            beta = (rz_new / jnp.where(rz == 0, 1.0, rz)).astype(b.dtype)
            p = z + beta * p
            return (x, r, z, p, rz_new, Qn, q_of(x, r), Q0, it + 1)

        zero_q = jnp.zeros((), bb.dtype)
        if not warm:
            def cond(state):
                x, r, z, p, rz, Qp, Qn, Q0, it = state
                return ((dot(r, r) > tol2) & (it < max_iter)
                        & q_continue(Qp, Qn, Q0, it))

            def body(state):
                return cg_update(state, apply_S(state[3]))

            z0 = apply_M(b)
            state = (jnp.zeros_like(b), b, z0, z0, dot(b, z0),
                     zero_q, zero_q, zero_q, jnp.asarray(0, jnp.int32))
            x, *_ = jax.lax.while_loop(cond, body, state)
            return x

        def cond(state):
            x, r, z, p, rz, Qp, Qn, Q0, it = state
            return (it == 0) | ((dot(r, r) > tol2) & (it < max_iter + it_off)
                                & q_continue(Qp, Qn, Q0, it))

        def body(state):
            x, r, z, p, rz, Qp, Qn, Q0, it = state
            Sp = apply_S(p)  # on the init pass p == x0

            def init_branch(_):
                r_w = b - Sp
                better = dot(r_w, r_w) < bb
                x_n = jnp.where(better, p, jnp.zeros_like(p))
                r_n = jnp.where(better, r_w, b)
                z_n = apply_M(r_n)
                q_n = q_of(x_n, r_n)
                return (x_n, r_n, z_n, z_n, dot(r_n, z_n),
                        q_n, q_n, q_n, it + 1)

            return jax.lax.cond(it == 0, init_branch,
                                lambda _: cg_update(state, Sp), None)

        one = jnp.ones((), b.dtype)
        state = (x0, b, b, x0, dot(b, b) + one,
                 zero_q, zero_q, zero_q, jnp.asarray(0, jnp.int32))
        x, *_ = jax.lax.while_loop(cond, body, state)
        return x

    # Pairs processed per scatter step in the explicit variant. Dense
    # visibility makes the pair count quadratic in cameras-per-landmark
    # (ladybug-49 full-visibility: 18.6M pairs -> a [P, De, De] buffer of
    # 152 GB if materialized at once); scanning fixed-size chunks bounds
    # the peak at ~CHUNK * De^2 * 3 floats regardless of pair count.
    PAIR_CHUNK = 1 << 18

    def _scatter_pair_products(self, S, Y, W, ent_a, ent_b, ia, ib):
        """S -= scatter-add of per-pair De x De products Y[ia] @ W[ib]^T at
        entity-block (ent_a[ia], ent_b[ib]) — the per-landmark outer-product
        accumulation of explicit_schur.rs:771-925, chunked to bound memory."""
        De = self.entity_dof
        ar = jnp.arange(De, dtype=jnp.int32)

        def add_chunk(S, idx_a, idx_b, mask):
            contrib = _es("pik,pjk->pij", Y[idx_a], W[idx_b])
            contrib = contrib * mask[:, None, None]
            rows = (ent_a[idx_a][:, None] * De + ar)[:, :, None]
            cols = (ent_b[idx_b][:, None] * De + ar)[:, None, :]
            return S.at[
                jnp.broadcast_to(rows, contrib.shape),
                jnp.broadcast_to(cols, contrib.shape),
            ].add(-contrib)

        n = int(ia.shape[0])
        chunk = self.PAIR_CHUNK
        if n <= chunk:
            return add_chunk(S, ia, ib, jnp.ones((n,), S.dtype))

        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        mask = jnp.concatenate(
            [jnp.ones((n,), S.dtype), jnp.zeros((pad,), S.dtype)]
        ).reshape(n_chunks, chunk)
        ia_p = jnp.concatenate([ia, jnp.zeros((pad,), ia.dtype)]).reshape(n_chunks, chunk)
        ib_p = jnp.concatenate([ib, jnp.zeros((pad,), ib.dtype)]).reshape(n_chunks, chunk)

        def body(S, xs):
            idx_a, idx_b, m = xs
            return add_chunk(S, idx_a, idx_b, m), None

        S, _ = jax.lax.scan(body, S, (ia_p, ib_p, mask))
        return S

    # ------------------------------------------------------------------

    def _x0_reduced(self, dx_prev):
        """Previous global step -> reduced camera vector for PCG warm
        start (None passthrough)."""
        if dx_prev is None:
            return None
        kept = np.nonzero(self.red_of_global >= 0)[0]
        x0 = jnp.zeros((self.Dc,), dtype=dx_prev.dtype)
        return x0.at[jnp.asarray(self.red_of_global[kept].astype(np.int32))
                     ].set(dx_prev[jnp.asarray(kept.astype(np.int32))])

    def solve(self, values, damping, iteration=None, dx_prev=None):
        """One damped Schur solve: returns (dx_global [D], g_global [D],
        cost, predicted_reduction). ``dx_prev`` (the previous LM
        iteration's global step) warm-starts the PCG (see _pcg).

        ``predicted_reduction`` is the EXACT Gauss-Newton model reduction
        -g.dx - 0.5 dx^T H dx evaluated with the actual (possibly inexact)
        step — with truncated PCG the usual shortcut 0.5 dx^T (lambda dx - g)
        assumes an exact solve and systematically under-predicts, driving
        rho > 4 and collapsing Nielsen damping (round-1 venice NaN
        mechanism). Costs two extra coupling products per LM iteration."""
        cp = self.cp
        dt = cp.dtype
        if self.uniform is not None and self.variant == "iterative":
            return self.uniform.solve(values, damping, iteration=iteration,
                                      dx_prev=dx_prev)
        Hcc, gc, Hpp, gp, Ws, cost = self.assemble(values, damping)
        Hpp_inv = landmark_inverse(Hpp)

        # reduced rhs: b = -gc + W Hpp^-1 gp
        u_g = _es("kij,kj->ki", Hpp_inv, gp)
        b = -gc + self._w_u(Ws, u_g)

        if self.variant == "sparse":
            De = self.entity_dof
            S = self._hcc_dense(Hcc)
            Ys = [
                _es("kij,kjl->kil", W, Hpp_inv[mc.lm_ids])
                for mc, W in zip(self.mcouplings, Ws)
            ]
            pi = 0
            for a, mca in enumerate(self.mcouplings):
                for bidx, mcb in enumerate(self.mcouplings):
                    ia, ib = self.pair_indices[pi]
                    pi += 1
                    if ia.shape[0] == 0:
                        continue
                    S = self._scatter_pair_products(
                        S, Ys[a], Ws[bidx], mca.ent_ids, mcb.ent_ids, ia, ib)
            dxc = solve_cholesky_with_retry(S, -b)
        else:
            def apply_S(x):
                t = self._wt_x(Ws, x)
                u = _es("kij,kj->ki", Hpp_inv, t)
                return self._hcc_matvec(Hcc, x) - self._w_u(Ws, u)

            if self.preconditioner == "none":
                apply_M = lambda x: x  # noqa: E731
            else:
                inv_blocks = self._entity_prec_inv(
                    Hcc, Hpp_inv, Ws,
                    schur_jacobi=(self.preconditioner == "schur_jacobi"),
                )
                apply_M = lambda x: self._entity_prec_apply(inv_blocks, x)  # noqa: E731

            rtol = self.pcg_rtol_floor
            if self.pcg_forcing and iteration is not None:
                # forcing sequence: loose solves while LM is far from the
                # optimum, tightening geometrically toward the floor
                # (Eisenstat-Walker in spirit; deterministic so the whole
                # solve stays a single jitted while_loop).
                k = jnp.asarray(iteration, dt)
                rtol = jnp.where(
                    k < 0, jnp.asarray(self.pcg_rtol_floor, dt),
                    jnp.clip(0.1 * jnp.exp2(-k), self.pcg_rtol_floor, 0.1))
            dxc = self._pcg(apply_S, apply_M, b, rtol=rtol,
                            x0=self._x0_reduced(dx_prev))

        # back-substitution: dxp = Hpp^-1 (-gp - W^T dxc)
        t = self._wt_x(Ws, dxc)
        dxp = _es("kij,kj->ki", Hpp_inv, -gp - t)

        # exact model reduction with the actual step (see docstring):
        # q = dx^T H dx via the damped blocks minus the diagonal shifts.
        dot = self._dot64
        Hdxc = self._hcc_matvec(Hcc, dxc)
        Wdxp = self._w_u(Ws, dxp)
        Hpp_dxp = _es("kij,kj->ki", Hpp, dxp)
        q_damped = (
            dot(dxc, Hdxc)
            + 2.0 * dot(dxc, Wdxp)
            + dot(dxp.reshape(-1), Hpp_dxp.reshape(-1))
        )
        shift = self._pp_shift(damping)
        q = (
            q_damped
            - damping * dot(dxc, dxc)
            - shift * dot(dxp.reshape(-1), dxp.reshape(-1))
        )
        g_dot_dx = dot(gc, dxc) + dot(gp.reshape(-1), dxp.reshape(-1))
        predicted = (-g_dot_dx - 0.5 * q).astype(dt)

        dx, g_full = self._scatter_global(dxc, gc, dxp, gp)
        return dx, g_full, cost, predicted

    def _scatter_global(self, dxc, gc, dxp, gp):
        """Place the reduced camera step/gradient and the landmark step/
        gradient back into the global tangent layout."""
        cp = self.cp
        dt = cp.dtype
        D = cp.total_dof
        dx = jnp.zeros((D,), dtype=dt)
        g_full = jnp.zeros((D,), dtype=dt)
        kept = np.nonzero(self.red_of_global >= 0)[0]
        kept32 = jnp.asarray(kept.astype(np.int32))
        red32 = jnp.asarray(self.red_of_global[kept].astype(np.int32))
        dx = dx.at[kept32].set(dxc[red32])
        g_full = g_full.at[kept32].set(gc[red32])
        lm_cols = np.asarray(sorted(self._lm_id_of_global), dtype=np.int32)
        lm_ids_sorted = np.asarray(
            [self._lm_id_of_global[c] for c in lm_cols], dtype=np.int32)
        lm_cols3 = jnp.asarray(lm_cols)[:, None] + jnp.arange(3, dtype=np.int32)
        dx = dx.at[lm_cols3].set(dxp[jnp.asarray(lm_ids_sorted)])
        g_full = g_full.at[lm_cols3].set(gp[jnp.asarray(lm_ids_sorted)])
        return dx, g_full
