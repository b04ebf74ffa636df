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
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.problem import CompiledProblem
from .dense import solve_cholesky_with_retry


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
    the XLA formulation otherwise (identical semantics). Opt-in via
    APEX_TPU_PALLAS=1 while the kernel is being qualified on real
    hardware (the remote TPU runtime crashed under it at 156k-block scale;
    interpret-mode correctness is fully tested)."""
    import os

    if (os.environ.get("APEX_TPU_PALLAS", "0") == "1"
            and jax.default_backend() == "tpu" and Hpp.shape[0] >= 4096
            and Hpp.dtype == jnp.float32):
        from ..kernels import invert_landmark_blocks_pallas

        return invert_landmark_blocks_pallas(Hpp, interpret=False)
    return invert_landmark_blocks(Hpp)


# ---------------------------------------------------------------------------
# Schur context over a CompiledProblem
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _CouplingMeta:
    group_idx: int
    cam_slot: int
    lm_slot: int
    ds: int
    cam_base: jnp.ndarray  # [K] reduced col base of the camera-side var
    cam_rows: jnp.ndarray  # [K] row of the camera-side var within its pool
    cam_pool: int
    lm_ids: jnp.ndarray  # [K] landmark id


class SchurContext:
    """Precomputed elimination structure + assembly/solve over a
    CompiledProblem. Landmark variables are those whose name starts with
    ``eliminate_prefix`` and live on a 3-DOF Euclidean manifold (the
    reference's SchurOrdering rule)."""

    def __init__(
        self,
        cp: CompiledProblem,
        eliminate_prefix: str = "pt_",
        variant: str = "iterative",  # "sparse" (explicit) | "iterative"
        preconditioner: str = "schur_jacobi",  # none | block_diagonal | schur_jacobi
        pcg_max_iterations: int = 200,
        pcg_tolerance: float = 1e-6,
    ):
        self.cp = cp
        self.variant = variant
        self.preconditioner = preconditioner
        self.pcg_max_iterations = pcg_max_iterations
        self.pcg_tolerance = pcg_tolerance

        # --- classify variables ------------------------------------------
        D = cp.total_dof
        lm_id_of_global = {}  # global col -> landmark id
        elim_pool_rows = []  # (pool_id, rows array, lm ids array)
        P = 0
        for pid, pool in enumerate(cp.pools):
            if pool.manifold.dof != 3 or pool.manifold.storage_dim != 3:
                elim_pool_rows.append(None)
                continue
            rows = [i for i, n in enumerate(pool.names) if n.startswith(eliminate_prefix)]
            if not rows:
                elim_pool_rows.append(None)
                continue
            cols = np.asarray(pool.cols)
            ids = []
            for i in rows:
                lm_id_of_global[int(cols[i])] = P
                ids.append(P)
                P += 1
            elim_pool_rows.append((np.asarray(rows), np.asarray(ids)))
        self.num_landmarks = P
        if P == 0:
            raise ValueError(
                f"Schur solver found no landmark variables (prefix "
                f"{eliminate_prefix!r} on R3 manifolds)"
            )

        # reduced column map for kept (camera-side) DOF
        red_of_global = np.full(D, -1, dtype=np.int64)
        red = 0
        for pid, pool in enumerate(cp.pools):
            cols = np.asarray(pool.cols)
            for i, n in enumerate(pool.names):
                c = int(cols[i])
                if c in lm_id_of_global:
                    continue
                red_of_global[c : c + pool.manifold.dof] = np.arange(red, red + pool.manifold.dof)
                red += pool.manifold.dof
        self.Dc = red
        self.red_of_global = red_of_global
        self._lm_id_of_global = lm_id_of_global

        # camera-side per-pool block info (for block preconditioners)
        self.cam_pools = []  # (pool_id, kept_rows [Nv], red_base [Nv], dof)
        for pid, pool in enumerate(cp.pools):
            cols = np.asarray(pool.cols)
            kept = [i for i in range(len(pool.names)) if int(cols[i]) not in lm_id_of_global]
            if kept:
                bases = red_of_global[cols[np.asarray(kept)]]
                self.cam_pools.append(
                    (pid, jnp.asarray(np.asarray(kept)), jnp.asarray(bases), pool.manifold.dof)
                )

        # --- classify group slots ----------------------------------------
        # per group: list of slot kinds; "cam" or "lm"
        self.slot_kind: List[List[str]] = []
        self.slot_red_base: List[List[Optional[jnp.ndarray]]] = []
        self.slot_lm_ids: List[List[Optional[jnp.ndarray]]] = []
        self.couplings: List[_CouplingMeta] = []
        for gi, g in enumerate(cp.groups):
            kinds, bases, lmids = [], [], []
            for s in range(len(g.manifolds)):
                cols_s = np.asarray(g.cols[s])
                is_lm = np.array([c in lm_id_of_global for c in cols_s])
                if is_lm.all():
                    kinds.append("lm")
                    bases.append(None)
                    lmids.append(jnp.asarray(np.array([lm_id_of_global[c] for c in cols_s])))
                elif (~is_lm).all():
                    kinds.append("cam")
                    bases.append(jnp.asarray(red_of_global[cols_s]))
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
            if lm_slots:
                t = lm_slots[0]
                for s, k in enumerate(kinds):
                    if k == "cam":
                        self.couplings.append(
                            _CouplingMeta(
                                group_idx=gi,
                                cam_slot=s,
                                lm_slot=t,
                                ds=g.manifolds[s].dof,
                                cam_base=bases[s],
                                cam_rows=g.indices[s],
                                cam_pool=g.pool_ids[s],
                                lm_ids=lmids[t],
                            )
                        )

        # --- static pair enumeration for the explicit variant -------------
        self.pair_indices = None
        if variant == "sparse":
            self.pair_indices = self._enumerate_pairs()

    def _enumerate_pairs(self):
        """For each ordered coupling-record pair (A, B): indices (ia, ib) of
        entries sharing a landmark — the per-landmark outer products of
        explicit_schur.rs:771-925, enumerated statically."""
        by_rec = []
        for meta in self.couplings:
            ids = np.asarray(meta.lm_ids)
            order = np.argsort(ids, kind="stable")
            by_lm = {}
            for k in order:
                by_lm.setdefault(int(ids[k]), []).append(int(k))
            by_rec.append(by_lm)
        pairs = []
        for a, meta_a in enumerate(self.couplings):
            for b, meta_b in enumerate(self.couplings):
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

    def assemble(self, values, damping=None):
        """Linearize all groups and build (Hcc, gc, Hpp, gp, Ws, cost).
        Ws[i] is the [K, ds, 3] coupling block array for self.couplings[i]."""
        cp = self.cp
        dt = cp.dtype
        Hcc = jnp.zeros((self.Dc, self.Dc), dtype=dt)
        gc = jnp.zeros((self.Dc,), dtype=dt)
        Hpp = jnp.zeros((self.num_landmarks, 3, 3), dtype=dt)
        gp = jnp.zeros((self.num_landmarks, 3), dtype=dt)
        cost = jnp.zeros((), dtype=dt)
        Ws: List[Optional[jnp.ndarray]] = [None] * len(self.couplings)

        coupling_of = {(m.group_idx, m.cam_slot): i for i, m in enumerate(self.couplings)}

        for gi, g in enumerate(cp.groups):
            r, jacs = cp.group_linearize(values, g, True)
            cost = cost + 0.5 * jnp.sum(r * r)
            kinds = self.slot_kind[gi]
            for s in range(len(g.manifolds)):
                Js = jacs[s]
                ds = g.manifolds[s].dof
                gs = jnp.einsum("kdi,kd->ki", Js, r)
                if kinds[s] == "cam":
                    base = self.slot_red_base[gi][s]
                    cols = base[:, None] + jnp.arange(ds, dtype=base.dtype)[None, :]
                    gc = gc.at[cols].add(gs)
                else:
                    gp = gp.at[self.slot_lm_ids[gi][s]].add(gs)
                for t in range(len(g.manifolds)):
                    Jt = jacs[t]
                    dtof = g.manifolds[t].dof
                    Hst = jnp.einsum("kdi,kdj->kij", Js, Jt)
                    if kinds[s] == "cam" and kinds[t] == "cam":
                        bs = self.slot_red_base[gi][s]
                        bt = self.slot_red_base[gi][t]
                        rows = (bs[:, None] + jnp.arange(ds, dtype=bs.dtype))[:, :, None]
                        colsj = (bt[:, None] + jnp.arange(dtof, dtype=bt.dtype))[:, None, :]
                        Hcc = Hcc.at[
                            jnp.broadcast_to(rows, Hst.shape),
                            jnp.broadcast_to(colsj, Hst.shape),
                        ].add(Hst)
                    elif kinds[s] == "lm" and kinds[t] == "lm":
                        Hpp = Hpp.at[self.slot_lm_ids[gi][s]].add(Hst)
                    elif kinds[s] == "cam" and kinds[t] == "lm":
                        Ws[coupling_of[(gi, s)]] = Hst
                    # lm-cam is the transpose of cam-lm; skip.

        if damping is not None:
            Hcc = Hcc + damping * jnp.eye(self.Dc, dtype=dt)
            Hpp = Hpp + damping * jnp.eye(3, dtype=dt)
        return Hcc, gc, Hpp, gp, Ws, cost

    # ------------------------------------------------------------------

    def _wt_x(self, Ws, xc):
        """t_p = sum_k W_k^T xc[cam block k]  (gather + segment-sum)."""
        t = jnp.zeros((self.num_landmarks, 3), dtype=xc.dtype)
        for meta, W in zip(self.couplings, Ws):
            cols = meta.cam_base[:, None] + jnp.arange(meta.ds, dtype=meta.cam_base.dtype)
            xb = xc[cols]  # [K, ds]
            t = t.at[meta.lm_ids].add(jnp.einsum("kij,ki->kj", W, xb))
        return t

    def _w_u(self, Ws, u):
        """y += sum_k W_k u[lm_k] scattered at camera blocks."""
        y = jnp.zeros((self.Dc,), dtype=u.dtype)
        for meta, W in zip(self.couplings, Ws):
            sk = jnp.einsum("kij,kj->ki", W, u[meta.lm_ids])
            cols = meta.cam_base[:, None] + jnp.arange(meta.ds, dtype=meta.cam_base.dtype)
            y = y.at[cols].add(sk)
        return y

    def _schur_jacobi_blocks(self, Hcc, Hpp_inv, Ws):
        """Per-camera-variable diagonal blocks of S, inverted (implicit_
        schur.rs:456-575). Returns per-pool [Nv, d, d] inverse blocks."""
        # accumulate -W Hpp^-1 W^T per camera variable
        per_pool_acc = {}
        for meta, W in zip(self.couplings, Ws):
            Z = jnp.einsum(
                "kij,kjl,kml->kim", W, Hpp_inv[meta.lm_ids], W
            )  # [K, ds, ds]
            key = meta.cam_pool
            if key not in per_pool_acc:
                nv = len(self.cp.pools[key].names)
                per_pool_acc[key] = jnp.zeros((nv, meta.ds, meta.ds), dtype=Z.dtype)
            per_pool_acc[key] = per_pool_acc[key].at[meta.cam_rows].add(Z)

        blocks = []
        for pid, kept_rows, bases, d in self.cam_pools:
            rows = (bases[:, None] + jnp.arange(d, dtype=bases.dtype))[:, :, None]
            cols = (bases[:, None] + jnp.arange(d, dtype=bases.dtype))[:, None, :]
            B = Hcc[
                jnp.broadcast_to(rows, (bases.shape[0], d, d)),
                jnp.broadcast_to(cols, (bases.shape[0], d, d)),
            ]
            if pid in per_pool_acc:
                B = B - per_pool_acc[pid][kept_rows]
            blocks.append((bases, d, jnp.linalg.inv(B)))
        return blocks

    @staticmethod
    def _apply_blocks(blocks, x):
        y = jnp.zeros_like(x)
        for bases, d, inv in blocks:
            cols = bases[:, None] + jnp.arange(d, dtype=bases.dtype)
            y = y.at[cols].add(jnp.einsum("kij,kj->ki", inv, x[cols]))
        return y

    def _pcg(self, apply_S, apply_M, b):
        """Block-preconditioned conjugate gradients (implicit_schur.rs:
        577-679), in the accumulation dtype."""
        tol2 = self.pcg_tolerance**2 * jnp.dot(b, b)

        def cond(state):
            x, r, z, p, rz, it = state
            return (jnp.dot(r, r) > tol2) & (it < self.pcg_max_iterations)

        def body(state):
            x, r, z, p, rz, it = state
            Sp = apply_S(p)
            denom = jnp.dot(p, Sp)
            alpha = rz / jnp.where(denom == 0, 1.0, denom)
            x = x + alpha * p
            r = r - alpha * Sp
            z = apply_M(r)
            rz_new = jnp.dot(r, z)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p = z + beta * p
            return (x, r, z, p, rz_new, it + 1)

        x0 = jnp.zeros_like(b)
        z0 = apply_M(b)
        state = (x0, b, z0, z0, jnp.dot(b, z0), jnp.asarray(0, jnp.int32))
        x, r, *_ = jax.lax.while_loop(cond, body, state)
        return x

    # ------------------------------------------------------------------

    def solve(self, values, damping):
        """One damped Schur solve: returns (dx_global [D], g_global [D],
        cost)."""
        cp = self.cp
        Hcc, gc, Hpp, gp, Ws, cost = self.assemble(values, damping)
        Hpp_inv = landmark_inverse(Hpp)

        # reduced rhs: b = -gc + W Hpp^-1 gp
        u_g = jnp.einsum("kij,kj->ki", Hpp_inv, gp)
        b = -gc + self._w_u(Ws, u_g)

        if self.variant == "sparse":
            S = Hcc
            Ys = [
                jnp.einsum("kij,kjl->kil", W, Hpp_inv[meta.lm_ids])
                for meta, W in zip(self.couplings, Ws)
            ]
            pi = 0
            for a, meta_a in enumerate(self.couplings):
                for bidx, meta_b in enumerate(self.couplings):
                    ia, ib = self.pair_indices[pi]
                    pi += 1
                    if ia.shape[0] == 0:
                        continue
                    contrib = jnp.einsum("pik,pjk->pij", Ys[a][ia], Ws[bidx][ib])
                    rows = (
                        meta_a.cam_base[ia][:, None]
                        + jnp.arange(meta_a.ds, dtype=meta_a.cam_base.dtype)
                    )[:, :, None]
                    cols = (
                        meta_b.cam_base[ib][:, None]
                        + jnp.arange(meta_b.ds, dtype=meta_b.cam_base.dtype)
                    )[:, None, :]
                    S = S.at[
                        jnp.broadcast_to(rows, contrib.shape),
                        jnp.broadcast_to(cols, contrib.shape),
                    ].add(-contrib)
            dxc = solve_cholesky_with_retry(S, -b)
        else:
            def apply_S(x):
                t = self._wt_x(Ws, x)
                u = jnp.einsum("kij,kj->ki", Hpp_inv, t)
                return Hcc @ x - self._w_u(Ws, u)

            if self.preconditioner == "none":
                apply_M = lambda x: x  # noqa: E731
            else:
                if self.preconditioner == "schur_jacobi":
                    blocks = self._schur_jacobi_blocks(Hcc, Hpp_inv, Ws)
                else:  # block_diagonal of Hcc
                    blocks = self._schur_jacobi_blocks(
                        Hcc, jnp.zeros_like(Hpp_inv), [jnp.zeros_like(W) for W in Ws]
                    )
                apply_M = lambda x: self._apply_blocks(blocks, x)  # noqa: E731
            dxc = self._pcg(apply_S, apply_M, b)

        # back-substitution: dxp = Hpp^-1 (-gp - W^T dxc)
        t = self._wt_x(Ws, dxc)
        dxp = jnp.einsum("kij,kj->ki", Hpp_inv, -gp - t)

        # scatter back to the global tangent layout
        D = cp.total_dof
        dx = jnp.zeros((D,), dtype=cp.dtype)
        g_full = jnp.zeros((D,), dtype=cp.dtype)
        kept = np.nonzero(self.red_of_global >= 0)[0]
        dx = dx.at[jnp.asarray(kept)].set(dxc[jnp.asarray(self.red_of_global[kept])])
        g_full = g_full.at[jnp.asarray(kept)].set(gc[jnp.asarray(self.red_of_global[kept])])
        lm_cols = np.asarray(sorted(self._lm_id_of_global), dtype=np.int64)
        lm_ids_sorted = np.asarray([self._lm_id_of_global[c] for c in lm_cols])
        lm_cols3 = jnp.asarray(lm_cols)[:, None] + jnp.arange(3)
        dx = dx.at[lm_cols3].set(dxp[jnp.asarray(lm_ids_sorted)])
        g_full = g_full.at[lm_cols3].set(gp[jnp.asarray(lm_ids_sorted)])
        return dx, g_full, cost
