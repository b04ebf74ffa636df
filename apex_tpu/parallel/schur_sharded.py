"""Multi-chip bundle adjustment: observation-sharded implicit Schur.

SURVEY.md §2.6 / BASELINE.json north star: "landmarks partition across
chips and the reduced camera Hessian allreduces over ICI". Concretely:

- observations (factor groups, including the coupling W blocks) are sharded
  across the mesh; camera and landmark STATES are replicated
- each chip linearizes its observation shard and accumulates partial
  (H_cc, g_c, H_pp, g_p, cost); one psum reduces them over ICI
- the PCG on the reduced camera system runs replicated, with the two
  matrix-free products W^T x and W u computed shard-locally and psummed —
  exactly one psum pair per PCG iteration (SURVEY.md §2.6)
- back-substitution for the landmark step is replicated (cheap batched
  3x3 solves)

Everything is one shard_map-ed program; collectives ride the mesh axis.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from ..linalg.smallmm import es as _es
from jax.sharding import Mesh, PartitionSpec as P

from ..core.problem import CompiledProblem
from ..linalg.schur import SchurContext, invert_landmark_blocks
from ..linalg.utils import spd_clamped_inv
from ..optim.common import compute_step_quality
from .sharding import _pad_axis0


def _pad_group_for_schur(cp, ctx, gi, n):
    """Pad group gi's arrays (and its schur classification arrays) to a
    multiple of n; returns dict of sharded leaves + static meta."""
    g = cp.groups[gi]
    Kp = int(-(-g.count // n) * n)
    base_w = (jnp.ones((g.count,), cp.dtype) if g.weights is None
              else g.weights.astype(cp.dtype))
    weight = jnp.concatenate([base_w, jnp.zeros((Kp - g.count,), cp.dtype)])
    leaves = dict(
        data={k: _pad_axis0(v, Kp) for k, v in g.data.items()},
        loss_params=_pad_axis0(g.loss_params, Kp),
        indices=tuple(_pad_axis0(ix, Kp) for ix in g.indices),
        cols=tuple(_pad_axis0(c, Kp) for c in g.cols),
        masks=tuple(m for m in (g.free_masks or ()) if m is not None),
        weight=weight,
        red_base=tuple(
            _pad_axis0(b, Kp) if b is not None else None
            for b in ctx.slot_red_base[gi]
        ),
        lm_ids=tuple(
            _pad_axis0(l, Kp) if l is not None else None
            for l in ctx.slot_lm_ids[gi]
        ),
    )
    # pad masks separately preserving None slots
    masks_p = tuple(
        None if m is None else _pad_axis0(m, Kp) for m in g.free_masks
    )
    leaves["masks"] = tuple(m for m in masks_p if m is not None)
    return leaves, masks_p


def make_sharded_schur_step(
    cp: CompiledProblem,
    mesh: Mesh,
    axis_name: str = None,
    eliminate_prefix: str = "pt_",
    preconditioner: str = "schur_jacobi",
    pcg_max_iterations: int = 200,
    pcg_tolerance: float = 1e-6,
    damping_min: float = 1e-12,
    damping_max: float = 1e12,
    pcg_q_tolerance: float | None = None,
):
    """Build a full sharded LM-with-implicit-Schur iteration:
    fn(values, damping, nu, cost) -> (values, damping, nu, cost).
    Returns (step_fn, shard_args)."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    ctx = SchurContext(
        cp, eliminate_prefix=eliminate_prefix, variant="iterative",
        preconditioner=preconditioner,
        pcg_max_iterations=pcg_max_iterations, pcg_tolerance=pcg_tolerance,
        pcg_q_tolerance=pcg_q_tolerance,
    )
    if ctx.uniform is not None:
        # Uniform (bucketed) layout: landmark-PARTITIONED plane pipeline —
        # per-chip memory is 1/nd of everything landmark- or observation-
        # sized. The block layout below stays as the general fallback.
        from .schur_planes_sharded import make_sharded_plane_schur_step

        return make_sharded_plane_schur_step(
            cp, ctx, mesh, axis_name,
            damping_min=damping_min, damping_max=damping_max)
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names if a == axis_name]))

    shard_leaves = []
    mask_layouts = []
    for gi in range(len(cp.groups)):
        leaves, masks_p = _pad_group_for_schur(cp, ctx, gi, n)
        shard_leaves.append(
            (
                leaves["data"], leaves["loss_params"], leaves["indices"],
                leaves["cols"], leaves["masks"], leaves["weight"],
                tuple(b for b in leaves["red_base"] if b is not None),
                tuple(l for l in leaves["lm_ids"] if l is not None),
            )
        )
        mask_layouts.append(masks_p)

    Dc, Pn = ctx.Dc, ctx.num_landmarks
    dt = cp.dtype

    def local_solve(values, damping, *args):
        # ---- local assembly over this chip's observation shard ----------
        Hcc = jnp.zeros((Dc, Dc), dtype=dt)
        gc = jnp.zeros((Dc,), dtype=dt)
        Hpp = jnp.zeros((Pn, 3, 3), dtype=dt)
        gp = jnp.zeros((Pn, 3), dtype=dt)
        cost = jnp.zeros((), dtype=dt)
        Ws: List = []
        W_meta: List = []  # (red_base [K], lm_ids [K], ds)

        for gi, leaf in enumerate(args):
            data, loss_params, indices, cols, masks_present, weight, bases_p, lmids_p = leaf
            g = cp.groups[gi]
            masks = []
            mi = 0
            for m in mask_layouts[gi]:
                if m is None:
                    masks.append(None)
                else:
                    masks.append(masks_present[mi])
                    mi += 1
            g_local = dataclasses.replace(
                g,
                data=data,
                loss_params=loss_params,
                indices=tuple(indices),
                cols=tuple(cols),
                free_masks=tuple(masks),
                weights=None,  # folded into `weight` by _pad_group_for_schur
                count=weight.shape[0],
            )
            r, jacs = cp.group_linearize(values, g_local, True)
            r = r * weight[:, None]
            jacs = [j * weight[:, None, None] for j in jacs]
            cost = cost + 0.5 * jnp.sum(r * r)

            kinds = ctx.slot_kind[gi]
            bi = li = 0
            slot_base, slot_lm = [], []
            for s in range(len(g.manifolds)):
                if kinds[s] == "cam":
                    slot_base.append(bases_p[bi]); bi += 1
                    slot_lm.append(None)
                else:
                    slot_lm.append(lmids_p[li]); li += 1
                    slot_base.append(None)

            for s in range(len(g.manifolds)):
                Js = jacs[s]
                ds = g.manifolds[s].dof
                gs = _es("kdi,kd->ki", Js, r)
                if kinds[s] == "cam":
                    base = slot_base[s]
                    ccols = base[:, None] + jnp.arange(ds, dtype=base.dtype)
                    gc = gc.at[ccols].add(gs)
                else:
                    gp = gp.at[slot_lm[s]].add(gs)
                for t in range(len(g.manifolds)):
                    Jt = jacs[t]
                    dtof = g.manifolds[t].dof
                    Hst = _es("kdi,kdj->kij", Js, Jt)
                    if kinds[s] == "cam" and kinds[t] == "cam":
                        bs, bt = slot_base[s], slot_base[t]
                        rows = (bs[:, None] + jnp.arange(ds, dtype=bs.dtype))[:, :, None]
                        colsj = (bt[:, None] + jnp.arange(dtof, dtype=bt.dtype))[:, None, :]
                        Hcc = Hcc.at[
                            jnp.broadcast_to(rows, Hst.shape),
                            jnp.broadcast_to(colsj, Hst.shape),
                        ].add(Hst)
                    elif kinds[s] == "lm" and kinds[t] == "lm":
                        Hpp = Hpp.at[slot_lm[s]].add(Hst)
                    elif kinds[s] == "cam" and kinds[t] == "lm":
                        Ws.append(Hst)
                        W_meta.append((slot_base[s], slot_lm[t], ds))

        # ---- allreduce the reduced-system pieces over ICI ---------------
        Hcc = jax.lax.psum(Hcc, axis_name)
        gc = jax.lax.psum(gc, axis_name)
        Hpp = jax.lax.psum(Hpp, axis_name)
        gp = jax.lax.psum(gp, axis_name)
        cost = jax.lax.psum(cost, axis_name)

        Hcc = Hcc + damping * jnp.eye(Dc, dtype=dt)
        Hpp = Hpp + damping * jnp.eye(3, dtype=dt)
        Hpp_inv = invert_landmark_blocks(Hpp)  # shard-local; pallas kernel not used under shard_map yet

        def wt_x(x):
            """psum_k W_k^T x[cam block]: shard-local gather + one psum."""
            t = jnp.zeros((Pn, 3), dtype=dt)
            for W, (base, lm, ds) in zip(Ws, W_meta):
                ccols = base[:, None] + jnp.arange(ds, dtype=base.dtype)
                t = t.at[lm].add(_es("kij,ki->kj", W, x[ccols]))
            return jax.lax.psum(t, axis_name)

        def w_u(u):
            y = jnp.zeros((Dc,), dtype=dt)
            for W, (base, lm, ds) in zip(Ws, W_meta):
                sk = _es("kij,kj->ki", W, u[lm])
                ccols = base[:, None] + jnp.arange(ds, dtype=base.dtype)
                y = y.at[ccols].add(sk)
            return jax.lax.psum(y, axis_name)

        # reduced rhs b = -gc + W Hpp^-1 gp
        u_g = _es("kij,kj->ki", Hpp_inv, gp)
        b = -gc + w_u(u_g)

        def apply_S(x):
            t = wt_x(x)
            u = _es("kij,kj->ki", Hpp_inv, t)
            return Hcc @ x - w_u(u)

        # Schur-Jacobi preconditioner blocks (per camera-side variable)
        if preconditioner == "none":
            apply_M = lambda x: x  # noqa: E731
        else:
            per_pool_acc = {}
            w_idx = 0
            for gi in range(len(cp.groups)):
                kinds = ctx.slot_kind[gi]
                lm_slots = [s for s, k in enumerate(kinds) if k == "lm"]
                if not lm_slots:
                    continue
                for s, k in enumerate(kinds):
                    if k != "cam":
                        continue
                    W = Ws[w_idx]
                    base, lm, ds = W_meta[w_idx]
                    w_idx += 1
                    if preconditioner == "block_diagonal":
                        continue
                    Z = _es("kil,kml->kim", _es("kij,kjl->kil", W, Hpp_inv[lm]), W)
                    pid = cp.groups[gi].pool_ids[s]
                    rows = args[gi][2][s]  # padded pool-row indices
                    if pid not in per_pool_acc:
                        nv = len(cp.pools[pid].names)
                        per_pool_acc[pid] = jnp.zeros((nv, ds, ds), dtype=dt)
                    per_pool_acc[pid] = per_pool_acc[pid].at[rows].add(Z)
            per_pool_acc = {
                pid: jax.lax.psum(acc, axis_name) for pid, acc in per_pool_acc.items()
            }
            blocks = []
            for pid, kept_rows, bases, d in ctx.cam_pools:
                rows = (bases[:, None] + jnp.arange(d, dtype=bases.dtype))[:, :, None]
                colsb = (bases[:, None] + jnp.arange(d, dtype=bases.dtype))[:, None, :]
                B = Hcc[
                    jnp.broadcast_to(rows, (bases.shape[0], d, d)),
                    jnp.broadcast_to(colsb, (bases.shape[0], d, d)),
                ]
                if pid in per_pool_acc:
                    B = B - per_pool_acc[pid][kept_rows]
                # spd_clamped_inv, not jnp.linalg.inv: LuDecomposition only
                # implements f32 on TPU so linalg.inv is banned from solver
                # paths (doc/performance.md numerics finding 3); the clamped
                # eigendecomposition inverse also regularizes near-singular
                # preconditioner blocks instead of exploding.
                blocks.append((bases, d, spd_clamped_inv(B)))

            def apply_M(x):
                return SchurContext._apply_blocks(blocks, x)

        dxc = ctx._pcg(apply_S, apply_M, b)

        # back-substitute landmark step (replicated)
        t = wt_x(dxc)
        dxp = _es("kij,kj->ki", Hpp_inv, -gp - t)

        # scatter into the global tangent vector
        D = cp.total_dof
        dx = jnp.zeros((D,), dtype=dt)
        g_full = jnp.zeros((D,), dtype=dt)
        kept = np.nonzero(ctx.red_of_global >= 0)[0]
        dx = dx.at[jnp.asarray(kept)].set(dxc[jnp.asarray(ctx.red_of_global[kept])])
        g_full = g_full.at[jnp.asarray(kept)].set(gc[jnp.asarray(ctx.red_of_global[kept])])
        lm_cols = np.asarray(sorted(ctx._lm_id_of_global), dtype=np.int64)
        lm_ids_sorted = np.asarray([ctx._lm_id_of_global[c] for c in lm_cols])
        lm_cols3 = jnp.asarray(lm_cols)[:, None] + jnp.arange(3)
        dx = dx.at[lm_cols3].set(dxp[jnp.asarray(lm_ids_sorted)])
        g_full = g_full.at[lm_cols3].set(gp[jnp.asarray(lm_ids_sorted)])
        return dx, g_full, cost

    shard_args = tuple(shard_leaves)
    solve = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(), P()) + tuple(P(axis_name) for _ in shard_args),
        out_specs=(P(), P(), P()),
    )

    def step(values, damping, nu, current_cost):
        dx, g_full, cost = solve(values, damping, *shard_args)
        predicted = 0.5 * jnp.dot(dx, damping * dx - g_full)
        new_values = cp.apply_step(values, dx)
        new_cost = cp.cost(new_values)
        rho = compute_step_quality(cost, new_cost, predicted)
        accepted = rho > 0.0
        coff = 2.0 * rho - 1.0
        new_damping = jnp.where(
            accepted,
            jnp.clip(damping * jnp.maximum(1.0 / 3.0, 1.0 - coff**3),
                     damping_min, damping_max),
            jnp.minimum(damping * nu, damping_max),
        )
        new_nu = jnp.where(accepted, 2.0, nu * 2.0)
        out_values = jax.tree.map(
            lambda a, b: jnp.where(accepted, a, b), new_values, values
        )
        out_cost = jnp.where(accepted, new_cost, cost)
        return out_values, new_damping, new_nu, out_cost

    return step, shard_args
