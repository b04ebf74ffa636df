"""Multi-chip bundle adjustment over the PLANE pipeline: landmarks
partition across chips (BASELINE.json north star made literal).

The round-2 sharded step replicated all landmark state per chip and
psum'd whole ``[P, 3, 3]`` Hessian blocks — the exact layout the
single-chip measurements (doc/performance.md) prove cannot run at venice
scale. This module instead shards the bucketed canonical layout of
``linalg/schur_planes.py`` (reference scale story:
src/linalg/sparse/implicit_schur.rs:1-27):

- every uniform factor group's landmark range ``[lo, lo+n)`` is split
  into ``nd`` equal consecutive sub-ranges (padded with weight-0 fake
  landmarks); chip ``c`` owns sub-range ``c`` of every group AND the
  ``n_loc * cap`` observation-plane rows that go with it — observation
  data, Jacobian planes, ``hpp6``/``gp3``/``hinv6`` landmark planes and
  the coupling planes ``W`` are all **1/nd per chip, never replicated**;
- landmark-direction reductions (``reshape(n, cap).sum(1)``), landmark
  3x3 inverses, and the back-substituted landmark step are chip-local —
  an observation's landmark always lives on the same chip;
- only entity-direction reductions cross chips: H_cc ([E, De, De],
  small), g_c, cost, and the ``W u`` product inside PCG — one psum per
  PCG iteration — ride the mesh axis (ICI);
- the PCG on the reduced camera system runs replicated (x is [Dc]).

Implemented as a subclass of ``UniformSchur`` overriding exactly two
hooks (``_group`` -> chip-local factor group, ``_allreduce`` -> psum)
plus the final landmark all-gather, so single-chip and multi-chip solve
the literally-same pipeline. Parity: tests/test_sharding_planes.py pins
the 8-device step to the single-chip plane solve at 1e-8 (f64).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.problem import CompiledProblem
from ..linalg.schur_planes import UniformSchur, _UGroup
from ..optim.common import compute_step_quality


@dataclasses.dataclass(frozen=True)
class _GroupMeta:
    """Static per-group sharding layout."""

    gi: int
    cap: int  # 0 for camera-only groups
    lo: int  # global landmark range start (landmark groups)
    n: int  # real landmark count
    n_loc: int  # landmarks per chip (padded)
    k_loc: int  # observation rows per chip
    cam_locs: dict
    lm_slot: object
    mask_layout: tuple  # per-slot: True where a free_mask exists


def _pad_take(n_real, n_pad):
    """Row index that duplicates row 0 into the padded tail (valid gathers,
    finite kernel inputs; weight 0 makes the rows exact no-ops)."""
    take = np.zeros(n_pad, dtype=np.int64)
    take[:n_real] = np.arange(n_real)
    return take


class ShardedUniformSchur(UniformSchur):
    """Chip-local view of the plane pipeline (constructed at trace time
    inside shard_map from the sharded leaves)."""

    def __init__(self, ctx, ugroups, groups_local, lm_metas, axis_name,
                 num_landmarks_local, n_devices):
        super().__init__(ctx, ugroups)
        self._groups_local = groups_local  # gi -> local FactorGroup
        self._lm_metas = lm_metas  # [(meta, llo_local)] landmark groups
        self._axis_name = axis_name
        self._nd = n_devices
        self.num_landmarks = num_landmarks_local

    def _group(self, gi):
        return self._groups_local[gi]

    def _allreduce(self, x):
        return jax.lax.psum(x, self._axis_name)

    def _pvary(self, x):
        # Idempotent: pvary raises on an already-variant input, and whether
        # a value (e.g. prec_blocks' corrT accumulator) is device-variant
        # here depends on which chunking path the problem SHAPE selected —
        # the one-hot preconditioner path feeds it shard-local planes
        # (variant), the small-shape path replicated ones (invariant).
        def f(leaf):
            if self._axis_name in getattr(jax.typeof(leaf), "vma", ()):
                return leaf
            return jax.lax.pvary(leaf, (self._axis_name,))

        return jax.tree_util.tree_map(f, x)

    def _finish(self, dxc, gc, dxp3, gp3):
        """All-gather the landmark partition: every chip scatter-adds its
        slices (fake-landmark entries are exactly zero) into a zeroed
        global plane, one psum merges them, then the shared global
        scatter runs replicated."""
        ctx = self.ctx
        Pg = ctx.num_landmarks
        Pbuf = max([Pg] + [m.lo + m.n_loc * self._nd for m, _ in self._lm_metas])
        c = jax.lax.axis_index(self._axis_name)
        buf = jnp.zeros((6, Pbuf), dtype=dxp3.dtype)
        for meta, llo in self._lm_metas:
            sl = jnp.concatenate(
                [dxp3[:, llo:llo + meta.n_loc], gp3[:, llo:llo + meta.n_loc]],
                axis=0)  # [6, n_loc]
            idx = meta.lo + c * meta.n_loc + jnp.arange(meta.n_loc)
            buf = buf.at[:, idx].add(sl)
        buf = jax.lax.psum(buf, self._axis_name)
        dxp = buf[:3, :Pg].T
        gp = buf[3:, :Pg].T
        return ctx._scatter_global(dxc, gc, dxp, gp)


def make_sharded_plane_schur_step(
    cp: CompiledProblem,
    ctx,
    mesh: Mesh,
    axis_name: str,
    damping_min: float = 1e-12,
    damping_max: float = 1e12,
):
    """Build the landmark-partitioned sharded LM step from a SchurContext
    whose uniform plane pipeline engaged. Returns (step_fn, shard_args)."""
    uni = ctx.uniform
    nd = int(mesh.shape[axis_name])
    dt = cp.dtype

    metas: List[_GroupMeta] = []
    leaves = []
    for hm in uni.host_meta:
        gi, cap, lo, n = hm["gi"], hm["cap"], hm["lo"], hm["n"]
        g = cp.groups[gi]
        if cap:
            n_loc = -(-n // nd)
            k_loc = n_loc * cap
            K_pad = k_loc * nd
        else:
            K_pad = int(-(-g.count // nd) * nd)
            k_loc = K_pad // nd
            n_loc = 0
        take = _pad_take(g.count, K_pad)
        base_w = (np.ones(g.count) if g.weights is None
                  else np.asarray(g.weights, dtype=np.float64))
        weight = np.zeros(K_pad)
        weight[:g.count] = base_w
        ent = np.asarray(hm["ent_host"], dtype=np.int64)[take]
        # Leaves stay NUMPY here; one device_put below places each chip's
        # 1/nd shard directly (never materializing the global array on any
        # one device — venice-scale arrays would not fit otherwise).
        leaves.append(dict(
            data={k: np.asarray(v)[take] for k, v in g.data.items()},
            loss_params=np.asarray(g.loss_params)[take],
            indices=tuple(np.asarray(ix)[take] for ix in g.indices),
            masks=tuple(np.asarray(m)[take]
                        for m in g.free_masks if m is not None),
            weight=weight.astype(dt),
            ent=ent.astype(np.int32),
        ))
        metas.append(_GroupMeta(
            gi=gi, cap=cap, lo=lo, n=n, n_loc=n_loc, k_loc=k_loc,
            cam_locs=hm["cam_locs"], lm_slot=hm["lm_slot"],
            mask_layout=tuple(m is not None for m in g.free_masks),
        ))

    shard_args = tuple(
        (lf["data"], lf["loss_params"], lf["indices"], lf["masks"],
         lf["weight"], lf["ent"])
        for lf in leaves
    )
    # Pre-shard onto the mesh: jit then sees committed sharded arrays
    # (captured or passed) instead of baking global-sized constants that
    # would be replicated on every chip before slicing.
    from jax.sharding import NamedSharding

    shard_args = jax.device_put(
        shard_args, NamedSharding(mesh, P(axis_name)))

    def local_solve(values, damping, iteration, dx_prev, *group_leaves):
        groups_local = {}
        ugroups = []
        lm_metas = []
        llo = 0
        for meta, leaf in zip(metas, group_leaves):
            data, loss_params, indices, masks_present, weight, ent = leaf
            g = cp.groups[meta.gi]
            masks, mi = [], 0
            for present in meta.mask_layout:
                if present:
                    masks.append(masks_present[mi])
                    mi += 1
                else:
                    masks.append(None)
            groups_local[meta.gi] = dataclasses.replace(
                g,
                data=data,
                loss_params=loss_params,
                indices=tuple(indices),
                free_masks=tuple(masks),
                weights=weight.astype(dt),
                count=meta.k_loc,
            )
            if meta.cap:
                ugroups.append(_UGroup(
                    gi=meta.gi, cap=meta.cap, lo=llo, n=meta.n_loc,
                    ent_ids=ent, perm_ent=None, ent_sorted=None,
                    cam_locs=meta.cam_locs, lm_slot=meta.lm_slot,
                ))
                lm_metas.append((meta, llo))
                llo += meta.n_loc
            else:
                ugroups.append(_UGroup(
                    gi=meta.gi, cap=0, lo=0, n=0,
                    ent_ids=ent, perm_ent=None, ent_sorted=None,
                    cam_locs=meta.cam_locs, lm_slot=None,
                ))
        sh = ShardedUniformSchur(ctx, ugroups, groups_local, lm_metas,
                                 axis_name, num_landmarks_local=llo,
                                 n_devices=nd)
        # dx_prev is always a [D] array (zeros before the first iteration);
        # the PCG warm-start guard rejects a zero start automatically, so
        # one trace covers cold and warm solves.
        return sh.solve(values, damping, iteration=iteration,
                        dx_prev=dx_prev)

    # The sharded observation data MUST travel as explicit jit arguments:
    # closure-captured arrays are baked into the executable as constants,
    # which the SPMD partitioner materializes REPLICATED on every chip
    # before slicing — exactly the per-chip memory blowup this module
    # exists to remove (observed in compiled HLO as f32[K_pad, ...]
    # constant ops). So the factory jits internally with the args explicit
    # and `step` is meant to be called eagerly, not wrapped in another jit.
    _solve_jit = jax.jit(jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()) + tuple(P(axis_name) for _ in shard_args),
        out_specs=(P(), P(), P(), P()),
    ))
    _zero_dx = jnp.zeros((cp.total_dof,), dtype=dt)

    def solve_fn(values, damping, iteration=-1, dx_prev=None):
        """(dx, g_full, cost, predicted) — exposed for parity tests."""
        if dx_prev is None:
            dx_prev = _zero_dx
        return _solve_jit(values, damping,
                          jnp.asarray(iteration, jnp.int32), dx_prev,
                          *shard_args)

    @jax.jit
    def _accept(values, damping, nu, dx, cost, predicted):
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

    def step(values, damping, nu, current_cost, iteration=-1, dx_prev=None):
        """One sharded LM iteration. Optional ``iteration`` (>= 0) drives
        the PCG forcing sequence (-1 = fixed tolerance); ``dx_prev`` (the
        previous call's returned step, see ``step.last_dx``) warm-starts
        the PCG."""
        if dx_prev is None:
            dx_prev = _zero_dx
        dx, g_full, cost, predicted = _solve_jit(
            values, damping, jnp.asarray(iteration, jnp.int32), dx_prev,
            *shard_args)
        step.last_dx = dx
        return _accept(values, damping, nu, dx, cost, predicted)

    step.solve = solve_fn
    step.metas = metas
    step._solve_jit = _solve_jit  # for compiled-HLO partition tests
    return step, shard_args
