"""Problem IR: structure-of-arrays factor graph for TPU.

The reference Problem (src/core/problem.rs) is a HashMap of named
``VariableEnum`` plus a list of boxed ``ResidualBlock``s evaluated via rayon.
TPU-first redesign (SURVEY.md §7 "Design stance"):

- **variable pools**: one array per manifold type (``poses: f64[N, 7]``...),
  with per-DOF free masks (fixed variables/indices, problem.rs:609-643) and
  storage-space bounds.
- **factor groups**: residual blocks grouped by (factor signature, loss
  kind); each group carries stacked measurement data, stacked loss
  parameters, and int32 index/column arrays — linearization is one fused
  batched kernel per group, the corrector applied in-kernel, and assembly is
  scatter-add (no mutex, no sparse symbolic analysis).

String names survive only at the Python API boundary.

``Problem`` is the mutable builder; ``CompiledProblem`` is the frozen,
jit-friendly compiled form. The dynamic state threaded through optimizers is
just a tuple of pool value arrays.
"""

from __future__ import annotations

import dataclasses
import re as _re
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from ..linalg.smallmm import es as _es

from ..factors.base import Factor
from ..manifolds import get as get_manifold
from .corrector import correct
from .losses import Loss



def _natural_key(name: str):
    """Sort key splitting digit runs into ints: x2 < x10, cam_9 < cam_10."""
    out = []
    for part in _re.split(r"(\d+)", name):
        out.append(int(part) if part.isdigit() else part)
    return out


def _to_device(arr, dtype=None):
    """numpy-side dtype conversion + single transfer. Converting via
    jnp.asarray(x, dtype=...) compiles a device convert kernel per shape —
    ruinous when the TPU compile service is slow; numpy conversion is free."""
    arr = np.asarray(arr)
    if dtype is not None and arr.dtype != np.dtype(dtype):
        arr = arr.astype(dtype)
    return jnp.asarray(arr)

@dataclasses.dataclass
class VarPool:
    manifold: object
    names: List[str]
    values0: jnp.ndarray  # [N, S]
    free_mask: jnp.ndarray  # [N, dof], 1.0 = free, 0.0 = fixed
    lower: jnp.ndarray  # [N, S]
    upper: jnp.ndarray  # [N, S]
    cols: jnp.ndarray  # [N] int32 global tangent column offsets


@dataclasses.dataclass
class FactorGroup:
    factor_cls: type
    # Batched linearization kernel: (manifolds, data, params, compute_jac)
    # -> (r [K, d], [J [K, d, dof_s] ...]). Usually factor_cls.linearize;
    # factors with bound state (e.g. ProjectionFactor's camera model)
    # provide a closure via group_kernel().
    kernel: object
    manifolds: Tuple
    data: Dict[str, jnp.ndarray]  # each [K, ...]
    loss_kind: str
    loss_params: jnp.ndarray  # [K, P]
    pool_ids: Tuple[int, ...]  # per slot
    indices: Tuple[jnp.ndarray, ...]  # per slot, [K] int32 rows into pool
    cols: Tuple[jnp.ndarray, ...]  # per slot, [K] int32 global col offsets
    # Per slot: None if every bound variable is fully free, else [K, dof]
    # free masks. Unlike the reference (which only zeroes fixed DOF of the
    # *step*, problem.rs:185-289), we also zero the corresponding Jacobian
    # columns so gradient/predicted-reduction are consistent with the
    # actually-applied step. Identical results when nothing is fixed.
    free_masks: Tuple[Optional[jnp.ndarray], ...] = ()
    # Optional [K] residual scale (sqrt-information multiplier). Weight-0
    # rows are exact no-ops (zero residual, zero Jacobian) — used for
    # structure padding (uniform landmark-bucket layouts at BA scale).
    weights: Optional[jnp.ndarray] = None
    residual_dim: int = 0
    row_offset: int = 0
    count: int = 0


class Problem:
    """Mutable factor-graph builder (mirrors reference Problem API)."""

    def __init__(self):
        self._manifold_of: Dict[str, str] = {}
        self._values: Dict[str, np.ndarray] = {}
        self._blocks: List[Tuple[Tuple[str, ...], Factor, Optional[Loss]]] = []
        # bulk-added factor batches: (slot_keys, template, data, loss, count)
        self._bulk: List[tuple] = []
        self._fixed: Dict[str, Optional[List[int]]] = {}
        self._bounds: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    # -- construction ------------------------------------------------------

    def add_variable(self, name: str, manifold, value=None):
        mname = manifold if isinstance(manifold, str) else manifold.name
        G = get_manifold(mname)
        if name in self._manifold_of and self._manifold_of[name] != mname:
            raise ValueError(
                f"variable {name!r} redeclared with manifold {mname}, was "
                f"{self._manifold_of[name]}"
            )
        self._manifold_of[name] = mname
        if value is not None:
            value = np.asarray(value, dtype=np.float64)
            if value.shape != (G.storage_dim,):
                raise ValueError(
                    f"variable {name!r} ({mname}) expects shape "
                    f"({G.storage_dim},), got {value.shape}"
                )
            self._values[name] = value
        return name

    def add_residual_block(self, keys: Sequence[str], factor: Factor,
                           loss: Optional[Loss] = None) -> int:
        keys = tuple(keys)
        manifolds = factor.var_manifolds()
        if len(keys) != len(manifolds):
            raise ValueError(
                f"{type(factor).__name__} binds {len(manifolds)} variables, "
                f"got {len(keys)} keys"
            )
        for k, m in zip(keys, manifolds):
            self.add_variable(k, m)
        self._blocks.append((keys, factor, loss))
        return len(self._blocks) - 1

    def add_residual_block_batch(
        self,
        slot_keys: Sequence[Sequence[str]],
        template: Factor,
        data: Dict[str, np.ndarray],
        loss: Optional[Loss] = None,
        loss_params: Optional[np.ndarray] = None,
        weights: Optional[np.ndarray] = None,
    ):
        """Bulk path for large factor batches (BA observations): one call adds
        K factors sharing ``template``'s signature/kernel with pre-stacked
        per-factor ``data`` arrays [K, ...]. ``slot_keys[s]`` is the list of
        K variable names bound to slot s. Variables must already exist (use
        add_variables_batch). Avoids K Python factor objects — the host-side
        analogue of the reference's bulk add_factors (bin/bundle_adjustment
        .rs:391-441)."""
        manifolds = template.var_manifolds()
        if len(slot_keys) != len(manifolds):
            raise ValueError(
                f"{type(template).__name__} binds {len(manifolds)} slots, got "
                f"{len(slot_keys)}"
            )
        # Each slot is either a per-factor name list, or the fast path
        # (base_names, idx_array): idx indexes into base_names — avoids
        # materializing millions of per-observation strings (venice scale).
        norm_slots = []
        counts = {v.shape[0] for v in data.values()}
        for s, m in enumerate(manifolds):
            sk = slot_keys[s]
            if isinstance(sk, tuple) and len(sk) == 2 and not isinstance(sk[0], str):
                base_names, idx = sk
                idx = np.asarray(idx, dtype=np.int64)
                if idx.min() < 0 or idx.max() >= len(base_names):
                    raise IndexError(f"slot {s}: index out of range")
                for k in base_names:
                    if k not in self._manifold_of:
                        raise KeyError(f"unknown variable {k!r} (add variables first)")
                    if self._manifold_of[k] != m:
                        raise ValueError(
                            f"slot {s} expects {m}, variable {k!r} is "
                            f"{self._manifold_of[k]}"
                        )
                norm_slots.append(("indexed", tuple(base_names), idx))
                counts.add(idx.shape[0])
            else:
                for k in sk:
                    if k not in self._manifold_of:
                        raise KeyError(f"unknown variable {k!r} (add variables first)")
                    if self._manifold_of[k] != m:
                        raise ValueError(
                            f"slot {s} expects {m}, variable {k!r} is "
                            f"{self._manifold_of[k]}"
                        )
                norm_slots.append(("named", tuple(sk), None))
                counts.add(len(sk))
        if len(counts) != 1:
            raise ValueError(f"inconsistent batch sizes: {counts}")
        count = counts.pop()
        if weights is not None:
            weights = np.asarray(weights, dtype=np.float64).reshape(count)
        self._bulk.append((tuple(norm_slots), template, dict(data),
                           loss, loss_params, weights, count))

    def add_variables_batch(self, names: Sequence[str], manifold, values: np.ndarray):
        mname = manifold if isinstance(manifold, str) else manifold.name
        G = get_manifold(mname)
        values = np.asarray(values, dtype=np.float64)
        if values.shape != (len(names), G.storage_dim):
            raise ValueError(
                f"expected values of shape ({len(names)}, {G.storage_dim}), "
                f"got {values.shape}"
            )
        for i, n in enumerate(names):
            self._manifold_of[n] = mname
            self._values[n] = values[i]

    def remove_residual_block(self, block_id: int):
        self._blocks[block_id] = None

    def fix_variable(self, name: str, indices: Optional[Sequence[int]] = None):
        if name not in self._manifold_of:
            raise KeyError(f"unknown variable {name!r}")
        if indices is None:
            self._fixed[name] = None  # all DOF
        else:
            prev = self._fixed.get(name, [])
            if prev is None:
                return
            self._fixed[name] = sorted(set(list(prev) + list(indices)))

    def set_variable_bounds(self, name: str, lower, upper):
        if name not in self._manifold_of:
            raise KeyError(f"unknown variable {name!r}")
        self._bounds[name] = (
            np.asarray(lower, dtype=np.float64),
            np.asarray(upper, dtype=np.float64),
        )

    @property
    def num_residual_blocks(self) -> int:
        return sum(1 for b in self._blocks if b is not None) + sum(
            b[-1] for b in self._bulk
        )

    @property
    def variable_names(self) -> List[str]:
        return sorted(self._manifold_of, key=_natural_key)

    # -- compilation -------------------------------------------------------

    def _edge_arrays(self, id_of):
        """Host-side variable-pair edges (with duplicates) as int64 arrays —
        the variable connectivity graph for fill-reducing ordering."""
        ra, ca = [], []
        for blk in self._blocks:
            if blk is None:
                continue
            ids = [id_of[k] for k in blk[0]]
            for a in range(len(ids)):
                for b in range(a + 1, len(ids)):
                    ra.append(ids[a])
                    ca.append(ids[b])
        out_r = [np.asarray(ra, dtype=np.int64)]
        out_c = [np.asarray(ca, dtype=np.int64)]
        for slot_keys, *_ in self._bulk:
            slot_ids = []
            for kind, names_s, base_idx in slot_keys:
                base = np.asarray([id_of[k] for k in names_s], dtype=np.int64)
                slot_ids.append(base[base_idx] if kind == "indexed" else base)
            for a in range(len(slot_ids)):
                for b in range(a + 1, len(slot_ids)):
                    out_r.append(slot_ids[a])
                    out_c.append(slot_ids[b])
        return np.concatenate(out_r), np.concatenate(out_c)

    @staticmethod
    def _layout_bandwidth(order, dof_arr, er, ec):
        """Tangent-column block bandwidth of the coupling pattern under a
        variable ordering (``order``: permutation of variable ids)."""
        n = len(order)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n)
        cols = np.zeros(n, dtype=np.int64)
        csum = np.concatenate([[0], np.cumsum(dof_arr[order])[:-1]])
        cols[order] = csum
        if er.size == 0:
            return int(dof_arr.max(initial=1))
        lo = np.minimum(cols[er], cols[ec])
        hi = np.maximum(cols[er] + dof_arr[er], cols[ec] + dof_arr[ec])
        return int(max((hi - lo).max(), dof_arr.max()))

    # Auto-ordering guards: RCM only pays off when the name-order band is
    # wide, and the host-side graph build must stay cheap.
    _RCM_AUTO_BANDWIDTH = 768  # tangent columns (two 384 panels)
    _RCM_MAX_VARS = 200_000
    _RCM_MAX_EDGES = 4_000_000

    def _ordered_names(self, names_sorted, ordering: str):
        """Final variable layout order. ``name`` keeps the numeric-aware
        name sort (reference optimizer/mod.rs:530-538); ``rcm`` applies
        reverse Cuthill-McKee over the variable connectivity graph —
        the bandwidth-minimizing host-side permutation that makes the
        banded solver tier usable on graphs whose natural name order is
        not trajectory-like (the reference handles those via faer's
        fill-reducing sparse LLT, src/linalg/sparse/cholesky.rs:103-157);
        ``auto`` measures the name-order bandwidth and switches to RCM
        when it exceeds a panel threshold and RCM actually helps."""
        if ordering == "name" or len(names_sorted) < 3:
            return names_sorted
        if ordering not in ("rcm", "auto"):
            raise ValueError(f"unknown ordering {ordering!r}")
        id_of = {n: i for i, n in enumerate(names_sorted)}
        nv = len(names_sorted)
        if ordering == "auto" and nv > self._RCM_MAX_VARS:
            return names_sorted
        dof_arr = np.asarray(
            [get_manifold(self._manifold_of[n]).dof for n in names_sorted],
            dtype=np.int64,
        )
        er, ec = self._edge_arrays(id_of)
        if ordering == "auto" and er.size > self._RCM_MAX_EDGES:
            return names_sorted
        name_order = np.arange(nv)
        Wn = self._layout_bandwidth(name_order, dof_arr, er, ec)
        if ordering == "auto" and Wn <= self._RCM_AUTO_BANDWIDTH:
            return names_sorted
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        ones = np.ones(er.size, dtype=np.int8)
        A = sp.coo_matrix(
            (np.concatenate([ones, ones]),
             (np.concatenate([er, ec]), np.concatenate([ec, er]))),
            shape=(nv, nv),
        ).tocsr()
        perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True),
                          dtype=np.int64)
        Wr = self._layout_bandwidth(perm, dof_arr, er, ec)
        if ordering == "auto" and Wr >= Wn:
            return names_sorted
        return [names_sorted[i] for i in perm]

    def compile(self, initial_values: Optional[Dict[str, np.ndarray]] = None,
                dtype=None, ordering: str = "auto") -> "CompiledProblem":
        if dtype is None:
            from ..config import default_dtype

            dtype = default_dtype()
        values = dict(self._values)
        if initial_values:
            for k, v in initial_values.items():
                if k not in self._manifold_of:
                    raise KeyError(f"initial value for unknown variable {k!r}")
                values[k] = np.asarray(v, dtype=np.float64)
        missing = [n for n in self._manifold_of if n not in values]
        if missing:
            raise ValueError(f"no initial value for variables: {missing[:5]}...")

        # Sorted-name global tangent column layout (reference
        # optimizer/mod.rs:530-538 sorts variable names). The sort is
        # numeric-aware ("x2" < "x10") so trajectory naming keeps adjacent
        # poses in adjacent tangent columns — that ordering is what makes
        # pose-graph normal equations banded (linalg/banded.py). When the
        # name order is NOT banded, ``ordering`` can apply a reverse
        # Cuthill-McKee permutation to the column layout (pool rows stay
        # name-sorted; only tangent columns move).
        names_sorted = sorted(self._manifold_of, key=_natural_key)
        names_layout = self._ordered_names(names_sorted, ordering)
        col_of: Dict[str, int] = {}
        off = 0
        for n in names_layout:
            col_of[n] = off
            off += get_manifold(self._manifold_of[n]).dof
        total_dof = off

        # Pools per manifold name, rows in sorted-name order.
        pool_id_of_manifold: Dict[str, int] = {}
        pool_names: List[List[str]] = []
        for n in names_sorted:
            m = self._manifold_of[n]
            if m not in pool_id_of_manifold:
                pool_id_of_manifold[m] = len(pool_names)
                pool_names.append([])
            pool_names[pool_id_of_manifold[m]].append(n)

        var_loc: Dict[str, Tuple[int, int]] = {}
        pools: List[VarPool] = []
        host_free: Dict[int, np.ndarray] = {}  # never re-pull from device
        for m, pid in sorted(pool_id_of_manifold.items(), key=lambda kv: kv[1]):
            G = get_manifold(m)
            names = pool_names[pid]
            vals = np.stack([values[n] for n in names]).astype(dtype)
            free = np.ones((len(names), G.dof))
            lb = np.full((len(names), G.storage_dim), -np.inf)
            ub = np.full((len(names), G.storage_dim), np.inf)
            cols = np.array([col_of[n] for n in names], dtype=np.int32)
            for i, n in enumerate(names):
                var_loc[n] = (pid, i)
                if n in self._fixed:
                    idx = self._fixed[n]
                    if idx is None:
                        free[i, :] = 0.0
                    else:
                        for j in idx:
                            if j < G.dof:
                                free[i, j] = 0.0
                if n in self._bounds:
                    blo, bhi = self._bounds[n]
                    lb[i, : len(blo)] = blo
                    ub[i, : len(bhi)] = bhi
            host_free[pid] = free
            pools.append(
                VarPool(
                    manifold=G,
                    names=names,
                    values0=_to_device(vals, dtype),
                    free_mask=_to_device(free, dtype),
                    lower=_to_device(lb, dtype),
                    upper=_to_device(ub, dtype),
                    cols=_to_device(cols),
                )
            )

        # Group residual blocks by (factor signature, loss kind).
        grouped: Dict[tuple, List[Tuple[Tuple[str, ...], Factor, Optional[Loss]]]] = {}
        order: List[tuple] = []
        for blk in self._blocks:
            if blk is None:
                continue
            keys, factor, loss = blk
            lkind = loss.kind if loss is not None else "l2"
            sig = (factor.signature(), lkind)
            if sig not in grouped:
                grouped[sig] = []
                order.append(sig)
            grouped[sig].append(blk)

        groups: List[FactorGroup] = []

        all_host_cols: List[List[np.ndarray]] = []
        row_offset = 0
        for sig in order:
            blocks = grouped[sig]
            keys0, f0, loss0 = blocks[0]
            manifolds = tuple(get_manifold(m) for m in f0.var_manifolds())
            d = f0.residual_dim()
            count = len(blocks)
            lkind = sig[1]
            nparams = loss0.num_params if loss0 is not None else 0

            data_keys = sorted(f0.data().keys())
            data = {
                k: _to_device(
                    np.stack([np.asarray(b[1].data()[k]) for b in blocks]), dtype
                )
                for k in data_keys
            }
            loss_params = _to_device(
                np.stack(
                    [np.asarray(b[2].params if b[2] is not None else (), dtype=np.float64)
                     for b in blocks]
                ).reshape(count, nparams),
                dtype,
            )
            idx_arrays, col_arrays, pool_ids, mask_arrays = [], [], [], []
            host_cols = []
            for s in range(len(manifolds)):
                rows = np.array([var_loc[b[0][s]][1] for b in blocks], dtype=np.int32)
                pids = {var_loc[b[0][s]][0] for b in blocks}
                if len(pids) != 1:
                    raise AssertionError("slot spans multiple pools")
                cols_s = np.array([col_of[b[0][s]] for b in blocks], dtype=np.int32)
                pid = pids.pop()
                pool_ids.append(pid)
                idx_arrays.append(_to_device(rows))
                col_arrays.append(_to_device(cols_s))
                host_cols.append(cols_s)
                pool_free = host_free[pid]
                slot_free = pool_free[rows]
                mask_arrays.append(
                    None if np.all(slot_free == 1.0) else _to_device(slot_free, dtype)
                )

            kernel = f0.group_kernel() if hasattr(f0, "group_kernel") else type(f0).linearize
            groups.append(
                FactorGroup(
                    factor_cls=type(f0),
                    kernel=kernel,
                    manifolds=manifolds,
                    data=data,
                    loss_kind=lkind,
                    loss_params=loss_params,
                    pool_ids=tuple(pool_ids),
                    indices=tuple(idx_arrays),
                    cols=tuple(col_arrays),
                    free_masks=tuple(mask_arrays),
                    residual_dim=d,
                    row_offset=row_offset,
                    count=count,
                )
            )
            row_offset += d * count

            all_host_cols.append(host_cols)

        # Bulk-added factor batches become their own groups directly.
        for slot_keys, template, bdata, loss, loss_params, wts, count in self._bulk:
            manifolds = tuple(get_manifold(m) for m in template.var_manifolds())
            d = template.residual_dim()
            lkind = loss.kind if loss is not None else "l2"
            nparams = loss.num_params if loss is not None else 0
            if loss_params is None:
                lp = np.tile(
                    np.asarray(loss.params if loss is not None else (), dtype=np.float64),
                    (count, 1),
                ).reshape(count, nparams)
            else:
                lp = np.asarray(loss_params, dtype=np.float64).reshape(count, nparams)

            idx_arrays, col_arrays, pool_ids, mask_arrays = [], [], [], []
            host_cols = []
            for s in range(len(manifolds)):
                kind, names_s, base_idx = slot_keys[s]
                if kind == "indexed":
                    # resolve the (small) base-name list once, then gather
                    base_locs = np.asarray([var_loc[k] for k in names_s], dtype=np.int64)
                    base_cols = np.asarray([col_of[k] for k in names_s], dtype=np.int32)
                    pids = set(base_locs[:, 0].tolist())
                    rows = base_locs[base_idx, 1].astype(np.int32)
                    cols_s = base_cols[base_idx]
                else:
                    locs = [var_loc[k] for k in names_s]
                    pids = {p for p, _ in locs}
                    rows = np.asarray([r for _, r in locs], dtype=np.int32)
                    cols_s = np.asarray([col_of[k] for k in names_s], dtype=np.int32)
                if len(pids) != 1:
                    raise AssertionError("slot spans multiple pools")
                pid = pids.pop()
                pool_ids.append(pid)
                idx_arrays.append(_to_device(rows))
                col_arrays.append(_to_device(cols_s))
                host_cols.append(cols_s)
                pool_free = host_free[pid]
                slot_free = pool_free[rows]
                mask_arrays.append(
                    None if np.all(slot_free == 1.0) else _to_device(slot_free, dtype)
                )

            kernel = (
                template.group_kernel()
                if hasattr(template, "group_kernel")
                else type(template).linearize
            )
            groups.append(
                FactorGroup(
                    factor_cls=type(template),
                    kernel=kernel,
                    manifolds=manifolds,
                    data={k: _to_device(v, dtype) for k, v in bdata.items()},
                    loss_kind=lkind,
                    loss_params=_to_device(lp, dtype),
                    pool_ids=tuple(pool_ids),
                    indices=tuple(idx_arrays),
                    cols=tuple(col_arrays),
                    free_masks=tuple(mask_arrays),
                    weights=None if wts is None else _to_device(wts, dtype),
                    residual_dim=d,
                    row_offset=row_offset,
                    count=count,
                )
            )
            row_offset += d * count
            all_host_cols.append(host_cols)

        cp = CompiledProblem(
            pools=pools,
            groups=groups,
            var_loc=var_loc,
            total_dof=total_dof,
            total_residual_dim=row_offset,
            dtype=dtype,
        )
        # Host-side copies of index arrays: structure analysis (Schur
        # classification, banded plans) must never pull device arrays back
        # through the remote-TPU tunnel (~43 s per venice-scale array).
        cp.host_group_cols = all_host_cols
        cp.host_pool_cols = {pid: np.array([col_of[n] for n in pool.names],
                                           dtype=np.int32)
                             for pid, pool in enumerate(pools)}
        return cp


class CompiledProblem:
    """Frozen, jit-friendly factor graph. All methods are pure in ``values``
    (a tuple of pool arrays) and safe to call under jit/vmap/shard_map."""

    def __init__(self, pools, groups, var_loc, total_dof, total_residual_dim, dtype):
        self.pools: List[VarPool] = pools
        self.groups: List[FactorGroup] = groups
        self.var_loc: Dict[str, Tuple[int, int]] = var_loc
        self.total_dof = total_dof
        self.total_residual_dim = total_residual_dim
        self.dtype = dtype

    # -- state helpers -----------------------------------------------------

    def initial_values(self) -> Tuple[jnp.ndarray, ...]:
        return tuple(p.values0 for p in self.pools)

    def values_dict(self, values) -> Dict[str, np.ndarray]:
        out = {}
        for p, arr in zip(self.pools, values):
            arr = np.asarray(arr)
            for i, n in enumerate(p.names):
                out[n] = arr[i]
        return out

    def get_value(self, values, name: str) -> jnp.ndarray:
        pid, row = self.var_loc[name]
        return values[pid][row]

    # -- linearization -----------------------------------------------------

    def _gather(self, values, group: FactorGroup):
        return [values[pid][idx] for pid, idx in zip(group.pool_ids, group.indices)]

    def group_linearize(self, values, group: FactorGroup, compute_jacobian: bool):
        """Fused kernel: gather -> factor residual(+J) -> corrector."""
        params = self._gather(values, group)
        r, jacs = group.kernel(group.manifolds, group.data, params, compute_jacobian)
        if group.weights is not None:
            r = r * group.weights[:, None]
            if compute_jacobian:
                jacs = [j * group.weights[:, None, None] for j in jacs]
        if compute_jacobian and any(m is not None for m in group.free_masks):
            jacs = [
                j if m is None else j * m[:, None, :]
                for j, m in zip(jacs, group.free_masks)
            ]
        if group.loss_kind == "l2":
            return r, jacs
        if compute_jacobian:
            J = jnp.concatenate(jacs, axis=-1)  # [K, d, sum dof]
            r_t, J_t = correct(group.loss_kind, group.loss_params, r, J)
            splits = np.cumsum([G.dof for G in group.manifolds])[:-1]
            return r_t, [j for j in jnp.split(J_t, splits, axis=-1)]
        r_t, _ = correct(group.loss_kind, group.loss_params, r, None)
        return r_t, None

    def residual_vector(self, values) -> jnp.ndarray:
        """Stacked (corrected) residual vector, group-major layout. Mirrors
        compute_residual_sparse (problem.rs:864-899) incl. loss application
        (problem.rs:1003-1007)."""
        parts = []
        for g in self.groups:
            r, _ = self.group_linearize(values, g, False)
            parts.append(r.reshape(-1))
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), dtype=self.dtype)

    def cost(self, values) -> jnp.ndarray:
        """cost = 0.5 * ||r||^2 (reference optimizer/mod.rs:358-361)."""
        total = jnp.zeros((), dtype=self.dtype)
        for g in self.groups:
            r, _ = self.group_linearize(values, g, False)
            total = total + 0.5 * jnp.sum(r * r)
        return total

    def scatter_normal(self, H, gvec, cost, group: FactorGroup, r, jacs):
        """Accumulate one linearized group into (H, g, cost) via dense
        scatter-add of the small per-factor blocks."""
        cost = cost + 0.5 * jnp.sum(r * r)
        nslots = len(group.manifolds)
        for s in range(nslots):
            Js = jacs[s]
            dof_s = group.manifolds[s].dof
            cs = group.cols[s]
            gs = _es("kdi,kd->ki", Js, r)
            gcols = cs[:, None] + jnp.arange(dof_s, dtype=cs.dtype)[None, :]
            gvec = gvec.at[gcols].add(gs)
            for t in range(nslots):
                Jt = jacs[t]
                dof_t = group.manifolds[t].dof
                ct = group.cols[t]
                Hst = _es("kdi,kdj->kij", Js, Jt)
                rows = (cs[:, None] + jnp.arange(dof_s, dtype=cs.dtype)[None, :])[
                    :, :, None
                ]
                colsj = (ct[:, None] + jnp.arange(dof_t, dtype=ct.dtype)[None, :])[
                    :, None, :
                ]
                rows = jnp.broadcast_to(rows, Hst.shape)
                colsj = jnp.broadcast_to(colsj, Hst.shape)
                H = H.at[rows, colsj].add(Hst)
        return H, gvec, cost

    def assemble_normal(self, values):
        """Build the Gauss-Newton normal equations directly:
        H = J^T J (dense [D, D]), g = J^T r, plus cost — without
        materializing the global J (SURVEY.md §7: build Hessian blocks via
        scatter-add)."""
        D = self.total_dof
        H = jnp.zeros((D, D), dtype=self.dtype)
        gvec = jnp.zeros((D,), dtype=self.dtype)
        cost = jnp.zeros((), dtype=self.dtype)
        for g in self.groups:
            r, jacs = self.group_linearize(values, g, True)
            H, gvec, cost = self.scatter_normal(H, gvec, cost, g, r, jacs)
        return H, gvec, cost

    def assemble_dense_jacobian(self, values):
        """Materialize the stacked dense (r, J) — the reference's dense
        assembly path (src/linearizer/cpu/dense.rs), for QR-type solvers on
        small problems."""
        R, D = self.total_residual_dim, self.total_dof
        Jd = jnp.zeros((R, D), dtype=self.dtype)
        rv = jnp.zeros((R,), dtype=self.dtype)
        for g in self.groups:
            r, jacs = self.group_linearize(values, g, True)
            d = g.residual_dim
            k = g.count
            rowbase = g.row_offset + jnp.arange(k, dtype=jnp.int32) * d
            rows = rowbase[:, None] + jnp.arange(d, dtype=jnp.int32)[None, :]
            rv = rv.at[rows.reshape(-1)].set(r.reshape(-1))
            for s, Js in enumerate(jacs):
                dof_s = g.manifolds[s].dof
                cs = g.cols[s]
                ccols = (cs[:, None] + jnp.arange(dof_s, dtype=cs.dtype)[None, :])[
                    :, None, :
                ]
                rrows = rows[:, :, None]
                rrows = jnp.broadcast_to(rrows, Js.shape)
                ccols = jnp.broadcast_to(ccols, Js.shape)
                Jd = Jd.at[rrows, ccols].add(Js)
        return rv, Jd

    # -- state update ------------------------------------------------------

    def apply_step(self, values, dx):
        """Manifold ⊞ per variable with fixed-DOF masking (reference
        problem.rs:185-289 zeroes fixed DOF of the step) and bounds clamp."""
        new_values = []
        for p, arr in zip(self.pools, values):
            G = p.manifold
            steps = dx[p.cols[:, None] + jnp.arange(G.dof, dtype=p.cols.dtype)[None, :]]
            steps = steps * p.free_mask
            new = G.normalize(G.plus(arr, steps))
            new = jnp.clip(new, p.lower, p.upper)
            new_values.append(new)
        return tuple(new_values)

    def parameter_norm(self, values) -> jnp.ndarray:
        """sqrt(sum of squared storage vectors) — reference
        optimizer/mod.rs:458-468."""
        total = jnp.zeros((), dtype=self.dtype)
        for arr in values:
            total = total + jnp.sum(arr * arr)
        return jnp.sqrt(total)

    def normal_diag_max(self, values) -> jnp.ndarray:
        """max_i (J^T J)_{ii} without assembling H — one linearization.
        Used by the Madsen-Nielsen adaptive initial damping
        (lambda_0 = tau * max diag; Methods for Non-Linear Least Squares
        Problems, alg. 3.16). The reference hardcodes lambda_0 = 1e-3
        (lm.rs:319-359); on well-initialized pose graphs that wastes
        several LM iterations just ramping the damping down."""
        diag = jnp.zeros((self.total_dof,), dtype=self.dtype)
        for g in self.groups:
            _, jacs = self.group_linearize(values, g, True)
            for s in range(len(g.manifolds)):
                dof = g.manifolds[s].dof
                sq = jnp.sum(jacs[s] * jacs[s], axis=1)  # [K, dof]
                cols = g.cols[s][:, None] + jnp.arange(dof, dtype=g.cols[s].dtype)
                diag = diag.at[cols].add(sq)
        return jnp.max(diag)

    # -- debugging -----------------------------------------------------------

    def dump_debug(self, directory, values, with_jacobian: bool = False):
        """Write residuals / variables (and optionally the dense Jacobian)
        as text files for offline inspection — the reference's debug dumps
        (problem.rs:1027-1084)."""
        import os

        os.makedirs(directory, exist_ok=True)
        r = np.asarray(self.residual_vector(values))
        np.savetxt(os.path.join(directory, "residuals.txt"), r)
        with open(os.path.join(directory, "variables.txt"), "w") as f:
            for name, v in sorted(self.values_dict(values).items()):
                f.write(f"{name} {' '.join(f'{x:.17e}' for x in np.asarray(v))}\n")
        if with_jacobian:
            _, J = self.assemble_dense_jacobian(values)
            np.savetxt(os.path.join(directory, "jacobian.txt"), np.asarray(J))
