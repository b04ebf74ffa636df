"""Matrix-free block-preconditioned CG on the Gauss-Newton normal equations.

The reference's scaling answer for pose graphs is faer's sparse LLT; the
TPU-native analogue avoids materializing H entirely: per LM iteration the
factor-group Jacobian blocks [K, d, dof_s] are linearized once and kept
batched, and every CG iteration computes

    H x = sum_k  P_k^T J_k^T (J_k P_k x)   (+ damping * x)

as gathers + batched small matmuls + scatter-adds — O(K) memory instead of
O(D^2), so city10000/torus3D-class graphs fit regardless of DOF count.

Preconditioner: per-variable block diagonal of H (6x6/3x3 blocks via
segment accumulation, batched closed-form inversion).

Select with linear_solver_type="pcg" on any optimizer config.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from .smallmm import es as _es, vdot as _vdot

from ..core.problem import CompiledProblem


class IterativeNormalSolver:
    """Precomputed structure for the matrix-free normal-equation solve."""

    def __init__(self, cp: CompiledProblem, max_iterations: int = 500,
                 tolerance: float = 1e-10):
        self.cp = cp
        self.max_iterations = max_iterations
        self.tolerance = tolerance
        # per-pool (bases [Nv] global col, dof) for the block preconditioner
        self.pools_meta = []
        for pool in cp.pools:
            self.pools_meta.append((pool.cols, pool.manifold.dof))

    # ------------------------------------------------------------------

    def _linearize_all(self, values):
        """One linearization pass: per-group (r, [J_s]) plus cost and g."""
        cp = self.cp
        D = cp.total_dof
        g = jnp.zeros((D,), dtype=cp.dtype)
        cost = jnp.zeros((), dtype=cp.dtype)
        blocks: List[Tuple] = []
        for grp in cp.groups:
            r, jacs = cp.group_linearize(values, grp, True)
            cost = cost + 0.5 * jnp.sum(r * r)
            for s, Js in enumerate(jacs):
                ds = grp.manifolds[s].dof
                cols = grp.cols[s][:, None] + jnp.arange(ds, dtype=grp.cols[s].dtype)
                g = g.at[cols].add(_es("kdi,kd->ki", Js, r))
            blocks.append((grp, jacs))
        return blocks, g, cost

    def _hx(self, blocks, x, damping):
        """H x + damping x via factor-level products."""
        cp = self.cp
        y = damping * x
        for grp, jacs in blocks:
            # v_k = sum_s J_s x_s   [K, d]
            v = None
            xs = []
            for s, Js in enumerate(jacs):
                ds = grp.manifolds[s].dof
                cols = grp.cols[s][:, None] + jnp.arange(ds, dtype=grp.cols[s].dtype)
                xk = x[cols]
                xs.append((cols, xk))
                term = _es("kdi,ki->kd", Js, xk)
                v = term if v is None else v + term
            for s, Js in enumerate(jacs):
                cols, _ = xs[s]
                y = y.at[cols].add(_es("kdi,kd->ki", Js, v))
        return y

    def _block_diag_inv(self, blocks, damping):
        """Per-variable diagonal blocks of H + damping I, inverted."""
        cp = self.cp
        pool_acc = []
        for pool in cp.pools:
            d = pool.manifold.dof
            n = len(pool.names)
            pool_acc.append(
                damping * jnp.broadcast_to(jnp.eye(d, dtype=cp.dtype), (n, d, d))
            )
        for grp, jacs in blocks:
            for s, Js in enumerate(jacs):
                pid = grp.pool_ids[s]
                Hss = _es("kdi,kdj->kij", Js, Js)
                pool_acc[pid] = pool_acc[pid].at[grp.indices[s]].add(Hss)
        from .utils import spd_clamped_inv

        return [spd_clamped_inv(acc) for acc in pool_acc]

    def _apply_prec(self, inv_blocks, x):
        cp = self.cp
        y = jnp.zeros_like(x)
        for (cols_base, d), inv in zip(self.pools_meta, inv_blocks):
            cols = cols_base[:, None] + jnp.arange(d, dtype=cols_base.dtype)
            y = y.at[cols].add(_es("kij,kj->ki", inv, x[cols]))
        return y

    # ------------------------------------------------------------------

    def solve(self, values, damping):
        """One damped solve: returns (dx, g, cost)."""
        blocks, g, cost = self._linearize_all(values)
        inv_blocks = self._block_diag_inv(blocks, damping)
        b = -g
        tol2 = self.tolerance**2 * _vdot(b, b)

        def apply_S(x):
            return self._hx(blocks, x, damping)

        def cond(state):
            x, r, z, p, rz, it = state
            return (_vdot(r, r) > tol2) & (it < self.max_iterations)

        def body(state):
            x, r, z, p, rz, it = state
            Sp = apply_S(p)
            denom = _vdot(p, Sp)
            alpha = rz / jnp.where(denom == 0, 1.0, denom)
            x = x + alpha * p
            r = r - alpha * Sp
            z = self._apply_prec(inv_blocks, r)
            rz_new = _vdot(r, z)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            return (x, r, z, p * beta + z, rz_new, it + 1)

        x0 = jnp.zeros_like(b)
        z0 = self._apply_prec(inv_blocks, b)
        state = (x0, b, z0, z0, _vdot(b, z0), jnp.asarray(0, jnp.int32))
        x, *_ = jax.lax.while_loop(cond, body, state)
        return x, g, cost
