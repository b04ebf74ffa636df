"""Banded (block-tridiagonal) QR for pose-graph normal equations.

Reference parity target: SparseQRSolver (src/linalg/sparse/qr.rs:13-262)
QR-factorizes the sparse *normal equations* H (not the stacked Jacobian)
with a cached symbolic structure — the rank-robust alternative to the
Cholesky tier, same ``LinearSolver`` interface. On TPU the sparse
Householder DAG is the wrong shape for the MXU; but after RCM ordering
(core/problem.py) H is block-tridiagonal in bandwidth-sized panels, and
banded QR is a classic sequential panel sweep that maps onto a
``lax.scan`` of small dense ops:

    step i:  [A_i; C_{i+1}]            = Q_i [R_ii; 0]      (complete QR)
             [R_{i,i+1}; A_{i+1}]      = Q_i^T [B_i; D_{i+1}]
             [R_{i,i+2}; B_{i+1}]      = Q_i^T [0;  C_{i+2}^T]
             [c_i;       b_{i+1}']     = Q_i^T [b_i; b_{i+1}]

where A/B carry the working diagonal / superdiagonal block. The R factor
of a block-tridiagonal matrix has exactly two block superdiagonals (the
rotation at step i fills column i+2 of row i and nothing beyond), so the
back-substitution is a reverse scan carrying (x_{i+1}, x_{i+2}):

    x_i = R_ii^{-1} (c_i - R_{i,i+1} x_{i+1} - R_{i,i+2} x_{i+2})

Memory is O(n m^2) like the Cholesky tier (never the dense [D, D] H), and
LM damping adds lambda*I to the diagonal blocks only — the reference's
"pattern unchanged under augmentation" symbolic-reuse argument
(qr.rs:17-22) holds structurally here: the scan program is identical for
every lambda, so one compiled executable serves the whole LM run.

QR solves (H + lambda I) dx = b without squaring the system a second
time, so it tolerates a singular H whenever lambda > 0 and degrades
gracefully (escalating-shift retry, same ladder as the CR core) at
lambda = 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .banded import _bmt, _mm


def make_blocktri_qr_core(D: int, m: int, dtype, base_reg: float = 1e-10,
                          stages: int = 5):
    """Core banded-QR solve on block-tridiagonal storage: returns
    solve_blocks(Dg [n,m,m], Cg [n,m,m] (Cg[i] = A[i, i-1], Cg[0] zero),
    b [n,m], damping) -> x [n*m] solving (A + damping I) x = b.

    Drop-in for make_blocktri_cr_core (same contract/attributes); used by
    linear_solver_type="sparse_qr" when the problem is band-shaped.
    """
    n = -(-D // m)
    Dp = n * m
    eye = jnp.eye(m, dtype=dtype)[None]

    def qr_once(Dgs, Cg, bv):
        if n == 1:
            q, r = jnp.linalg.qr(Dgs[0], mode="complete")
            y = _mm(_bmt(q), bv[0][:, None])
            x = jax.lax.linalg.triangular_solve(
                r, y, left_side=True, lower=False)
            return x[:, 0].reshape(-1)

        zmm = jnp.zeros((1, m, m), dtype)
        zm = jnp.zeros((m, m), dtype)
        # xs for step i (i = 0..n-1): blocks of rows i+1 / i+2 entering the
        # working window, padded past the end with [eye | 0].
        C1 = jnp.concatenate([Cg[1:], zmm])                  # H[i+1, i]
        Dn = jnp.concatenate([Dgs[1:], eye])                 # H[i+1, i+1]
        C2T = jnp.concatenate([_bmt(Cg[2:]), zmm, zmm])      # H[i+1, i+2]
        bn = jnp.concatenate([bv[1:], jnp.zeros((1, m), dtype)])

        def fwd(carry, xs):
            A, B, bi = carry
            c1, dn, c2t, bnx = xs
            q, r = jnp.linalg.qr(jnp.concatenate([A, c1], axis=0),
                                 mode="complete")            # q [2m,2m]
            qt = _bmt(q)
            col1 = _mm(qt, jnp.concatenate([B, dn], axis=0))
            col2 = _mm(qt, jnp.concatenate([zm, c2t], axis=0))
            rhs = _mm(qt, jnp.concatenate([bi, bnx], axis=0)[:, None])[:, 0]
            out = (r[:m], col1[:m], col2[:m], rhs[:m])
            return (col1[m:], col2[m:], rhs[m:]), out

        carry0 = (Dgs[0], _bmt(Cg[1]), bv[0])
        _, (Rii, R1, R2, c) = jax.lax.scan(fwd, carry0, (C1, Dn, C2T, bn))

        def bwd(carry, ops):
            x1, x2 = carry
            rii, r1, r2, ci = ops
            rhs = ci - _mm(r1, x1[:, None])[:, 0] - _mm(r2, x2[:, None])[:, 0]
            xi = jax.lax.linalg.triangular_solve(
                rii, rhs[:, None], left_side=True, lower=False)[:, 0]
            return (xi, x1), xi

        z = jnp.zeros((m,), dtype)
        _, xs = jax.lax.scan(bwd, (z, z), (Rii, R1, R2, c), reverse=True)
        return xs.reshape(-1)

    def solve_blocks(Dg0, Cg, bp, damping=None):
        damp = jnp.asarray(0.0 if damping is None else damping, dtype)
        diag = Dg0.reshape(n, -1)[:, :: m + 1]
        trace_d = jnp.sum(diag) / D + damp

        def attempt(shift):
            return qr_once(Dg0 + shift * eye, Cg, bp)

        dx = attempt(damp)

        def body(carry):
            dx, reg, stage = carry
            reg = jnp.where(stage == 0, base_reg * trace_d, reg * 100.0)
            return attempt(damp + reg), reg, stage + 1

        def cond(carry):
            dx, reg, stage = carry
            return jnp.logical_and(~jnp.all(jnp.isfinite(dx)), stage < stages)

        dx, _, _ = jax.lax.while_loop(
            cond, body, (dx, jnp.zeros((), dtype), jnp.zeros((), jnp.int32))
        )
        return dx

    solve_blocks.block = m
    solve_blocks.n_blocks = n
    return solve_blocks
