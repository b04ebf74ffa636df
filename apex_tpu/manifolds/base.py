"""Lie-group abstraction for apex-tpu.

Design (vs. the Rust reference, apex-manifolds/src/lib.rs:144-540):
the reference exposes a ``LieGroup`` trait with &mut-out-parameter Jacobians;
here each group is a :class:`LieGroup` record of **pure functions over
arrays**. Every function broadcasts over leading batch dimensions and is
``vmap``/``jit``/``grad``-safe, so batched factor linearization is just
function composition — no trait objects, no dynamic dispatch.

Conventions follow manif (and the reference):
- right-perturbation by default: ``plus(X, t) = X ∘ Exp(t)``,
  ``minus(X, Y) = Log(Y⁻¹ ∘ X)``
- quaternions are w-first Hamilton
- Jacobians are with respect to right perturbations on the tangent space.

Derived operations (plus/minus/between and their Jacobians) are implemented
once, generically, from the group primitives — mirroring the default trait
methods in the reference (lib.rs:374-436):

    J_{g⁻¹}_g           = -Ad(g)
    J_{g1∘g2}_{g1}      = Ad(g2⁻¹),   J_{g1∘g2}_{g2} = I
    J_{Log(g)}_g        = Jr⁻¹(Log(g))
    J_{Exp(t)}_t        = Jr(t)
    between(a,b) = a⁻¹∘b; J_a = -Ad(b⁻¹a) = -Ad(between⁻¹), J_b = I

Groups without hand-written tangent Jacobians fall back to forward-mode
autodiff constructions which are exact (not finite differences).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LieGroup:
    """A Lie group as a bundle of pure array functions.

    Storage layout per group matches the reference's DVector parameter format
    (src/factors/between_factor.rs:183-196):
      SO2: [theta] (1,)          SE2: [x, y, theta] (3,)
      SO3: [qw, qx, qy, qz] (4,) SE3: [tx,ty,tz, qw,qx,qy,qz] (7,)
      SE23: [t(3), q(4), v(3)] (10,)   Sim3: [t(3), q(4), s] (8,)
      SGal3: [t(3), q(4), v(3), s] (11,)   Rn: raw vector (n,)
    """

    name: str
    dof: int
    storage_dim: int

    identity: Callable  # () -> (S,)
    inverse: Callable  # (..., S) -> (..., S)
    compose: Callable  # (..., S), (..., S) -> (..., S)
    exp: Callable  # (..., D) -> (..., S)
    log: Callable  # (..., S) -> (..., D)
    adjoint: Callable  # (..., S) -> (..., D, D)
    normalize: Callable  # (..., S) -> (..., S)

    # Group action on points (SO3/SE3-family act on R^3; SE2/SO2 on R^2; Rn add).
    act: Optional[Callable] = None  # (..., S), (..., P) -> (..., P)

    # Tangent-space Jacobians. If None, autodiff fallbacks are installed.
    rjac: Optional[Callable] = None  # (..., D) -> (..., D, D)
    ljac: Optional[Callable] = None
    rjac_inv: Optional[Callable] = None
    ljac_inv: Optional[Callable] = None

    # Optional fused/overridden ops.
    hat: Optional[Callable] = None  # (..., D) -> matrix Lie algebra element
    random: Optional[Callable] = None  # (key,) -> (S,)
    is_valid: Optional[Callable] = None  # (..., S), tol -> bool (...,)
    interpolate: Optional[Callable] = None  # (X, Y, alpha) -> (..., S)

    # ------------------------------------------------------------------
    # Derived group ops (generic, mirror manif default implementations)
    # ------------------------------------------------------------------

    def inverse_j(self, x):
        """g⁻¹ with Jacobian J = -Ad(g)."""
        return self.inverse(x), -self.adjoint(x)

    def compose_j(self, a, b):
        """a∘b with J_a = Ad(b⁻¹), J_b = I."""
        c = self.compose(a, b)
        ja = self.adjoint(self.inverse(b))
        jb = _batched_eye(self.dof, a)
        return c, ja, jb

    def log_j(self, x):
        """Log(x) with J = Jr⁻¹(Log(x))."""
        t = self.log(x)
        return t, self.rjac_inv(t)

    def exp_j(self, t):
        """Exp(t) with J = Jr(t)."""
        return self.exp(t), self.rjac(t)

    def between(self, a, b):
        return self.compose(self.inverse(a), b)

    def between_j(self, a, b):
        """a⁻¹∘b with J_a = -Ad((a⁻¹b)⁻¹), J_b = I (reference lib.rs:401-435)."""
        r = self.between(a, b)
        ja = -self.adjoint(self.inverse(r))
        jb = _batched_eye(self.dof, a)
        return r, ja, jb

    def plus(self, x, t):
        """Right plus: x ∘ Exp(t)."""
        return self.compose(x, self.exp(t))

    def plus_j(self, x, t):
        """J_x = Ad(Exp(t)⁻¹), J_t = Jr(t) (manif eq. 148: J_x = R(t)ᵀ form)."""
        e = self.exp(t)
        out = self.compose(x, e)
        jx = self.adjoint(self.inverse(e))
        jt = self.rjac(t)
        return out, jx, jt

    def minus(self, x, y):
        """Right minus: Log(y⁻¹ ∘ x)."""
        return self.log(self.compose(self.inverse(y), x))

    def minus_j(self, x, y):
        """J_x = Jr⁻¹(d), J_y = -Jl⁻¹(d) with d = x ⊟ y (manif eq. 149)."""
        d = self.minus(x, y)
        return d, self.rjac_inv(d), -self.ljac_inv(d)

    # Convenience
    def random_batch(self, key, n):
        keys = jax.random.split(key, n)
        return jax.vmap(self.random)(keys)

    def identity_like(self, batch_shape=(), dtype=None):
        e = self.identity()
        if dtype is not None:
            e = e.astype(dtype)
        return jnp.broadcast_to(e, tuple(batch_shape) + e.shape)


def _batched_eye(d, like):
    eye = jnp.eye(d, dtype=like.dtype)
    return jnp.broadcast_to(eye, like.shape[:-1] + (d, d))


def with_autodiff_jacobians(g: LieGroup) -> LieGroup:
    """Fill in missing tangent Jacobians using exact forward-mode autodiff.

    Jr(t)  = d/dd Log(Exp(t)⁻¹ ∘ Exp(t+d)) |_{d=0}
    Jl(t)  = d/dd Log(Exp(t+d) ∘ Exp(t)⁻¹) |_{d=0}
    Jr⁻¹/Jl⁻¹ by linear solve against the forward Jacobians.

    Exact but more expensive than closed forms; exotic groups start here and
    are replaced with closed forms as they get hot.
    """
    updates = {}

    if g.rjac is None:
        updates["rjac"] = _jac_over_batch(g, mode="r")
    if g.ljac is None:
        updates["ljac"] = _jac_over_batch(g, mode="l")
    if g.rjac_inv is None:
        base = updates.get("rjac", g.rjac)
        updates["rjac_inv"] = _inv_of(base)
    if g.ljac_inv is None:
        base = updates.get("ljac", g.ljac)
        updates["ljac_inv"] = _inv_of(base)

    return dataclasses.replace(g, **updates) if updates else g


def _jac_over_batch(g: LieGroup, mode: str):
    def single(t):
        if mode == "r":

            def f(d):
                return g.log(g.compose(g.inverse(g.exp(t)), g.exp(t + d)))

        else:

            def f(d):
                return g.log(g.compose(g.exp(t + d), g.inverse(g.exp(t))))

        return jax.jacfwd(f)(jnp.zeros_like(t))

    def batched(t):
        flat = t.reshape((-1, t.shape[-1]))
        out = jax.vmap(single)(flat)
        return out.reshape(t.shape[:-1] + (t.shape[-1], t.shape[-1]))

    return batched


def _inv_of(jac_fn):
    def inv(t):
        return jnp.linalg.inv(jac_fn(t))

    return inv
