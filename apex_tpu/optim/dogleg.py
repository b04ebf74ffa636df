"""Powell Dog Leg with Ceres enhancements.

Mirrors the reference (src/optimizer/dog_leg.rs):
- Cauchy point alpha = ||g||^2 / (g^T H g) (:776-803)
- 3-case step: GN inside TR / boundary-scaled steepest descent /
  interpolated with the cancellation-robust beta (Ceres formulas, :818-902)
- predicted reduction -step^T g - 0.5 step^T H step (:986-1000)
- acceptance rho > 1e-4; Ceres TR update: good (rho > 0.75) ->
  radius = max(radius, 3 ||step||), mu decreases; poor (rho < 0.25) ->
  radius *= 0.5, enable step reuse (:905-945)
- adaptive mu regularization of the GN solve (initial 1e-4, :1020-1040)
- step-reuse cache on rejection, max 5 reuses (:963-1017). Deviation from
  the reference: we only reuse when the step was actually rejected
  (parameters unmoved) — the reference can reuse a stale cache after an
  accepted-but-poor step.

Dense solver paths only for now (the reference's BA preset uses LM+Schur).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.problem import CompiledProblem
from ..linalg import dense as dense_linalg
from .common import ConvergenceConfig, check_convergence, compute_step_quality
from .lm import LevenbergMarquardt, LevenbergMarquardtConfig, _tree_where


@dataclasses.dataclass
class DogLegConfig:
    linear_solver_type: str = "dense_cholesky"
    max_iterations: int = 50
    cost_tolerance: float = 1e-6
    parameter_tolerance: float = 1e-8
    gradient_tolerance: float = 1e-10
    timeout: Optional[float] = None
    min_cost_threshold: Optional[float] = None
    trust_region_radius: float = 1e4
    trust_region_min: float = 1e-12
    trust_region_max: float = 1e12
    trust_region_decrease_factor: float = 0.5
    good_step_quality: float = 0.75
    poor_step_quality: float = 0.25
    initial_mu: float = 1e-4
    min_mu: float = 1e-12
    max_mu: float = 1e8
    mu_increase_factor: float = 10.0
    enable_step_reuse: bool = True
    compute_covariances: bool = False
    mode: str = "python"
    collect_stats: bool = False
    verbose: bool = False

    def convergence(self) -> ConvergenceConfig:
        return ConvergenceConfig(
            max_iterations=self.max_iterations,
            cost_tolerance=self.cost_tolerance,
            parameter_tolerance=self.parameter_tolerance,
            gradient_tolerance=self.gradient_tolerance,
            timeout=self.timeout,
            min_cost_threshold=self.min_cost_threshold,
            min_trust_region_radius=self.trust_region_min,
        )


def _dogleg_step(g, dx_gn, cauchy, delta):
    """3-case dog-leg step on precomputed pieces; all branches evaluated,
    selected with where (scalar conditions)."""
    gn_norm = jnp.linalg.norm(dx_gn)
    c_norm = jnp.linalg.norm(cauchy)
    g_norm = jnp.linalg.norm(g)

    # Case 2: boundary-scaled steepest descent
    safe_g = jnp.where(g_norm == 0, 1.0, g_norm)
    sd_step = -(delta / safe_g) * g

    # Case 3: interpolation with Ceres' cancellation-robust beta
    v = dx_gn - cauchy
    a = jnp.sum(v * v)
    b = jnp.sum(cauchy * v)
    c = c_norm * c_norm - delta * delta
    d2 = b * b - a * c
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    safe_a = jnp.where(jnp.abs(a) < 1e-15, 1.0, a)
    safe_bd = jnp.where(b + d == 0, 1.0, b + d)
    beta = jnp.where(
        (d2 < 0.0) | (jnp.abs(a) < 1e-15),
        1.0,
        jnp.where(b <= 0.0, (-b + d) / safe_a, -c / safe_bd),
    )
    beta = jnp.clip(beta, 0.0, 1.0)
    dl_step = cauchy + beta * v

    step = jnp.where(
        gn_norm <= delta,
        dx_gn,
        jnp.where(c_norm >= delta, sd_step, dl_step),
    )
    return step


class DogLeg(LevenbergMarquardt):
    def __init__(self, config: Optional[DogLegConfig] = None):
        self.dl_config = config or DogLegConfig()
        cfg = self.dl_config
        lm_cfg = LevenbergMarquardtConfig(
            linear_solver_type=cfg.linear_solver_type,
            max_iterations=cfg.max_iterations,
            cost_tolerance=cfg.cost_tolerance,
            parameter_tolerance=cfg.parameter_tolerance,
            gradient_tolerance=cfg.gradient_tolerance,
            timeout=cfg.timeout,
            min_cost_threshold=cfg.min_cost_threshold,
            compute_covariances=cfg.compute_covariances,
            mode=cfg.mode,
            collect_stats=cfg.collect_stats,
            verbose=cfg.verbose,
        )
        super().__init__(lm_cfg)

    def _make_step_fn(self, cp: CompiledProblem):
        dl = self.dl_config
        ccfg = dl.convergence()
        solver_type = {"sparse_cholesky": "banded_cholesky",
                       "sparse_qr": "banded_qr"}.get(
            dl.linear_solver_type, dl.linear_solver_type
        )
        if solver_type in ("schur_explicit", "schur_implicit", "schur",
                           "schur_auto", "sparse_schur_complement",
                           "iterative_schur"):
            # The reference DogLeg routes every Schur config to its
            # SparseCholeskySolver instead of erroring
            # (dog_leg.rs:1379-1390); mirror that: banded tier, dense
            # Cholesky when the pattern is panel-hostile (BA problems,
            # where landmark-camera coupling makes the band the whole
            # matrix — same guard the LM banded_qr path uses).
            from ..linalg import banded as _banded

            solver_type = ("banded_cholesky"
                           if _banded.block_bandwidth(cp) <= 1536
                           else "dense_cholesky")
        if solver_type not in ("dense_cholesky", "dense_qr",
                               "banded_cholesky", "banded_qr"):
            raise NotImplementedError(
                "DogLeg supports dense_cholesky / dense_qr / "
                "sparse_cholesky (banded) / sparse_qr (banded); Schur "
                "types fall back to Cholesky like the reference"
            )

        # Hessian representation: dense [D, D], or block-tridiagonal
        # (Dg, Cg) panels from the banded assembler (linalg/banded.py) —
        # same storage the LM banded path uses; carried through the trust-
        # region cache so rejected steps reuse the factorizable form.
        if solver_type in ("banded_cholesky", "banded_qr"):
            from ..linalg import banded

            asm = banded.BandedNormalAssembler(cp)
            if solver_type == "banded_qr":
                from ..linalg.banded_qr import make_blocktri_qr_core

                core = make_blocktri_qr_core(cp.total_dof, asm.m, cp.dtype)
            else:
                core = banded.make_blocktri_cr_core(cp.total_dof, asm.m,
                                                    cp.dtype)
            D_, m_, n_, Dp_ = asm.D, asm.m, asm.n, asm.Dp

            def assemble(values):
                Dg, Cg, g, cost = asm.assemble(values)
                return dict(Dg=asm.pad_diag_ones(Dg), Cg=Cg), g, cost

            def hsolve(rep, g, mu):
                bp = jnp.pad(-g, (0, Dp_ - D_)).reshape(n_, m_)
                return core(rep["Dg"], rep["Cg"], bp, mu)[:D_]

            def hmatvec(rep, v):
                xb = jnp.pad(v, (0, Dp_ - D_)).reshape(n_, m_)
                Dg, Cg = rep["Dg"], rep["Cg"]
                hp = jax.lax.Precision.HIGHEST
                hx = jnp.einsum("nij,nj->ni", Dg, xb, precision=hp)
                hx = hx.at[1:].add(jnp.einsum("nij,nj->ni", Cg[1:], xb[:-1], precision=hp))
                hx = hx.at[:-1].add(jnp.einsum("nji,nj->ni", Cg[1:], xb[1:], precision=hp))
                return hx.reshape(-1)[:D_]

            def empty_rep(D):
                z = jnp.zeros((n_, m_, m_), dtype=cp.dtype)
                return dict(Dg=z, Cg=z)
        else:

            def assemble(values):
                H, g, cost = cp.assemble_normal(values)
                return dict(H=H), g, cost

            def hsolve(rep, g, mu):
                return dense_linalg.solve_cholesky_with_retry(rep["H"], g, mu)

            def hmatvec(rep, v):
                return rep["H"] @ v

            def empty_rep(D):
                return dict(H=jnp.zeros((D, D), dtype=cp.dtype))

        self._dl_empty_rep = empty_rep

        def step(values, state_pack, nu_unused, current_cost, iteration, jacobi_scale):
            # state_pack carries (delta, mu, cache...) packed as a dict in
            # place of LM's damping scalar.
            delta = state_pack["delta"]
            mu = state_pack["mu"]
            cache = state_pack["cache"]

            def fresh(_):
                rep, g, cost = assemble(values)
                dx_gn = hsolve(rep, g, mu)
                gTg = jnp.sum(g * g)
                gHg = jnp.sum(g * hmatvec(rep, g))
                alpha = jnp.where(jnp.abs(gHg) > 1e-15, gTg / gHg, 1.0)
                cauchy = -alpha * g
                return rep, g, dx_gn, cauchy, cost, jnp.asarray(0, jnp.int32)

            def reuse(_):
                return (
                    cache["rep"],
                    cache["g"],
                    cache["dx_gn"],
                    cache["cauchy"],
                    current_cost,
                    cache["count"] + 1,
                )

            can_reuse = cache["valid"] & (cache["count"] < 5) & (iteration > 0)
            rep, g, dx_gn, cauchy, current_cost, reuse_count = jax.lax.cond(
                can_reuse, reuse, fresh, operand=None
            )

            dx = _dogleg_step(g, dx_gn, cauchy, delta)
            gradient_norm = jnp.linalg.norm(g)
            step_norm = jnp.linalg.norm(dx)
            predicted = -jnp.sum(dx * g) - 0.5 * jnp.sum(dx * hmatvec(rep, dx))

            new_values = cp.apply_step(values, dx)
            new_cost = cp.cost(new_values)
            rho = compute_step_quality(current_cost, new_cost, predicted)
            accepted = rho > 1e-4

            good = rho > dl.good_step_quality
            poor = rho < dl.poor_step_quality
            new_delta = jnp.where(
                good,
                jnp.minimum(jnp.maximum(delta, 3.0 * step_norm), dl.trust_region_max),
                jnp.where(
                    poor,
                    jnp.maximum(delta * dl.trust_region_decrease_factor, dl.trust_region_min),
                    delta,
                ),
            )
            new_mu = jnp.where(
                good, jnp.maximum(mu / (0.5 * dl.mu_increase_factor), dl.min_mu), mu
            )

            out_values = _tree_where(accepted, new_values, values)
            out_cost = jnp.where(accepted, new_cost, current_cost)

            # Reuse only when rejected (parameters unmoved).
            cache_valid = (~accepted) & poor & bool(dl.enable_step_reuse)
            new_cache = dict(
                rep=rep, g=g, dx_gn=dx_gn, cauchy=cauchy,
                valid=cache_valid, count=reuse_count,
            )

            status = check_convergence(
                iteration=iteration,
                current_cost=current_cost,
                new_cost=out_cost,
                parameter_norm=cp.parameter_norm(out_values),
                parameter_update_norm=step_norm,
                gradient_norm=gradient_norm,
                step_accepted=accepted,
                cfg=ccfg,
                trust_region_radius=new_delta,
            )
            metrics = dict(
                rho=rho,
                accepted=accepted,
                gradient_norm=gradient_norm,
                step_norm=step_norm,
                new_cost=new_cost,
            )
            new_pack = dict(delta=new_delta, mu=new_mu, cache=new_cache)
            return out_values, new_pack, nu_unused, out_cost, status, jacobi_scale, metrics

        return step

    def _init_damping_state(self, cp: CompiledProblem, values=None):
        dl = self.dl_config
        D = cp.total_dof
        zeros = jnp.zeros((D,), dtype=cp.dtype)
        return dict(
            delta=jnp.asarray(dl.trust_region_radius, cp.dtype),
            mu=jnp.asarray(dl.initial_mu, cp.dtype),
            cache=dict(
                rep=self._dl_empty_rep(D),
                g=zeros,
                dx_gn=zeros,
                cauchy=zeros,
                valid=jnp.asarray(False),
                count=jnp.asarray(0, jnp.int32),
            ),
        )
