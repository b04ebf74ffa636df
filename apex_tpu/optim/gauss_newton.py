"""Gauss-Newton optimizer.

Mirrors the reference (src/optimizer/gauss_newton.rs): undamped normal
equations every iteration, every step applied unconditionally (:490-700),
same convergence criteria as LM. Shares the solve backends with LM.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..core.problem import CompiledProblem
from .common import ConvergenceConfig, check_convergence
from .lm import LevenbergMarquardt, LevenbergMarquardtConfig


@dataclasses.dataclass
class GaussNewtonConfig:
    linear_solver_type: str = "dense_cholesky"
    max_iterations: int = 50
    cost_tolerance: float = 1e-6
    parameter_tolerance: float = 1e-8
    gradient_tolerance: float = 1e-10
    timeout: Optional[float] = None
    min_cost_threshold: Optional[float] = None
    use_jacobi_scaling: bool = False
    compute_covariances: bool = False
    mode: str = "python"
    collect_stats: bool = False
    verbose: bool = False
    schur_preconditioner: str = "schur_jacobi"
    pcg_max_iterations: int = 200
    pcg_tolerance: float = 1e-6

    def convergence(self) -> ConvergenceConfig:
        return ConvergenceConfig(
            max_iterations=self.max_iterations,
            cost_tolerance=self.cost_tolerance,
            parameter_tolerance=self.parameter_tolerance,
            gradient_tolerance=self.gradient_tolerance,
            timeout=self.timeout,
            min_cost_threshold=self.min_cost_threshold,
        )


class GaussNewton(LevenbergMarquardt):
    """Implemented as the degenerate trust-region method: zero damping,
    every step accepted (reference gauss_newton.rs semantics)."""

    def __init__(self, config: Optional[GaussNewtonConfig] = None):
        gcfg = config or GaussNewtonConfig()
        self.gn_config = gcfg
        lm_cfg = LevenbergMarquardtConfig(
            linear_solver_type=gcfg.linear_solver_type,
            max_iterations=gcfg.max_iterations,
            cost_tolerance=gcfg.cost_tolerance,
            parameter_tolerance=gcfg.parameter_tolerance,
            gradient_tolerance=gcfg.gradient_tolerance,
            timeout=gcfg.timeout,
            min_cost_threshold=gcfg.min_cost_threshold,
            use_jacobi_scaling=gcfg.use_jacobi_scaling,
            compute_covariances=gcfg.compute_covariances,
            mode=gcfg.mode,
            collect_stats=gcfg.collect_stats,
            verbose=gcfg.verbose,
            schur_preconditioner=gcfg.schur_preconditioner,
            pcg_max_iterations=gcfg.pcg_max_iterations,
            pcg_tolerance=gcfg.pcg_tolerance,
        )
        super().__init__(lm_cfg)

    def _make_step_fn(self, cp: CompiledProblem):
        cfg = self.config
        ccfg = cfg.convergence()
        solve_fn = self._make_solve_fn(cp)
        zero = 0.0

        def step(values, damping, nu, current_cost, iteration, jacobi_scale):
            dx, g, current_cost, scale, _ = solve_fn(values, zero, iteration, jacobi_scale)
            gradient_norm = jnp.linalg.norm(g)
            step_norm = jnp.linalg.norm(dx)

            new_values = cp.apply_step(values, dx)
            new_cost = cp.cost(new_values)
            accepted = jnp.asarray(True)

            status = check_convergence(
                iteration=iteration,
                current_cost=current_cost,
                new_cost=new_cost,
                parameter_norm=cp.parameter_norm(new_values),
                parameter_update_norm=step_norm,
                gradient_norm=gradient_norm,
                step_accepted=accepted,
                cfg=ccfg,
            )
            metrics = dict(
                rho=jnp.asarray(1.0, cp.dtype),
                accepted=accepted,
                gradient_norm=gradient_norm,
                step_norm=step_norm,
                new_cost=new_cost,
            )
            return new_values, damping, nu, new_cost, status, scale, metrics

        return step
