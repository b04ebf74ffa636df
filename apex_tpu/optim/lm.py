"""Levenberg-Marquardt with Nielsen damping.

Semantics match the reference (src/optimizer/levenberg_marquardt.rs):
- damping update (lm.rs:702-717): accepted -> lambda *= max(1/3, 1-(2rho-1)^3),
  nu = 2; rejected -> lambda *= nu, nu *= 2 (clamped to [damping_min, damping_max])
- predicted reduction 0.5 * step^T (lambda*step - g) (lm.rs:721-727)
- accept iff rho > 0, exact rollback on rejection (lm.rs:770-817)
- Ceres-compatible defaults (lm.rs:319-359)
- convergence per optimizer/mod.rs:591-658 after each iteration

Two execution modes sharing one step kernel:
- ``python``: host loop around a jitted iteration — supports observers,
  timeout, per-iteration stats (like the reference's tracing table).
- ``jit``: the whole solve is one ``lax.while_loop`` — no host syncs,
  maximum TPU throughput; stats carried in loop state.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.problem import CompiledProblem
from ..linalg import dense as dense_linalg
from .common import (
    ConvergenceConfig,
    IterationStats,
    SolverResult,
    Status,
    check_convergence,
    compute_step_quality,
)


@dataclasses.dataclass
class LevenbergMarquardtConfig:
    """Ceres-compatible defaults (reference lm.rs:319-359)."""

    linear_solver_type: str = "dense_cholesky"  # dense_cholesky | dense_qr |
    # schur_explicit | schur_implicit (BA solvers, see linalg/schur.py)
    max_iterations: int = 50
    cost_tolerance: float = 1e-6
    parameter_tolerance: float = 1e-8
    gradient_tolerance: float = 1e-10
    timeout: Optional[float] = None
    # Initial damping: a float (Ceres/reference default 1e-3, lm.rs:319-359)
    # or "auto" for Madsen-Nielsen scale-adaptive initialization
    # lambda_0 = damping_tau * max diag(J^T J) — on well-initialized SLAM
    # graphs the fixed 1e-3 wastes iterations ramping down (m3500-scale:
    # 13 -> 5 iterations at tau=1e-11, same final cost, zero rejections
    # across the m3500/sphere/ring/grid3d sweep; a rejected first step
    # only costs one iteration, so the aggressive default tau is safe).
    damping: float | str = 1e-3
    damping_tau: float = 1e-11
    damping_min: float = 1e-12
    damping_max: float = 1e12
    trust_region_radius: float = 1e4
    min_trust_region_radius: float = 1e-32
    min_cost_threshold: Optional[float] = None
    use_jacobi_scaling: bool = False
    compute_covariances: bool = False
    mode: str = "python"  # "python" | "jit"
    collect_stats: bool = False
    verbose: bool = False
    # Schur options (used when linear_solver_type is schur_*)
    schur_preconditioner: str = "schur_jacobi"  # none | block_diagonal | schur_jacobi
    pcg_max_iterations: int = 200
    pcg_tolerance: float = 1e-6
    # Forcing sequence for the implicit-Schur PCG: loose solves on early LM
    # iterations, tightening geometrically to pcg_tolerance (floored by the
    # f32 stagnation limit). Cuts wasted PCG iterations dramatically.
    pcg_forcing: bool = True
    # Warm-start each PCG from the previous LM iteration's camera step
    # (guarded: falls back to the zero start when the old step's residual
    # is not actually smaller). Attacks the late-phase cost where the
    # forcing sequence has tightened to the floor and consecutive reduced
    # systems barely change. The previous step rides in the (otherwise
    # unused on Schur paths) jacobi_scale state slot.
    pcg_warm_start: bool = True
    # Nash-Sofer Q-stagnation termination for the implicit-Schur PCG (the
    # inner-loop criterion Ceres uses for ITERATIVE_SCHUR): stop once
    # n * (Q_n - Q_{n-1}) / (Q_n - Q_0) < pcg_q_tolerance, where Q is the
    # CG quadratic model and Q_0 its value at this call's start (warm
    # start included). OPT-IN (None disables, the default): measured at
    # venice scale it under-iterates — 5-step solves land at RMSE 0.878
    # where the residual/forcing criterion with the same inner cap
    # reaches the 0.677 noise floor in the same wall clock
    # (doc/performance.md round-3 PCG notes). The forcing sequence +
    # warm start + inner cap already remove the late-phase waste this
    # criterion targets.
    pcg_q_tolerance: Optional[float] = None
    # Decoupled landmark-block shift floor (None = dtype default: 1e-4 in
    # f32, 0 in f64) — see SchurContext.pp_shift_floor.
    schur_pp_shift_floor: Optional[float] = None
    # Panel override for banded_cholesky/sparse_cholesky (None = auto: at
    # least the block bandwidth, at least total_dof/16, lane-aligned).
    banded_panel: int | None = None
    # Opt-in: recompute (H, g) per iteration on the host loop and pass them
    # to observers' set_matrix_data (reference Hessian-heatmap hook). Costs
    # an extra assembly per iteration; python mode only.
    expose_matrix_data: bool = False

    @classmethod
    def for_bundle_adjustment(cls) -> "LevenbergMarquardtConfig":
        """Preset mirroring reference lm.rs:519-530 (implicit Schur +
        Schur-Jacobi, 20 iterations)."""
        return cls(
            linear_solver_type="schur_implicit",
            schur_preconditioner="schur_jacobi",
            max_iterations=20,
        )

    def convergence(self) -> ConvergenceConfig:
        return ConvergenceConfig(
            max_iterations=self.max_iterations,
            cost_tolerance=self.cost_tolerance,
            parameter_tolerance=self.parameter_tolerance,
            gradient_tolerance=self.gradient_tolerance,
            timeout=self.timeout,
            min_cost_threshold=self.min_cost_threshold,
            min_trust_region_radius=self.min_trust_region_radius,
        )


# Residual dimension above which solver executables are built with
# constants hoisted to runtime arguments (utils/hoist.py) and solves run
# in chunked dispatches: embedded index plans push venice-scale programs
# past the remote compile tunnel's request limit (HTTP 413).
HOIST_THRESHOLD = 200_000


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


class LevenbergMarquardt:
    def __init__(self, config: Optional[LevenbergMarquardtConfig] = None):
        self.config = config or LevenbergMarquardtConfig()
        self.observers = []
        # Compiled-function caches keyed by CompiledProblem identity: repeat
        # solves of the same problem structure must not re-trace/re-compile
        # (XLA compilation dominates wall time on TPU).
        self._step_cache = {}
        self._run_cache = {}

    def add_observer(self, observer):
        self.observers.append(observer)

    # ------------------------------------------------------------------
    def _make_solve_fn(self, cp: CompiledProblem):
        """Build linearize_and_solve(values, damping, iteration, jacobi_scale)
        -> (dx, g, cost, scale) for the configured linear solver."""
        cfg = self.config
        # Reference LinearSolverType names map onto the TPU solvers
        # (linalg/mod.rs:48-57): sparse problems have no faer here — the
        # dense-Cholesky path covers <=~20k DOF and "pcg" is the
        # unbounded-size iterative tier.
        aliases = {
            "sparse_cholesky": "banded_cholesky",
            "sparse_qr": "banded_qr",
            "sparse_schur_complement": "schur_explicit",
            "iterative_schur": "schur_implicit",
        }
        solver_type = aliases.get(cfg.linear_solver_type, cfg.linear_solver_type)
        if solver_type == "banded_qr":
            # QR of the normal equations (reference SparseQRSolver,
            # sparse/qr.rs:13-262) rides the banded storage; a
            # panel-hostile bandwidth falls back to the dense damped
            # stacked-J QR, which is at least as rank-robust.
            from ..linalg import banded as _banded

            if _banded.block_bandwidth(cp) > 1536:
                solver_type = "dense_qr"
        if solver_type in ("schur_explicit", "schur_implicit", "sparse_schur",
                           "schur", "schur_auto"):
            from ..linalg.schur import SchurContext

            if solver_type in ("schur", "schur_auto"):
                # pick the variant by reduced-system size: dense S is the
                # right call up to a few thousand camera DOF, matrix-free
                # PCG beyond (mirrors the reference's guidance).
                probe = SchurContext(cp, variant="iterative",
                                     pcg_max_iterations=1)
                variant = "sparse" if probe.Dc <= 4096 else "iterative"
            else:
                variant = "iterative" if solver_type == "schur_implicit" else "sparse"
            ctx = SchurContext(
                cp,
                variant=variant,
                preconditioner=cfg.schur_preconditioner,
                pcg_max_iterations=cfg.pcg_max_iterations,
                pcg_tolerance=cfg.pcg_tolerance,
                pcg_forcing=cfg.pcg_forcing,
                pp_shift_floor=cfg.schur_pp_shift_floor,
                # Q-stagnation is an inexact-inner-solve policy like the
                # forcing sequence; pcg_forcing=False means "exact solves"
                # (the agreement tests rely on it), so it disables both.
                pcg_q_tolerance=(cfg.pcg_q_tolerance if cfg.pcg_forcing
                                 else None),
            )

            warm = (cfg.pcg_warm_start and variant == "iterative"
                    and not cfg.use_jacobi_scaling)

            def solve_schur(values, damping, iteration, jacobi_scale):
                if warm:
                    # the state slot holds the previous global step; the
                    # loop initializes it to ones, so zero it at iter 0
                    prev = jnp.where(iteration == 0,
                                     jnp.zeros_like(jacobi_scale),
                                     jacobi_scale)
                    dx, g, cost, predicted = ctx.solve(
                        values, damping, iteration=iteration, dx_prev=prev)
                    return dx, g, cost, dx, predicted
                dx, g, cost, predicted = ctx.solve(values, damping,
                                                   iteration=iteration)
                return dx, g, cost, jacobi_scale, predicted

            return solve_schur

        if solver_type == "pcg":
            from ..linalg.iterative import IterativeNormalSolver

            it_solver = IterativeNormalSolver(
                cp, max_iterations=cfg.pcg_max_iterations * 3,
                tolerance=min(cfg.pcg_tolerance, 1e-8),
            )

            def solve_pcg(values, damping, iteration, jacobi_scale):
                dx, g, cost = it_solver.solve(values, damping)
                return dx, g, cost, jacobi_scale, None

            return solve_pcg

        if solver_type == "dense_qr":

            def solve_qr_fn(values, damping, iteration, jacobi_scale):
                r, J = cp.assemble_dense_jacobian(values)
                cost = 0.5 * jnp.dot(r, r)
                if cfg.use_jacobi_scaling:
                    scale = jnp.where(
                        iteration == 0,
                        1.0 / (1.0 + jnp.linalg.norm(J, axis=0)),
                        jacobi_scale,
                    )
                    J = J * scale[None, :]
                else:
                    scale = jacobi_scale
                g = J.T @ r
                dx = dense_linalg.solve_qr(r, J, damping)
                if cfg.use_jacobi_scaling:
                    dx = dx * scale
                return dx, g, cost, scale, None

            return solve_qr_fn

        if solver_type in ("banded_cholesky", "sparse_general", "banded_qr"):
            from ..linalg import banded

            # General-sparsity tier (reference: faer fill-reducing LLT
            # handles ANY pattern, sparse/cholesky.rs:103-157): when even
            # the post-RCM bandwidth is panel-hostile (grid3D/city10000
            # topologies), switch to independent-set block elimination
            # (linalg/sparse_general.py) instead of cliffing to a huge
            # banded panel or dense Cholesky.
            use_general = solver_type == "sparse_general"
            if not use_general and cfg.banded_panel is None \
                    and solver_type != "banded_qr":
                from ..linalg.sparse_general import GeneralSparseCholesky

                W = banded.block_bandwidth(cp)
                use_general = (W > 1536 and GeneralSparseCholesky.suitable(cp))
            if use_general:
                from ..linalg.sparse_general import GeneralSparseCholesky

                gs = GeneralSparseCholesky(cp)
                if gs.healthy() or solver_type == "sparse_general":

                    def solve_general(values, damping, iteration, jacobi_scale):
                        dx, g, cost = gs.solve(values, damping)
                        return dx, g, cost, jacobi_scale, None

                    solve_general.general_sparse = gs
                    return solve_general

            asm = banded.BandedNormalAssembler(cp, block=cfg.banded_panel)
            if solver_type == "banded_qr":
                from ..linalg.banded_qr import make_blocktri_qr_core

                core = make_blocktri_qr_core(cp.total_dof, asm.m, cp.dtype)
            else:
                core = banded.make_blocktri_cr_core(cp.total_dof, asm.m,
                                                    cp.dtype)
            D, m, n, Dp = asm.D, asm.m, asm.n, asm.Dp

            def solve_banded(values, damping, iteration, jacobi_scale):
                Dg, Cg, gv, cost = asm.assemble(values)
                Dg = asm.pad_diag_ones(Dg)
                if cfg.use_jacobi_scaling:
                    diag = Dg.reshape(n, -1)[:, :: m + 1].reshape(-1)[:D]
                    scale = jnp.where(
                        iteration == 0,
                        1.0 / (1.0 + jnp.sqrt(diag)),
                        jacobi_scale,
                    )
                    sb = jnp.pad(scale, (0, Dp - D),
                                 constant_values=1.0).reshape(n, m)
                    sb_prev = jnp.concatenate([sb[:1] * 0.0, sb[:-1]])
                    Dg = Dg * sb[:, :, None] * sb[:, None, :]
                    Cg = Cg * sb[:, :, None] * sb_prev[:, None, :]
                    gv = gv * scale
                else:
                    scale = jacobi_scale
                bp = jnp.pad(-gv, (0, Dp - D)).reshape(n, m)
                dx = core(Dg, Cg, bp, damping)[:D]
                if cfg.use_jacobi_scaling:
                    dx = dx * scale
                return dx, gv, cost, scale, None

            return solve_banded

        def solve_chol(values, damping, iteration, jacobi_scale):
            H, g, cost = cp.assemble_normal(values)
            if cfg.use_jacobi_scaling:
                scale = jnp.where(
                    iteration == 0,
                    1.0 / (1.0 + jnp.sqrt(jnp.diag(H))),
                    jacobi_scale,
                )
                H = H * scale[None, :] * scale[:, None]
                g = g * scale
            else:
                scale = jacobi_scale
            dx = dense_linalg.solve_cholesky_with_retry(H, g, damping)
            if cfg.use_jacobi_scaling:
                dx = dx * scale
            return dx, g, cost, scale, None

        return solve_chol

    def _make_step_fn(self, cp: CompiledProblem):
        cfg = self.config
        ccfg = cfg.convergence()
        solve_fn = self._make_solve_fn(cp)

        def step(values, damping, nu, current_cost, iteration, jacobi_scale):
            dx, g, current_cost, scale, predicted = solve_fn(
                values, damping, iteration, jacobi_scale
            )
            gradient_norm = jnp.linalg.norm(g)
            step_norm = jnp.linalg.norm(dx)

            if predicted is None:
                # exact-solve shortcut 0.5 step^T (lambda*step - g)
                # (lm.rs:721-727); iterative solvers return the exact model
                # reduction instead (see SchurContext.solve).
                predicted = 0.5 * jnp.sum(dx * (damping * dx - g))

            new_values = cp.apply_step(values, dx)
            new_cost = cp.cost(new_values)
            rho = compute_step_quality(current_cost, new_cost, predicted)
            accepted = rho > 0.0

            coff = 2.0 * rho - 1.0
            damping_acc = jnp.clip(
                damping * jnp.maximum(1.0 / 3.0, 1.0 - coff**3),
                cfg.damping_min,
                cfg.damping_max,
            )
            damping_rej = jnp.minimum(damping * nu, cfg.damping_max)
            new_damping = jnp.where(accepted, damping_acc, damping_rej)
            new_nu = jnp.where(accepted, 2.0, nu * 2.0)

            out_values = _tree_where(accepted, new_values, values)
            out_cost = jnp.where(accepted, new_cost, current_cost)

            status = check_convergence(
                iteration=iteration,
                current_cost=current_cost,
                new_cost=out_cost,
                parameter_norm=cp.parameter_norm(out_values),
                parameter_update_norm=step_norm,
                gradient_norm=gradient_norm,
                step_accepted=accepted,
                cfg=ccfg,
                trust_region_radius=cfg.trust_region_radius,
            )
            metrics = dict(
                rho=rho,
                accepted=accepted,
                gradient_norm=gradient_norm,
                step_norm=step_norm,
                new_cost=new_cost,
            )
            return out_values, new_damping, new_nu, out_cost, status, scale, metrics

        return step

    # ------------------------------------------------------------------
    def optimize(self, problem, initial_values=None, checkpoint=None) -> SolverResult:
        """Run the optimization. ``checkpoint`` (an OptimizerCheckpoint from
        core.checkpoint) resumes a previous solve: values, damping, nu and
        the iteration counter are restored (python mode)."""
        cp = problem if isinstance(problem, CompiledProblem) else problem.compile(initial_values)
        if checkpoint is not None:
            checkpoint.validate_against(cp)
            return self._optimize_python(cp, checkpoint=checkpoint)
        if not cp.groups or cp.total_dof == 0:
            # Nothing to optimize: converged trivially at cost 0 / initial.
            values = cp.initial_values()
            cost = float(jax.jit(cp.cost)(values)) if cp.groups else 0.0
            return SolverResult(
                status=Status.CONVERGED,
                iterations=0,
                initial_cost=cost,
                final_cost=cost,
                elapsed_seconds=0.0,
                variables=cp.values_dict(values),
            )
        if self.config.mode == "jit" and not self.observers:
            return self._optimize_jit(cp)
        return self._optimize_python(cp)

    def _init_damping_state(self, cp: CompiledProblem, values=None):
        """The solver-specific state threaded through step() in place of LM's
        damping scalar (DogLeg packs its trust region + cache here)."""
        if self.config.damping == "auto" and values is not None:
            lam0 = self.config.damping_tau * cp.normal_diag_max(values)
            return jnp.clip(
                lam0.astype(cp.dtype),
                self.config.damping_min, self.config.damping_max)
        d = self.config.damping if not isinstance(self.config.damping, str) \
            else 1e-3
        return jnp.asarray(d, dtype=cp.dtype)

    # ------------------------------------------------------------------
    def _optimize_python(self, cp: CompiledProblem, checkpoint=None) -> SolverResult:
        cfg = self.config
        start = time.perf_counter()
        if checkpoint is not None:
            values = tuple(jnp.asarray(v, dtype=cp.dtype) for v in checkpoint.values)
        else:
            values = cp.initial_values()
        # cache the jitted cost: `jax.jit(cp.cost)` builds a FRESH wrapper
        # per call, so repeat python-mode solves re-traced and re-compiled
        # the cost program every time (~10 min at venice scale through the
        # remote compile tunnel)
        cost_key = ("cost", id(cp))
        if cost_key not in self._step_cache:
            self._step_cache[cost_key] = jax.jit(cp.cost)
        initial_cost = float(self._step_cache[cost_key](values))

        key = id(cp)
        if key not in self._step_cache:
            step = self._make_step_fn(cp)  # may set solver state helpers
            # (e.g. DogLeg's _dl_empty_rep) that _init_damping_state needs
            if cp.total_residual_dim >= HOIST_THRESHOLD:
                damping = self._init_damping_state(cp, values)
                # Same constant-hoisting as the jit path: the step closes
                # over the problem's index plans and observation data,
                # which embedded as literals push the serialized program
                # past the remote compile tunnel's request limit
                # (HTTP 413 at venice scale) — python mode was the one
                # path still embedding them.
                from ..utils.hoist import hoisted_jit

                sd = jax.ShapeDtypeStruct
                ex = (
                    jax.tree.map(lambda a: sd(a.shape, a.dtype), values),
                    jax.tree.map(lambda a: sd(jnp.shape(a),
                                              jnp.result_type(a)), damping),
                    sd((), cp.dtype), sd((), cp.dtype),
                    sd((), jnp.int32),
                    sd((cp.total_dof,), cp.dtype),
                )
                self._step_cache[key] = hoisted_jit(step, *ex)
            else:
                self._step_cache[key] = jax.jit(step)
        step_fn = self._step_cache[key]
        damping = self._init_damping_state(cp, values)
        nu = jnp.asarray(2.0, dtype=cp.dtype)
        if checkpoint is not None and not isinstance(damping, dict):
            damping = jnp.asarray(checkpoint.damping, dtype=cp.dtype)
            nu = jnp.asarray(checkpoint.nu, dtype=cp.dtype)
        cost = jnp.asarray(initial_cost, dtype=cp.dtype)
        jacobi_scale = jnp.ones((cp.total_dof,), dtype=cp.dtype)

        stats = [] if (cfg.collect_stats or cfg.verbose) else None
        if cfg.verbose:
            print(IterationStats.HEADER)

        iteration = 0
        status = Status.RUNNING
        n_succ = n_fail = 0
        grad_norm = step_norm = float("nan")
        cost_evals, jac_evals = 1, 0
        prev_cost = initial_cost
        while True:
            it_start = time.perf_counter()
            values, damping, nu, cost, status_arr, jacobi_scale, metrics = step_fn(
                values, damping, nu, cost,
                jnp.asarray(iteration, jnp.int32), jacobi_scale
            )
            jac_evals += 1
            cost_evals += 1
            accepted = bool(metrics["accepted"])
            grad_norm = float(metrics["gradient_norm"])
            step_norm = float(metrics["step_norm"])
            n_succ += accepted
            n_fail += not accepted
            cost_f = float(cost)
            status = Status(int(status_arr))

            if stats is not None:
                tr_radius = (
                    float(damping) if not isinstance(damping, dict)
                    else float(damping.get("delta", jnp.nan))
                )
                st = IterationStats(
                    iteration=iteration,
                    cost=cost_f,
                    cost_change=prev_cost - cost_f,
                    gradient_norm=grad_norm,
                    step_norm=step_norm,
                    tr_ratio=float(metrics["rho"]),
                    tr_radius=tr_radius,
                    iter_time_ms=(time.perf_counter() - it_start) * 1e3,
                    total_time_ms=(time.perf_counter() - start) * 1e3,
                    accepted=accepted,
                )
                stats.append(st)
                if cfg.verbose:
                    print(st.line())
            prev_cost = cost_f

            if cfg.expose_matrix_data and self.observers:
                H_obs, g_obs, _ = jax.jit(cp.assemble_normal)(values)
                for obs in self.observers:
                    if hasattr(obs, "set_matrix_data"):
                        obs.set_matrix_data(np.asarray(H_obs), np.asarray(g_obs))
            for obs in self.observers:
                obs.on_step(
                    cp.values_dict(values),
                    iteration,
                    cost_f,
                    grad_norm,
                    float(damping) if not isinstance(damping, dict)
                    else float(damping.get("delta", jnp.nan)),
                    step_norm,
                    float(metrics["rho"]),
                )

            elapsed = time.perf_counter() - start
            if status == Status.RUNNING and cfg.timeout is not None and elapsed >= cfg.timeout:
                status = Status.TIMEOUT
            if status != Status.RUNNING:
                iteration += 1
                break
            iteration += 1

        covariances = None
        if cfg.compute_covariances:
            from ..core.covariance import compute_covariances

            covariances = compute_covariances(cp, values)

        final_vars = cp.values_dict(values)
        for obs in self.observers:
            if hasattr(obs, "notify_complete"):
                obs.notify_complete(final_vars, iteration)

        return SolverResult(
            status=status,
            iterations=iteration,
            initial_cost=initial_cost,
            final_cost=float(cost),
            elapsed_seconds=time.perf_counter() - start,
            variables=final_vars,
            final_gradient_norm=grad_norm,
            final_step_norm=step_norm,
            cost_evaluations=cost_evals,
            jacobian_evaluations=jac_evals,
            successful_steps=n_succ,
            unsuccessful_steps=n_fail,
            iteration_stats=stats,
            covariances=covariances,
        )

    # ------------------------------------------------------------------
    def _optimize_jit(self, cp: CompiledProblem) -> SolverResult:
        """Whole solve in lax.while_loop dispatches (no per-iteration host
        round-trips). With ``timeout`` set, the loop runs in iteration
        chunks with a host wall-clock check between dispatches (the
        reference's in-loop timeout termination, optimizer/mod.rs:602-607;
        a device loop cannot read the clock)."""
        cfg = self.config
        key = id(cp)
        start = time.perf_counter()
        if key not in self._run_cache:
            step_fn = self._make_step_fn(cp)

            def body(state):
                (values, damping, nu, cost, iteration, _, jacobi_scale, stats) = state
                values, damping, nu, cost, status, jacobi_scale, metrics = step_fn(
                    values, damping, nu, cost, iteration, jacobi_scale
                )
                stats = dict(
                    gradient_norm=metrics["gradient_norm"],
                    step_norm=metrics["step_norm"],
                    rho=metrics["rho"],
                    n_success=stats["n_success"] + metrics["accepted"].astype(jnp.int32),
                    n_fail=stats["n_fail"] + (~metrics["accepted"]).astype(jnp.int32),
                )
                return (values, damping, nu, cost, iteration + 1, status, jacobi_scale, stats)

            def init_state_fn(values):
                cost0 = cp.cost(values)
                return cost0, (
                    values,
                    self._init_damping_state(cp, values),
                    jnp.asarray(2.0, dtype=cp.dtype),
                    cost0,
                    jnp.asarray(0, jnp.int32),
                    jnp.asarray(Status.RUNNING, jnp.int32),
                    jnp.ones((cp.total_dof,), dtype=cp.dtype),
                    dict(
                        gradient_norm=jnp.asarray(jnp.nan, cp.dtype),
                        step_norm=jnp.asarray(jnp.nan, cp.dtype),
                        rho=jnp.asarray(jnp.nan, cp.dtype),
                        n_success=jnp.asarray(0, jnp.int32),
                        n_fail=jnp.asarray(0, jnp.int32),
                    ),
                )

            def run_until_fn(state, iter_cap):
                def cond(s):
                    return (s[5] == Status.RUNNING) & (s[4] < iter_cap)

                return jax.lax.while_loop(cond, body, state)

            def init_run_fn(values, iter_cap):
                # init + first loop fused into ONE dispatch: a separate
                # init_state dispatch pays a full tunnel round trip
                # (~10-30 ms), a large fixed cost for 100 ms-class solves.
                cost0, state = init_state_fn(values)
                return cost0, run_until_fn(state, iter_cap)

            # Hoist closed-over problem arrays (plans, indices, observation
            # data — tens to hundreds of MB at BA scale) out of the program
            # as runtime arguments: embedded as constants they bloat the
            # serialized executable (venice: >200 MB of MLIR, which the
            # remote-TPU compile tunnel rejects outright with HTTP 413) and
            # defeat executable caching across problems of equal structure.
            if cp.total_residual_dim >= HOIST_THRESHOLD:
                from ..utils.hoist import hoisted_jit

                values_ex = jax.tree.map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                    cp.initial_values())
                _, example = jax.eval_shape(init_state_fn, values_ex)
                cap_ex = jax.ShapeDtypeStruct((), jnp.int32)
                init_run = hoisted_jit(init_run_fn, values_ex, cap_ex)
                run_until = hoisted_jit(run_until_fn, example, cap_ex)
            else:
                init_run = jax.jit(init_run_fn)
                run_until = jax.jit(run_until_fn)

            self._run_cache[key] = (init_run, run_until)

        init_run, run_until = self._run_cache[key]
        # Large problems always run in iteration-chunked dispatches even
        # without a timeout: a single while_loop dispatch covering a whole
        # venice-scale solve executes for minutes, which the experimental
        # remote-TPU runtime has killed mid-run ("TPU worker crashed") —
        # bounded dispatches also give the host loop rollback points. Small
        # problems keep the single dispatch (8 chunked round trips through
        # the remote tunnel would dwarf a millisecond-scale solve).
        large = cp.total_residual_dim >= HOIST_THRESHOLD
        if cfg.timeout is None and not large:
            cost0, state = init_run(
                cp.initial_values(),
                jnp.asarray(cfg.max_iterations, jnp.int32))
        else:
            # ~8 host checks across the budget; each inter-chunk sync costs
            # one dispatch round trip, negligible next to an LM iteration.
            # Venice-class problems (multi-second LM iterations) go one
            # iteration per dispatch so no dispatch runs for minutes.
            chunk = max(1, -(-cfg.max_iterations // 8))
            if cp.total_residual_dim >= 2_000_000:
                chunk = 1
            cap = cfg.max_iterations  # body at index cap-1 flips status to MAX_ITERATIONS
            done = min(chunk, cap)
            cost0, state = init_run(
                cp.initial_values(), jnp.asarray(done, jnp.int32))
            while True:
                status = int(state[5])
                if status != Status.RUNNING or done >= cap:
                    break
                if cfg.timeout is not None and \
                        time.perf_counter() - start >= cfg.timeout:
                    state = state[:5] + (jnp.asarray(Status.TIMEOUT, jnp.int32),) + state[6:]
                    break
                done = min(done + chunk, cap)
                state = run_until(state, jnp.asarray(done, jnp.int32))
        return self._finish_jit(cp, start, cost0, state)

    def _finish_jit(self, cp: CompiledProblem, start, cost0, final) -> SolverResult:
        # One batched device->host transfer for the whole result tree: per-
        # scalar fetches each pay a full round trip through the remote-TPU
        # tunnel (~100 ms apiece), an order of magnitude more than the data.
        cost0, final = jax.device_get((cost0, final))
        (values, damping, nu, cost, iteration, status, _, stats) = final
        cost_f = float(cost)
        elapsed = time.perf_counter() - start

        covariances = None
        if self.config.compute_covariances:
            from ..core.covariance import compute_covariances

            covariances = compute_covariances(cp, values)

        return SolverResult(
            status=Status(int(status)),
            iterations=int(iteration),
            initial_cost=float(cost0),
            final_cost=cost_f,
            elapsed_seconds=elapsed,
            variables=cp.values_dict(values),
            final_gradient_norm=float(stats["gradient_norm"]),
            final_step_norm=float(stats["step_norm"]),
            cost_evaluations=int(iteration) + 1,
            jacobian_evaluations=int(iteration),
            successful_steps=int(stats["n_success"]),
            unsuccessful_steps=int(stats["n_fail"]),
            covariances=covariances,
        )
