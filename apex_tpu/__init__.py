"""apex-tpu: a TPU-native sparse nonlinear least-squares / factor-graph
optimization framework (JAX/XLA/Pallas), with the capability surface of the
Rust reference solver ``apex-solver``:

- Lie-group manifolds with analytic Jacobians (SO2/SO3/SE2/SE3/SE23/SGal3/Sim3/Rn)
- camera models with analytic Jacobians
- 15 robust losses + Ceres-style corrector
- LM / Gauss-Newton / DogLeg outer loops (fully jittable)
- dense Cholesky/QR, explicit & implicit (matrix-free PCG) Schur solvers
- G2O/TORO/BAL I/O + dataset registry
- covariance estimation, observers, multi-chip sharding via jax.sharding

Design: structure-of-arrays problems (variable pools per manifold, factor
groups per signature), fused vmapped linearization kernels, segment-sum
Hessian assembly — no dynamic dispatch or Python in the iteration loop.
"""

from . import config as _config  # noqa: F401  (enables x64 unless opted out)

from . import cameras, core, errors, factors, io, linalg, manifolds, observers, optim, parallel
from .core import (
    CauchyLoss,
    HuberLoss,
    L1Loss,
    L2Loss,
    Loss,
)
from .core.problem import CompiledProblem, Problem
from .factors import BetweenFactor, ManifoldPriorFactor, PriorFactor
from .manifolds import SE2, SE3, SO2, SO3, Rn
from .optim import (
    DogLeg,
    DogLegConfig,
    GaussNewton,
    GaussNewtonConfig,
    LevenbergMarquardt,
    LevenbergMarquardtConfig,
    SolverResult,
    Status,
)

__version__ = "0.1.0"

__all__ = [
    "manifolds", "core", "factors", "linalg", "optim", "cameras", "io",
    "observers", "parallel", "errors",
    "SE2", "SE3", "SO2", "SO3", "Rn",
    "Problem", "CompiledProblem",
    "BetweenFactor", "PriorFactor", "ManifoldPriorFactor",
    "Loss", "L2Loss", "L1Loss", "HuberLoss", "CauchyLoss",
    "LevenbergMarquardt", "LevenbergMarquardtConfig", "SolverResult", "Status",
    "GaussNewton", "GaussNewtonConfig", "DogLeg", "DogLegConfig",
]
