"""Robust loss functions — 15 kernels matching the reference
(src/core/loss_functions.rs) exactly.

Each loss maps the squared residual norm ``s = ||r||^2`` to
``(rho(s), rho'(s), rho''(s))``. All are pure elementwise functions over
arrays of ``s`` (vmapped-by-construction), parameterized by a small parameter
vector so a factor *group* can carry per-factor loss parameters while sharing
one compiled kernel.

User-facing classes mirror the reference API (``HuberLoss(1.0)`` etc.).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

_EPS = 2.220446049250313e-16  # f64 machine epsilon, as used by the reference
_TINY = 2.2250738585072014e-308  # f64::MIN_POSITIVE analogue of f64::MIN in Rust max()


def _l2(s, p):
    one = jnp.ones_like(s)
    return s, one, jnp.zeros_like(s)


def _l1(s, p):
    safe = jnp.maximum(s, _EPS)
    sqrt_s = jnp.sqrt(safe)
    small = s < _EPS
    rho = jnp.where(small, s, 2.0 * sqrt_s)
    rho1 = jnp.where(small, 1.0, 1.0 / sqrt_s)
    rho2 = jnp.where(small, 0.0, -1.0 / (2.0 * safe * sqrt_s))
    return rho, rho1, rho2


def _huber(s, p):
    scale = p[..., 0]
    scale2 = scale * scale
    out = s > scale2
    safe = jnp.maximum(s, _EPS)
    r = jnp.sqrt(safe)
    rho1_out = jnp.maximum(scale / r, _TINY)
    rho = jnp.where(out, 2.0 * scale * r - scale2, s)
    rho1 = jnp.where(out, rho1_out, 1.0)
    rho2 = jnp.where(out, -rho1_out / (2.0 * safe), 0.0)
    return rho, rho1, rho2


def _cauchy(s, p):
    scale = p[..., 0]
    scale2 = scale * scale
    c = 1.0 / scale2
    ssum = 1.0 + s * c
    inv = 1.0 / ssum
    return scale2 * jnp.log(ssum) / 2.0, jnp.maximum(inv, _TINY), -c * inv * inv


def _fair(s, p):
    scale = p[..., 0]
    small = s < _EPS
    safe = jnp.maximum(s, _EPS)
    x = jnp.sqrt(safe)
    cpx = scale + x
    rho = scale * scale * (x / scale - jnp.log1p(x / scale))
    rho1 = 0.5 / cpx
    rho2 = -1.0 / (4.0 * safe * cpx * cpx)
    return (
        jnp.where(small, s, rho),
        jnp.where(small, 1.0, rho1),
        jnp.where(small, 0.0, rho2),
    )


def _geman_mcclure(s, p):
    scale = p[..., 0]
    c = 1.0 / (scale * scale)
    denom = 1.0 + s * c
    inv = 1.0 / denom
    inv2 = inv * inv
    return s * inv, inv2, -2.0 * c * inv2 * inv


def _welsch(s, p):
    scale = p[..., 0]
    scale2 = scale * scale
    inv_scale2 = 1.0 / scale2
    e = jnp.exp(-s * inv_scale2)
    return (scale2 / 2.0) * (1.0 - e), 0.5 * e, -0.5 * inv_scale2 * e


def _tukey(s, p):
    scale = p[..., 0]
    scale2 = scale * scale
    x = jnp.sqrt(jnp.maximum(s, 0.0))
    out = x > scale
    ratio2 = jnp.minimum(s / scale2, 1.0)
    omr = 1.0 - ratio2
    omr2 = omr * omr
    ratio = x / scale
    rho_in = (scale2 / 6.0) * (1.0 - omr * omr2)
    rho = jnp.where(out, scale2 / 6.0, rho_in)
    rho1 = jnp.where(out, 0.0, 0.5 * omr2)
    rho2 = jnp.where(out, 0.0, -(ratio / scale2) * omr)
    return rho, rho1, rho2


def _andrews_wave(s, p):
    scale = p[..., 0]
    scale2 = scale * scale
    threshold = jnp.pi * scale
    x = jnp.sqrt(jnp.maximum(s, 0.0))
    out = x > threshold
    arg = jnp.where(out, 0.0, x / scale)
    rho = jnp.where(out, 2.0 * scale2, scale2 * (1.0 - jnp.cos(arg)))
    rho1 = jnp.where(out, 0.0, 0.5 * jnp.sin(arg))
    rho2 = jnp.where(
        out, 0.0, (0.25 / scale) * jnp.cos(arg) / jnp.maximum(x, _EPS)
    )
    return rho, rho1, rho2


def _ramsay_ea(s, p):
    scale = p[..., 0]  # 'a'
    inv_scale2 = 1.0 / (scale * scale)
    x = jnp.sqrt(jnp.maximum(s, 0.0))
    ax = scale * x
    e = jnp.exp(-ax)
    rho = inv_scale2 * (1.0 - e * (1.0 + ax))
    rho1 = 0.5 * e
    rho2 = -(scale / (4.0 * jnp.maximum(x, _EPS))) * e
    return rho, rho1, rho2


def _trimmed_mean(s, p):
    scale = p[..., 0]
    scale2 = scale * scale
    inlier = s <= scale2
    rho = jnp.where(inlier, s / 2.0, scale2 / 2.0)
    rho1 = jnp.where(inlier, 0.5, 0.0)
    rho2 = jnp.zeros_like(s)
    return rho, rho1, rho2


def _lp_norm(s, p):
    pexp = p[..., 0]
    small = s < _EPS
    safe = jnp.maximum(s, _EPS)
    e0 = pexp / 2.0
    e1 = e0 - 1.0
    e2 = e1 - 1.0
    rho = jnp.where(small, s, safe**e0)
    rho1 = jnp.where(small, 1.0, e0 * safe**e1)
    rho2 = jnp.where(small, 0.0, e0 * e1 * safe**e2)
    return rho, rho1, rho2


def _barron_general(s, p):
    alpha, scale = p[..., 0], p[..., 1]
    scale2 = scale * scale

    # alpha ~ 0: Cauchy-like
    denom = 1.0 + s / scale2
    inv = 1.0 / denom
    rho_c = (scale2 / 2.0) * jnp.log(denom)
    rho1_c = jnp.maximum(inv, _TINY)
    rho2_c = -inv * inv / scale2

    # general case
    x = jnp.sqrt(jnp.maximum(s, 0.0))
    nrm2 = (x / scale) ** 2
    absa = jnp.abs(alpha)
    inner = absa / 2.0 * nrm2 + 1.0
    power = inner ** (alpha / 2.0)
    rho_g = (absa / scale2) * (power - 1.0)
    rho1_g = 0.5 * inner ** (alpha / 2.0 - 1.0)
    rho2_g = (alpha - 2.0) / (4.0 * scale2) * inner ** (alpha / 2.0 - 2.0)

    is_cauchy = jnp.abs(alpha) < 1e-6
    is_l2 = jnp.abs(alpha - 2.0) < 1e-6
    rho = jnp.where(is_cauchy, rho_c, jnp.where(is_l2, s, rho_g))
    rho1 = jnp.where(is_cauchy, rho1_c, jnp.where(is_l2, 1.0, rho1_g))
    rho2 = jnp.where(is_cauchy, rho2_c, jnp.where(is_l2, 0.0, rho2_g))
    return rho, rho1, rho2


def _t_distribution(s, p):
    nu = p[..., 0]
    half = (nu + 1.0) / 2.0
    inner = 1.0 + s / nu
    denom = nu + s
    return half * jnp.log(inner), half / denom, -half / (denom * denom)


_KERNELS = {
    "l2": (_l2, 0),
    "l1": (_l1, 0),
    "huber": (_huber, 1),
    "cauchy": (_cauchy, 1),
    "fair": (_fair, 1),
    "geman_mcclure": (_geman_mcclure, 1),
    "welsch": (_welsch, 1),
    "tukey_biweight": (_tukey, 1),
    "andrews_wave": (_andrews_wave, 1),
    "ramsay_ea": (_ramsay_ea, 1),
    "trimmed_mean": (_trimmed_mean, 1),
    "lp_norm": (_lp_norm, 1),
    "barron_general": (_barron_general, 2),
    "t_distribution": (_t_distribution, 1),
    "adaptive_barron": (_barron_general, 2),
}


def evaluate(kind: str, params, s):
    """Evaluate loss ``kind`` elementwise: s (...,) -> (rho, rho', rho'')."""
    fn, nparams = _KERNELS[kind]
    params = jnp.asarray(params)
    if nparams and params.ndim == 1 and params.shape[0] == nparams:
        params = jnp.broadcast_to(params, jnp.shape(s) + (nparams,))
    return fn(jnp.asarray(s), params)


@dataclasses.dataclass(frozen=True)
class Loss:
    """User-facing robust loss descriptor (kind + parameter vector)."""

    kind: str
    params: tuple = ()

    def evaluate(self, s):
        return evaluate(self.kind, jnp.asarray(self.params, dtype=jnp.result_type(s, 1.0)), s)

    @property
    def num_params(self) -> int:
        return _KERNELS[self.kind][1]


def _check_positive(name, value):
    if not value > 0:
        raise ValueError(f"{name} scale must be positive, got {value}")


def L2Loss() -> Loss:
    return Loss("l2")


def L1Loss() -> Loss:
    return Loss("l1")


def HuberLoss(scale: float = 1.345) -> Loss:
    _check_positive("Huber", scale)
    return Loss("huber", (scale,))


def CauchyLoss(scale: float = 2.3849) -> Loss:
    _check_positive("Cauchy", scale)
    return Loss("cauchy", (scale,))


def FairLoss(scale: float = 1.3998) -> Loss:
    _check_positive("Fair", scale)
    return Loss("fair", (scale,))


def GemanMcClureLoss(scale: float = 1.0) -> Loss:
    _check_positive("GemanMcClure", scale)
    return Loss("geman_mcclure", (scale,))


def WelschLoss(scale: float = 2.9846) -> Loss:
    _check_positive("Welsch", scale)
    return Loss("welsch", (scale,))


def TukeyBiweightLoss(scale: float = 4.6851) -> Loss:
    _check_positive("TukeyBiweight", scale)
    return Loss("tukey_biweight", (scale,))


def AndrewsWaveLoss(scale: float = 1.339) -> Loss:
    _check_positive("AndrewsWave", scale)
    return Loss("andrews_wave", (scale,))


def RamsayEaLoss(scale: float = 0.3) -> Loss:
    _check_positive("RamsayEa", scale)
    return Loss("ramsay_ea", (scale,))


def TrimmedMeanLoss(scale: float = 2.0) -> Loss:
    _check_positive("TrimmedMean", scale)
    return Loss("trimmed_mean", (scale,))


def LpNormLoss(p: float = 1.5) -> Loss:
    if not 0.0 < p <= 2.0:
        raise ValueError(f"LpNorm p must be in (0, 2], got {p}")
    return Loss("lp_norm", (p,))


def BarronGeneralLoss(alpha: float = 0.0, scale: float = 1.0) -> Loss:
    _check_positive("Barron", scale)
    return Loss("barron_general", (alpha, scale))


def TDistributionLoss(nu: float = 5.0) -> Loss:
    _check_positive("TDistribution nu", nu)
    return Loss("t_distribution", (nu,))


def AdaptiveBarronLoss(alpha: float = 0.0, scale: float = 1.0) -> Loss:
    _check_positive("AdaptiveBarron", scale)
    return Loss("adaptive_barron", (alpha, scale))


LOSS_BY_NAME = {
    "l2": L2Loss,
    "l1": L1Loss,
    "huber": HuberLoss,
    "cauchy": CauchyLoss,
    "fair": FairLoss,
    "geman_mcclure": GemanMcClureLoss,
    "welsch": WelschLoss,
    "tukey_biweight": TukeyBiweightLoss,
    "andrews_wave": AndrewsWaveLoss,
    "ramsay_ea": RamsayEaLoss,
    "trimmed_mean": TrimmedMeanLoss,
    "lp_norm": LpNormLoss,
    "barron_general": BarronGeneralLoss,
    "t_distribution": TDistributionLoss,
    "adaptive_barron": AdaptiveBarronLoss,
}
