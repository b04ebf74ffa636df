"""Camera models with analytic Jacobians (reference: apex-camera-models).

Registry maps model names to instances; models are stateless so instances
are shared.
"""

from .bal_pinhole import BALPinholeCamera
from .base import MIN_DEPTH, CameraModel
from .pinhole import PinholeCamera

_REGISTRY = {}


def register(model: CameraModel):
    _REGISTRY[model.name] = model
    return model


register(BALPinholeCamera())
register(PinholeCamera())


def get(name: str) -> CameraModel:
    if name not in _REGISTRY:
        # Extended models self-register on import.
        from . import extended  # noqa: F401
    if name not in _REGISTRY:
        raise KeyError(f"unknown camera model {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


__all__ = ["CameraModel", "BALPinholeCamera", "PinholeCamera", "get", "register", "MIN_DEPTH"]
