"""Error hierarchy for apex-tpu.

Mirrors the reference's strict 3-layer error architecture (src/error.rs:
74-106): Layer C module errors (core / linalg / manifold / factor /
linearizer / camera / io) -> Layer B subsystem errors (optimizer /
observer) -> Layer A the top-level ApexError. Python exception subclassing
gives the `#[from]` conversions for free: catching ApexError catches
everything raised by the framework.

The logging discipline (ErrorLogging::log()/log_with_source(), error.rs:
112-160) maps to the `log()` helper which records the error through the
package logger before returning it for raising:

    raise CoreError("bad variable").log()
"""

from __future__ import annotations

import logging

_logger = logging.getLogger("apex_tpu")


class ApexError(Exception):
    """Layer A: top-level framework error."""

    def log(self, source: Exception | None = None) -> "ApexError":
        if source is not None:
            _logger.error("%s: %s (caused by %r)", type(self).__name__, self, source)
            self.__cause__ = source
        else:
            _logger.error("%s: %s", type(self).__name__, self)
        return self


# --- Layer B: subsystem errors ---------------------------------------------


class OptimizerError(ApexError):
    pass


class ObserverError(ApexError):
    pass


# --- Layer C: module errors --------------------------------------------------


class CoreError(ApexError):
    """Problem construction / residual block errors."""


class ManifoldError(ApexError):
    """Invalid manifold elements, dimension mismatches."""


class FactorError(ApexError):
    """Factor linearization errors."""


class LinearizerError(ApexError):
    """Assembly errors."""


class LinAlgError(ApexError):
    """Linear solver failures (dual-path: raised directly by solvers and
    wrapped by OptimizerError when surfaced through an optimizer, matching
    the reference's documented dual-path rule, error.rs:30-38)."""


class CameraModelError(ApexError):
    """Invalid camera parameters / projection domain errors."""


class IoError(ApexError):
    """Dataset / file format errors."""
