"""Profiling helpers.

Mirrors the reference's tracing/profiling affordances (src/logger.rs +
the `profiling` cargo profile + `--profile` CLI flag): a context manager
around jax.profiler traces and a simple wall-clock section timer with a
Ceres-style report — all zero-overhead when unused.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/apex_tpu_profile"):
    """Capture a jax profiler trace (view with TensorBoard / xprof)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"[apex-tpu] profiler trace written to {log_dir}")


class SectionTimer:
    """Accumulating wall-clock timer: timer.section('assemble'): ..."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = [f"{'section':>20} {'calls':>7} {'total':>10} {'mean':>10}"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:>20} {n:>7} {t*1e3:>9.2f}m {t/n*1e3:>9.3f}m")
        return "\n".join(lines)


def annotate(name: Optional[str] = None):
    """Decorator adding a jax.named_scope (shows up in profiler traces)."""
    import functools

    import jax

    def deco(fn):
        scope = name or fn.__name__

        @functools.wraps(fn)
        def wrapper(*args, **kw):
            with jax.named_scope(scope):
                return fn(*args, **kw)

        return wrapper

    return deco
