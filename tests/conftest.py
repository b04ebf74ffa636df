import os
import pathlib

# Tests always run on CPU with a virtual 8-device mesh so multi-chip sharding
# paths are exercised without TPU hardware (SURVEY.md §4). In this image the
# axon TPU plugin ignores JAX_PLATFORMS from the environment, so the platform
# is forced through jax.config instead.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: test time here is dominated by
# single-core XLA compiles, and the same executables recompile on every
# run. Repeat runs (CI rounds, local iteration) hit the disk cache.
_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Marker tiers: the heavy cross-checks (large e2e parity solves that each
# compile several executables) are marked `slow` and deselected by default
# so a CI-style `pytest tests/ -q` finishes on one core; run them with
# `pytest -m slow` (they are part of the release bar, not abandoned).
