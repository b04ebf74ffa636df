import os

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
