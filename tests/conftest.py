import os

# Tests run on a virtual 8-device CPU mesh so sharded code paths are exercised
# without TPU hardware. XLA_FLAGS must be set before the backend initializes;
# the axon TPU plugin ignores JAX_PLATFORMS, so the platform is forced through
# jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
