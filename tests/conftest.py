import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled, regardless of
# any attached accelerator: correctness/parity tests need f64, and the
# multi-chip sharding tests need multiple devices.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. axon); override
# in-process — env vars alone are not sufficient because the site config
# prepends the plugin platform.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
