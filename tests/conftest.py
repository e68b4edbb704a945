import os

# Tests run on CPU with 8 virtual devices so multi-chip sharding paths can be
# exercised without (and without monopolizing) TPU hardware. The harness may
# export JAX_PLATFORMS=axon (the tunneled TPU); override it BEFORE any jax
# backend initializes - two concurrent clients of the single tunneled chip
# deadlock.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()

from commet_tpu.config import enable_compile_cache  # noqa: E402

enable_compile_cache()

REFERENCE_DIR = "/root/reference"
