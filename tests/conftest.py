import os

# Tests run on CPU with 8 virtual devices so multi-chip sharding paths can be
# exercised without TPU hardware. Must be set before jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REFERENCE_DIR = "/root/reference"
