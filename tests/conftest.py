"""Test config: run on CPU with 8 virtual devices so multi-chip sharding paths
are exercised without TPU hardware (the driver separately dry-runs them)."""

import os

# Force CPU: the ambient environment points JAX at the real TPU (axon), whose
# default f32 matmul precision is reduced — numerics tests need exact f32.
# The env var alone is not enough here (a startup hook initialises the axon
# plugin before conftest runs), so also set it through jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on CPU, got " + jax.default_backend())

REFERENCE = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE, *parts)
