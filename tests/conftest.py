"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding is exercised on CPU via
``--xla_force_host_platform_device_count=8`` (the standard JAX trick; the
reference has no multi-device tests to mirror — it has no tests at all,
SURVEY.md §4).
"""

import os

# Force-override: the environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel); unit tests must run on local CPU with virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
