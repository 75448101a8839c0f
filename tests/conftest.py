"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths run everywhere (SURVEY.md section 4.3)."""

import os

# Must be set before jax is imported anywhere in the test process.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
