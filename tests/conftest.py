"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths run everywhere (SURVEY.md section 4.3).

The environment may pin JAX_PLATFORMS to a tunneled TPU (sitecustomize);
jax.config.update after import wins over it, making tests hermetic."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
