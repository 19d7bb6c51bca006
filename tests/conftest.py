"""Test configuration: CPU backend with 8 virtual devices and x64 numerics.

Mirrors the reference's CPU-runnable validation strategy (SURVEY.md §4):
multi-chip sharding is exercised on a simulated 8-device mesh, and numerics
run in float64 for exact parity with the C implementation. The environment's
sitecustomize force-registers the TPU plugin before conftest runs, so the
backend is steered via jax.config (effective until first backend use) rather
than JAX_PLATFORMS.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
