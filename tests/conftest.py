"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding paths
(camera-DP shard_map, Gaussian-axis sharding) are exercised without a TPU pod
— the "fake backend" strategy from SURVEY.md §4.4.

The container's sitecustomize force-selects the axon TPU backend via
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start, so
plain JAX_PLATFORMS env overrides are ignored; we override the config value
back to cpu here, before any backend is initialized by test code.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
