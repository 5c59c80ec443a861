"""Test configuration: force CPU backend with 8 virtual devices, float64.

The container's sitecustomize registers an `axon` TPU backend at interpreter
startup; tests must run on CPU (multi-device virtual mesh) so we override the
platform list after import. float64 matches the reference's double precision
for oracle comparisons.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running statistical/e2e test (deselect with "
        "-m 'not slow')")
