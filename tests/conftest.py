"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware. NOTE: in this environment the axon TPU
plugin ignores the JAX_PLATFORMS env var — jax.config.update is the only
reliable way to force the CPU backend, and XLA_FLAGS must be set before
the backend initializes.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# Tests never build the heavyweight random-init model stacks implicitly;
# model-specific tests construct tiny configs explicitly.
os.environ.setdefault("RAPIDDOC_DISABLE_LAYOUT", "1")
os.environ.setdefault("RAPIDDOC_DISABLE_FORMULA", "1")
os.environ.setdefault("RAPIDDOC_DISABLE_TABLE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
