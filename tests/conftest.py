"""Test configuration.

Sharding tests want an 8-device virtual CPU mesh. NOTE: on the TPU dev
machine the axon PJRT plugin pins the platform at interpreter startup
(sitecustomize), so env vars set here cannot switch to CPU — run

    PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest

(or `make test`) for the CPU mesh. Plain `python -m pytest tests/` runs on
whatever platform is pinned (single real TPU chip included) — all tests
except the multi-device sharding ones work there too; those skip.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
    config.addinivalue_line(
        "markers", "multidevice: needs >= 8 JAX devices (CPU mesh)")


def pytest_runtest_setup(item):
    if item.get_closest_marker("multidevice"):
        import jax
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices (run with the CPU mesh, see "
                        "tests/conftest.py)")
