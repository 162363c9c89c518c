"""Test fixtures: force the CPU backend with 8 virtual devices BEFORE jax initializes,
so mesh-sharded code paths are exercised without TPU hardware (the standard JAX testing
recipe via --xla_force_host_platform_device_count).
"""
import os

# THR3ED_TEST_BACKEND=native opts OUT of the CPU forcing so the accelerator-only
# production gates (tests/test_production_quality.py) can run on the real chip:
#   THR3ED_TEST_BACKEND=native pytest tests/test_production_quality.py
_native = os.environ.get("THR3ED_TEST_BACKEND", "").lower() == "native"

if not _native:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _native:
    # the env var alone is not honored when a TPU PJRT plugin (axon) is
    # registered; the config update forces the CPU backend with the 8 virtual
    # devices from XLA_FLAGS
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from thr3ed_atom_tpu.utils.constants import SEED  # noqa: E402


@pytest.fixture(autouse=True)
def seed_everything():
    np.random.seed(SEED)


@pytest.fixture
def key():
    return jax.random.PRNGKey(SEED)


@pytest.fixture
def batch_size():
    return 32


@pytest.fixture
def num_samples():
    return 64
