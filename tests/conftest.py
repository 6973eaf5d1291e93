"""Test environment: simulate an 8-device mesh on CPU.

The TPU-native answer to "test multi-node without a cluster" (SURVEY.md §4):
XLA host-platform device-count simulation. Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="torch reference checkout not available"
)


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
