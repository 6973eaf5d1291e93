"""On-device (TPU) test tier — run with `python -m pytest tests_tpu -m tpu`.

Unlike tests/ (which forces the virtual CPU mesh for exact-math parity),
this tier runs on the real chip: Pallas kernels vs their XLA oracles, and a
single-step pipeline smoke. Everything is marked ``tpu`` and skipped when no
TPU is attached, so the tier is safe to invoke anywhere.
"""

import jax
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: needs a real TPU device")


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() == "tpu"
    skip = pytest.mark.skip(reason="no TPU attached")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip)
