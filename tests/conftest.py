"""Test environment: simulate an 8-device mesh on CPU.

The TPU-native answer to "test multi-node without a cluster" (SURVEY.md §4):
XLA host-platform device-count simulation. Must run before jax is imported.
"""

import os

# force CPU even if a TPU plugin hijacked the platform at interpreter start
# (the axon sitecustomize imports jax and sets jax_platforms itself):
# numerical parity tests need exact fp32 matmuls, and the virtual 8-device
# mesh only exists on the host platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

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


def load_reference_source(path, strip_prefixes=()):
    """Exec a reference file as a module, dropping package-relative imports
    (used to import reference modules standalone as numerical oracles)."""
    import types

    src = open(path).read()
    lines = [
        l for l in src.splitlines()
        if not any(l.strip().startswith(p) for p in strip_prefixes)
    ]
    mod = types.ModuleType("ref_" + os.path.basename(path).replace(".py", ""))
    mod.__dict__["HuggingfaceTokenizer"] = None  # lazily used only by loaders
    exec(compile("\n".join(lines), path, "exec"), mod.__dict__)
    return mod
