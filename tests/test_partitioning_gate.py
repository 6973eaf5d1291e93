"""The auto-SPMD gate (ops/partitioning.py): GSPMD cannot auto-partition
Mosaic custom calls, so the dp/fsdp train step (plain jit + sharding
annotations) must trace the Pallas ops as their jnp fallbacks. The gate is
what keeps the production-shape fsdp program compilable on a real multi-chip
topology (scripts/aot_memory_witness.py; found by the round-5 AOT witness)."""

import jax
import jax.numpy as jnp
import numpy as np

from yume_tpu.ops import fused_adaln
from yume_tpu.ops.partitioning import auto_spmd, auto_spmd_scope, set_auto_spmd


def test_scope_and_setter():
    assert not auto_spmd()
    with auto_spmd_scope():
        assert auto_spmd()
        with auto_spmd_scope(False):
            assert not auto_spmd()
        assert auto_spmd()
    assert not auto_spmd()
    set_auto_spmd(True)
    assert auto_spmd()
    set_auto_spmd(False)


def test_gate_disables_pallas_dispatch():
    x = jnp.zeros((1, 8, 128), jnp.float32)
    idx = jnp.zeros((1, 8), jnp.int32)
    # on CPU the gate is moot (fallback either way) but the predicate must
    # honor it — on TPU this is what flips the kernels off
    with auto_spmd_scope():
        assert not fused_adaln._use_pallas(x, idx)


def test_gated_math_identical():
    """Gated (fallback) forward == ungated forward on this backend — the
    fallbacks are the same math by construction; this pins the plumbing."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 128))
    st = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 128))
    sh = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 128))
    idx = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, 3)
    want = fused_adaln.adaln_norm(x, st, sh, idx)
    with auto_spmd_scope():
        got = fused_adaln.adaln_norm(x, st, sh, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=0)

    from yume_tpu.ops.attention import attention

    q = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 2, 64))
    want = attention(q, q, q)
    with auto_spmd_scope():
        got = attention(q, q, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=0)
