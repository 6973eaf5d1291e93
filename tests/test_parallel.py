"""Multi-device tests on the virtual 8-device CPU mesh: Ulysses all-to-all,
ring attention, FSDP param sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from yume_tpu.ops.attention import xla_attention
from yume_tpu.parallel.mesh import make_mesh, shard_params
from yume_tpu.parallel.ulysses import sp_shard_map_attention

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _qkv(rng_np, b=1, l=64, n=8, d=16):
    mk = lambda: jnp.asarray(rng_np.standard_normal((b, l, n, d)).astype(np.float32))
    return mk(), mk(), mk()


def test_ulysses_matches_dense(rng_np):
    mesh = make_mesh(data=1, fsdp=1, sp=8)
    q, k, v = _qkv(rng_np)
    want = xla_attention(q, k, v)
    fn = sp_shard_map_attention(mesh, "ulysses", impl="xla")
    got = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_ring_matches_dense(rng_np):
    mesh = make_mesh(data=1, fsdp=1, sp=8)
    q, k, v = _qkv(rng_np)
    want = xla_attention(q, k, v)
    fn = sp_shard_map_attention(mesh, "ring")
    got = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_fsdp_param_sharding(rng_np):
    mesh = make_mesh(data=1, fsdp=8, sp=1)
    params = {
        "dense": {"kernel": jnp.zeros((1024, 256)), "bias": jnp.zeros((256,))},
        "small": {"w": jnp.zeros((4, 4))},
    }
    sharded = shard_params(params, mesh)
    k = sharded["dense"]["kernel"]
    assert k.sharding.spec == P("fsdp", None)
    # bias + small params replicate
    assert sharded["dense"]["bias"].sharding.spec == P()
    assert sharded["small"]["w"].sharding.spec == P()


def test_data_parallel_psum(rng_np):
    from jax.experimental.shard_map import shard_map

    mesh = make_mesh(data=8, fsdp=1, sp=1)
    x = jnp.arange(8.0)

    def f(x):
        return jax.lax.psum(x, "data")

    out = shard_map(
        f, mesh=mesh, in_specs=P("data"), out_specs=P("data"), check_rep=False
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.full((8,), 28.0))
