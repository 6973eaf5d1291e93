"""umT5 encoder parity against the torch reference (random weights)."""

import jax.numpy as jnp
import numpy as np

from conftest import requires_reference
from yume_tpu.configs import T5Config
from yume_tpu.models.t5 import T5Encoder, relative_position_bucket
from yume_tpu.utils.checkpoint import convert_t5_state_dict

TINY = T5Config(vocab_size=128, dim=64, dim_attn=64, dim_ffn=96, num_heads=4,
                num_layers=2, num_buckets=32, text_len=16)


def test_bucket_symmetry():
    rel = np.arange(-200, 201)[None, :]
    b = relative_position_bucket(rel)
    assert b.min() >= 0 and b.max() < 32


@requires_reference
def test_encoder_matches_reference(rng_np):
    import torch

    from conftest import load_reference_source

    # the reference evaluates torch.cuda.current_device() in a default arg
    # at module-exec time (t5.py:477)
    torch.cuda.current_device = lambda: "cpu"
    mod = load_reference_source(
        "/root/reference/wan/modules/t5.py", strip_prefixes=("from .tokenizers",)
    )

    torch.manual_seed(0)
    tmodel = mod.T5Encoder(
        vocab=TINY.vocab_size, dim=TINY.dim, dim_attn=TINY.dim_attn,
        dim_ffn=TINY.dim_ffn, num_heads=TINY.num_heads, num_layers=TINY.num_layers,
        num_buckets=TINY.num_buckets, shared_pos=False, dropout=0.0,
    ).eval()

    params = convert_t5_state_dict(tmodel.state_dict(), TINY.num_layers)
    model = T5Encoder(TINY, dtype=jnp.float32)

    ids = rng_np.integers(0, TINY.vocab_size, (2, 16))
    mask = np.ones((2, 16), np.int64)
    mask[1, 10:] = 0
    with torch.no_grad():
        want = tmodel(torch.from_numpy(ids), torch.from_numpy(mask)).numpy()

    got = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    # only compare non-padding positions (reference returns unpadded slices)
    np.testing.assert_allclose(np.asarray(got)[0], want[0], atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got)[1, :10], want[1, :10], atol=3e-5, rtol=1e-4)
