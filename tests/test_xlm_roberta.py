"""XLM-RoBERTa text tower golden parity vs the reference torch model."""

import numpy as np

from conftest import load_reference_source, requires_reference


@requires_reference
def test_xlm_roberta_tokens_match(rng_np):
    """Compare the transformer token outputs (pre-pooling) directly by
    monkey-patching our module to skip the head."""
    import torch

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from yume_tpu.models import clip as clip_mod
    from yume_tpu.utils.checkpoint import convert_xlm_roberta_state_dict

    mod = load_reference_source("/root/reference/wan/modules/xlm_roberta.py")
    torch.manual_seed(0)
    tmodel = mod.XLMRoberta(
        vocab_size=128, max_seq_len=32, type_size=1, pad_id=1, dim=32,
        num_heads=4, num_layers=2, post_norm=True, dropout=0.0,
    ).eval()
    params = convert_xlm_roberta_state_dict(tmodel.state_dict(), 2)

    ids = rng_np.integers(2, 128, (2, 12)).astype(np.int64)
    ids[1, 8:] = 1
    with torch.no_grad():
        want = tmodel(torch.from_numpy(ids)).numpy()

    class TokensOnly(clip_mod.XLMRobertaText):
        @nn.compact
        def __call__(self, ids):
            # replicate the parent up to (not including) pooling
            b, s = ids.shape
            mask = (ids != self.pad_id).astype(jnp.int32)
            pos_ids = self.pad_id + jnp.cumsum(mask, axis=1) * mask
            x = nn.Embed(self.vocab_size, self.dim, name="token_embedding",
                         dtype=self.dtype)(ids)
            x = x + nn.Embed(1, self.dim, name="type_embedding",
                             dtype=self.dtype)(jnp.zeros_like(ids))
            x = x + nn.Embed(self.max_seq_len, self.dim, name="pos_embedding",
                             dtype=self.dtype)(pos_ids)
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
            n, d = self.num_heads, self.dim // self.num_heads
            attn_mask = jnp.where(mask[:, None, None, :] > 0, 0.0,
                                  jnp.finfo(jnp.float32).min)
            for i in range(self.num_layers):
                name = f"blocks_{i}"
                h = x
                q = nn.Dense(self.dim, name=f"{name}_q")(h).reshape(b, s, n, d)
                k = nn.Dense(self.dim, name=f"{name}_k")(h).reshape(b, s, n, d)
                v = nn.Dense(self.dim, name=f"{name}_v")(h).reshape(b, s, n, d)
                sc = jnp.einsum("bqnd,bknd->bnqk", q, k) * (d ** -0.5) + attn_mask
                p = jax.nn.softmax(sc, axis=-1)
                o = jnp.einsum("bnqk,bknd->bqnd", p, v).reshape(b, s, self.dim)
                o = nn.Dense(self.dim, name=f"{name}_o")(o)
                x = nn.LayerNorm(epsilon=1e-5, name=f"{name}_norm1")(x + o)
                f = nn.Dense(4 * self.dim, name=f"{name}_ffn0")(x)
                f = nn.gelu(f, approximate=False)
                f = nn.Dense(self.dim, name=f"{name}_ffn2")(f)
                x = nn.LayerNorm(epsilon=1e-5, name=f"{name}_norm2")(x + f)
            return x

    ours = TokensOnly(vocab_size=128, max_seq_len=32, pad_id=1, dim=32,
                      num_heads=4, num_layers=2, out_dim=16)
    got = ours.apply(params, jnp.asarray(ids))
    # compare only non-pad positions
    np.testing.assert_allclose(np.asarray(got)[0], want[0], atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got)[1, :8], want[1, :8], atol=3e-5, rtol=1e-4)
