"""Golden parity: our WanDiT i2v variant vs the reference 14B torch WanModel
(wan/modules/model.py).

The 14B file differs from the 5B (wan23) one in three ways that this test
covers end to end: WanI2VCrossAttention (separate K/V for the 257 CLIP
tokens, summed before the output projection, wan/modules/model.py:336-400),
MLPProj on the CLIP features (wan/modules/model.py:529-541), and a scalar
per-batch timestep ([B], not per-token).

Only the unpacked forward is testable: the reference 14B packed branch
(rand_num_img>=0.4, wan/modules/model.py:768-910) references
``patch_embedding_2x``/``_4x``/... which its constructor never creates, so
that branch raises AttributeError in the reference itself. The working
reference path is ``rand_num_img < 0.4`` (grid RoPE, full-res tokens).
"""

import types

import numpy as np

from conftest import requires_reference


def _load_reference_14b():
    import torch  # noqa: F401

    from test_dit_golden import _install_stubs

    _install_stubs()
    attn_src = open("/root/reference/wan/modules/attention.py").read()
    attn_src = attn_src.replace(
        "assert q.device.type == 'cuda' and q.size(-1) <= 256",
        "assert q.size(-1) <= 256")
    attn_src = attn_src.replace("assert dtype in half_dtypes", "pass")
    attn_src = attn_src.replace("dtype=torch.bfloat16", "dtype=torch.float32")
    attn_mod = types.ModuleType("ref_wan_attention")
    exec(compile(attn_src, "ref_wan_attention.py", "exec"), attn_mod.__dict__)

    model_src = open("/root/reference/wan/modules/model.py").read()
    model_src = model_src.replace("from .attention import flash_attention", "")
    mod = types.ModuleType("ref_wan_model")
    mod.flash_attention = attn_mod.flash_attention
    exec(compile(model_src, "ref_model_14b.py", "exec"), mod.__dict__)
    return mod


@requires_reference
def test_i2v_unpacked_forward_matches_reference(rng_np):
    import torch

    import jax.numpy as jnp

    from yume_tpu.configs import DiTConfig
    from yume_tpu.models.dit import WanDiT
    from yume_tpu.utils.checkpoint import convert_dit_state_dict

    ref = _load_reference_14b()
    torch.manual_seed(0)
    # d = dim/heads = 12: rope splits 4/4/4; in_dim 8 = 4 latent + 4 cond.
    # The reference hardcodes 257 CLIP tokens (context[:, :257]) and
    # MLPProj(1280, dim), so those two are not shrinkable.
    tmodel = ref.WanModel(
        model_type="i2v", patch_size=(1, 2, 2), text_len=16, in_dim=8,
        dim=48, ffn_dim=96, freq_dim=32, text_dim=16, out_dim=4,
        num_heads=4, num_layers=2,
    ).eval()

    cfg = DiTConfig(
        model_type="i2v", patch_size=(1, 2, 2), text_len=16, in_dim=8,
        dim=48, ffn_dim=96, freq_dim=32, text_dim=16, out_dim=4,
        num_heads=4, num_layers=2, framepack=False,
        image_context_len=257, image_dim=1280,
    )
    params = convert_dit_state_dict(tmodel.state_dict(), 2)
    ours = WanDiT(cfg, dtype=jnp.float32)

    f, h, w = 3, 8, 8
    x = rng_np.standard_normal((4, f, h, w)).astype(np.float32)
    y = rng_np.standard_normal((4, f, h, w)).astype(np.float32)  # cond chans
    ctx = rng_np.standard_normal((16, 16)).astype(np.float32)
    clip = rng_np.standard_normal((1, 257, 1280)).astype(np.float32)
    tval = 457.0
    seq_len = f * (h // 2) * (w // 2)

    with torch.no_grad():
        want = tmodel(
            [torch.from_numpy(x)], t=torch.tensor([tval]),
            context=[torch.from_numpy(ctx)], seq_len=seq_len,
            clip_fea=torch.from_numpy(clip), y=[torch.from_numpy(y)],
            rand_num_img=0.0,
        )[0].numpy()  # [C_out, F, H, W]

    xy = np.concatenate([x, y], axis=0)  # forward concats x and y on channels
    xj = jnp.asarray(xy.transpose(1, 2, 3, 0))[None]  # [1, F, H, W, 8]
    tj = jnp.full((1, f), tval)
    cj = jnp.asarray(ctx)[None]
    got = ours.apply(params, xj, tj, cj, packed=False,
                     clip_context=jnp.asarray(clip), attn_impl="xla")
    got_t = np.asarray(got)[0].transpose(3, 0, 1, 2)
    assert got_t.shape == want.shape
    np.testing.assert_allclose(got_t, want, atol=2e-3, rtol=2e-3)
