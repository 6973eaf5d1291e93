"""CLIP ViT visual tower golden parity vs the reference torch model."""

import types

import numpy as np

from conftest import requires_reference


def _load_reference_clip():
    """Exec reference wan/modules/clip.py with CPU patches: the flash-attn
    wrapper asserts CUDA, torchvision/tokenizers imports are stripped."""
    import torch

    attn_src = open("/root/reference/wan/modules/attention.py").read()
    attn_src = attn_src.replace(
        "assert q.device.type == 'cuda' and q.size(-1) <= 256",
        "assert q.size(-1) <= 256")
    attn_src = attn_src.replace("assert dtype in half_dtypes", "pass")
    attn_src = attn_src.replace("dtype=torch.bfloat16", "dtype=torch.float32")
    attn_mod = types.ModuleType("ref_wan_attention")
    # wan/modules/attention.py requires flash_attn; reuse the SDPA stub
    import sys

    from test_dit_golden import _install_stubs

    _install_stubs()
    exec(compile(attn_src, "ref_wan_attention.py", "exec"), attn_mod.__dict__)

    clip_src = open("/root/reference/wan/modules/clip.py").read()
    for line in ("import torchvision.transforms as T",
                 "from .attention import flash_attention",
                 "from .tokenizers import HuggingfaceTokenizer",
                 "from .xlm_roberta import XLMRoberta"):
        clip_src = clip_src.replace(line, "")
    mod = types.ModuleType("ref_wan_clip")
    mod.flash_attention = attn_mod.flash_attention
    mod.XLMRoberta = object
    exec(compile(clip_src, "ref_wan_clip.py", "exec"), mod.__dict__)
    return mod


@requires_reference
def test_clip_visual_matches_reference(rng_np):
    import torch

    import jax.numpy as jnp

    from yume_tpu.configs import CLIPConfig
    from yume_tpu.models.clip import CLIPVisual
    from yume_tpu.utils.checkpoint import convert_clip_visual_state_dict

    mod = _load_reference_clip()
    torch.manual_seed(0)
    tmodel = mod.VisionTransformer(
        image_size=28, patch_size=14, dim=32, mlp_ratio=4, out_dim=16,
        num_heads=4, num_layers=3, pool_type="token", pre_norm=True,
        post_norm=False, activation="gelu", attn_dropout=0.0,
        proj_dropout=0.0, embedding_dropout=0.0,
    ).eval()

    cfg = CLIPConfig(image_size=28, patch_size=14, dim=32, mlp_ratio=4.0,
                     num_heads=4, num_layers=3, out_tokens=5)
    params = convert_clip_visual_state_dict(tmodel.state_dict(), num_layers=3,
                                            prefix="")
    ours = CLIPVisual(cfg, dtype=jnp.float32)

    x = rng_np.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), use_31_block=True).numpy()

    got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got.shape == want.shape  # [B, 5 tokens, 32]
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)
