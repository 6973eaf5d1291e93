"""Golden parity: our WanDiT vs the reference torch WanModel (5B variant).

The reference model imports diffusers and flash-attn; neither exists here,
so the test installs minimal stubs (ConfigMixin/ModelMixin no-ops and a
torch-SDPA varlen flash_attn) and then execs the reference
wan23/modules/model.py as the numerical oracle. Covers BOTH forward modes:
flag=False (unpacked, per-frame timesteps) and flag=True (FramePack packed
history + tail), end to end through RoPE, AdaLN modulation, attention,
FFN, head and unpatchify.
"""

import sys
import types

import numpy as np
import pytest

from conftest import requires_reference


def _install_stubs():
    import torch

    # diffusers stubs
    diffusers = types.ModuleType("diffusers")
    cfg_utils = types.ModuleType("diffusers.configuration_utils")
    mdl_utils = types.ModuleType("diffusers.models.modeling_utils")
    models_pkg = types.ModuleType("diffusers.models")

    class ConfigMixin:
        pass

    def register_to_config(fn):
        return fn

    cfg_utils.ConfigMixin = ConfigMixin
    cfg_utils.register_to_config = register_to_config
    mdl_utils.ModelMixin = torch.nn.Module
    models_pkg.modeling_utils = mdl_utils
    diffusers.configuration_utils = cfg_utils
    diffusers.models = models_pkg
    sys.modules.setdefault("diffusers", diffusers)
    sys.modules["diffusers.configuration_utils"] = cfg_utils
    sys.modules["diffusers.models"] = models_pkg
    sys.modules["diffusers.models.modeling_utils"] = mdl_utils

    # flash_attn stub: varlen API on top of torch SDPA
    fa = types.ModuleType("flash_attn")

    def flash_attn_varlen_func(q, k, v, cu_seqlens_q, cu_seqlens_k,
                               max_seqlen_q, max_seqlen_k, dropout_p=0.0,
                               softmax_scale=None, causal=False,
                               window_size=(-1, -1), deterministic=False):
        outs = []
        for i in range(len(cu_seqlens_q) - 1):
            qs, qe = int(cu_seqlens_q[i]), int(cu_seqlens_q[i + 1])
            ks, ke = int(cu_seqlens_k[i]), int(cu_seqlens_k[i + 1])
            qi = q[qs:qe].transpose(0, 1).unsqueeze(0)  # [1, n, lq, d]
            ki = k[ks:ke].transpose(0, 1).unsqueeze(0)
            vi = v[ks:ke].transpose(0, 1).unsqueeze(0)
            oi = torch.nn.functional.scaled_dot_product_attention(
                qi, ki, vi, scale=softmax_scale, is_causal=causal)
            outs.append(oi.squeeze(0).transpose(0, 1))  # [lq, n, d]
        return torch.cat(outs, dim=0)

    fa.flash_attn_varlen_func = flash_attn_varlen_func
    sys.modules.setdefault("flash_attn", fa)


def _load_reference_model():
    _install_stubs()

    # exec the reference attention with CPU/fp32 patches (it asserts CUDA
    # and downcasts to bf16, both irrelevant for an oracle run)
    attn_src = open("/root/reference/wan23/modules/attention.py").read()
    attn_src = attn_src.replace(
        "assert q.device.type == 'cuda' and q.size(-1) <= 256",
        "assert q.size(-1) <= 256")
    attn_src = attn_src.replace("assert dtype in half_dtypes", "pass")
    attn_src = attn_src.replace("dtype=torch.bfloat16", "dtype=torch.float32")
    attn_mod = types.ModuleType("ref_wan23_attention")
    exec(compile(attn_src, "ref_attention.py", "exec"), attn_mod.__dict__)
    model_src = open("/root/reference/wan23/modules/model.py").read()
    model_src = model_src.replace("from .attention import flash_attention", "")
    mod = types.ModuleType("ref_wan23_model")
    mod.flash_attention = attn_mod.flash_attention
    exec(compile(model_src, "ref_model.py", "exec"), mod.__dict__)
    return mod


TINY = dict(model_type="ti2v", patch_size=(1, 2, 2), text_len=16, in_dim=8,
            dim=48, ffn_dim=96, freq_dim=32, text_dim=16, out_dim=8,
            num_heads=4, num_layers=2)


def _build_pair():
    import torch

    import jax.numpy as jnp

    from yume_tpu.configs import DiTConfig
    from yume_tpu.models.dit import WanDiT
    from yume_tpu.utils.checkpoint import convert_dit_state_dict

    ref_mod = _load_reference_model()
    torch.manual_seed(0)
    tmodel = ref_mod.WanModel(**TINY).eval()

    cfg = DiTConfig(
        model_type="ti2v", patch_size=(1, 2, 2), text_len=16, in_dim=8,
        dim=48, ffn_dim=96, freq_dim=32, text_dim=16, out_dim=8, num_heads=4,
        num_layers=2, framepack=True,
    )
    params = convert_dit_state_dict(tmodel.state_dict(), 2)
    ours = WanDiT(cfg, dtype=jnp.float32)
    return tmodel, ours, params


@requires_reference
def test_unpacked_forward_matches_reference(rng_np):
    import torch

    import jax.numpy as jnp

    tmodel, ours, params = _build_pair()
    f, h, w = 3, 8, 8
    x = rng_np.standard_normal((8, f, h, w)).astype(np.float32)  # [C, F, H, W]
    ctx = rng_np.standard_normal((16, 16)).astype(np.float32)    # [L_txt, C_txt]
    tval = 457.0
    seq_len = f * (h // 2) * (w // 2)

    with torch.no_grad():
        want = tmodel(
            [torch.from_numpy(x)], t=torch.tensor([tval]),
            context=[torch.from_numpy(ctx)], seq_len=seq_len, flag=False,
        )[0].numpy()  # [C, F, H, W]

    xj = jnp.asarray(x.transpose(1, 2, 3, 0))[None]  # [1, F, H, W, C]
    tj = jnp.full((1, f), tval)
    cj = jnp.asarray(ctx)[None]
    got = ours.apply(params, xj, tj, cj, packed=False, attn_impl="xla")
    got_t = np.asarray(got)[0].transpose(3, 0, 1, 2)
    np.testing.assert_allclose(got_t, want, atol=2e-3, rtol=2e-3)


@requires_reference
@pytest.mark.parametrize("f_hist", [3, 8])
def test_packed_forward_matches_reference(rng_np, f_hist):
    import torch

    import jax.numpy as jnp

    tmodel, ours, params = _build_pair()
    lfz = 2
    f = f_hist + lfz
    h, w = 8, 8
    x = rng_np.standard_normal((8, f, h, w)).astype(np.float32)
    ctx = rng_np.standard_normal((16, 16)).astype(np.float32)
    t_hist, t_tail = 0.0, 623.0
    seq_len = f * (h // 2) * (w // 2)
    # per-token t vector: the packed reference reads only t[0] and t[-1]
    tvec = np.full((1, seq_len), t_hist, np.float32)
    tvec[:, -1] = t_tail

    with torch.no_grad():
        want = tmodel(
            [torch.from_numpy(x)], t=torch.from_numpy(tvec),
            context=[torch.from_numpy(ctx)], seq_len=seq_len,
            latent_frame_zero=lfz, flag=True,
        )[0].numpy()  # [C, lfz, H, W]

    xj = jnp.asarray(x.transpose(1, 2, 3, 0))[None]
    tj = jnp.concatenate([jnp.full((1, f_hist), t_hist),
                          jnp.full((1, lfz), t_tail)], axis=1)
    cj = jnp.asarray(ctx)[None]
    got = ours.apply(params, xj, tj, cj, packed=True, latent_frame_zero=lfz,
                     attn_impl="xla")
    got_t = np.asarray(got)[0].transpose(3, 0, 1, 2)
    assert got_t.shape == want.shape
    np.testing.assert_allclose(got_t, want, atol=2e-3, rtol=2e-3)


@requires_reference
def test_unpacked_per_token_timesteps_match_reference(rng_np):
    """Validates the compact per-frame AdaLN modulation against the
    reference's true per-token computation (the [B, L, 6, dim] path,
    wan23/modules/model.py:801-812) with DIFFERENT timesteps per frame —
    the diffusion-forcing inference configuration."""
    import torch

    import jax.numpy as jnp

    tmodel, ours, params = _build_pair()
    f, h, w = 3, 8, 8
    tokens_per_frame = (h // 2) * (w // 2)
    x = rng_np.standard_normal((8, f, h, w)).astype(np.float32)
    ctx = rng_np.standard_normal((16, 16)).astype(np.float32)
    t_frames = np.array([0.0, 311.0, 856.0], np.float32)
    tvec = np.repeat(t_frames, tokens_per_frame)[None]  # [1, L] per-token

    with torch.no_grad():
        want = tmodel(
            [torch.from_numpy(x)], t=torch.from_numpy(tvec),
            context=[torch.from_numpy(ctx)], seq_len=tvec.shape[1], flag=False,
        )[0].numpy()

    xj = jnp.asarray(x.transpose(1, 2, 3, 0))[None]
    tj = jnp.asarray(t_frames)[None]
    cj = jnp.asarray(ctx)[None]
    got = ours.apply(params, xj, tj, cj, packed=False, attn_impl="xla")
    got_t = np.asarray(got)[0].transpose(3, 0, 1, 2)
    np.testing.assert_allclose(got_t, want, atol=2e-3, rtol=2e-3)
