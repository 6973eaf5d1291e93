"""Wan2.2 VAE: shape tests + golden parity against the torch reference.

The parity tests import the reference vae2_2.py as an *oracle* (random
torch-initialised weights, converted to flax), and compare our full-clip
implementation against the reference's cached/streaming path — the only path
the reference uses in production.
"""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np

from conftest import requires_reference
from yume_tpu.configs import VAEConfig
from yume_tpu.models.vae import WanVAE, patchify, unpatchify
from yume_tpu.utils.checkpoint import convert_vae22_state_dict

TINY = VAEConfig(
    z_dim=8, base_dim=16, dim_mult=(1, 2, 4, 4), num_res_blocks=2,
    temporal_downsample=(False, True, True), stride=(4, 16, 16), patchify=2,
)


def _load_reference_vae():
    spec = importlib.util.spec_from_file_location(
        "ref_vae2_2", "/root/reference/wan23/modules/vae2_2.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_vae2_2"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_patchify_roundtrip(rng_np):
    x = jnp.asarray(rng_np.standard_normal((1, 2, 8, 8, 3)).astype(np.float32))
    y = patchify(x, 2)
    assert y.shape == (1, 2, 4, 4, 12)
    np.testing.assert_allclose(unpatchify(y, 2), x)


def test_encode_decode_shapes(rng_np):
    model = WanVAE(TINY, dec_dim=24)
    video = jnp.asarray(rng_np.standard_normal((1, 9, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)
    recon, z = model.apply(params, video)
    # stride (4, 16, 16): T 9→3, H/W 64→4
    assert z.shape == (1, 3, 4, 4, 8)
    assert recon.shape == video.shape


@requires_reference
def test_encoder_matches_reference(rng_np):
    import torch

    ref = _load_reference_vae()
    torch.manual_seed(0)
    tmodel = ref.WanVAE_(
        dim=16, dec_dim=24, z_dim=8, dim_mult=[1, 2, 4, 4], num_res_blocks=2,
        attn_scales=[], temperal_downsample=[False, True, True],
    ).eval()

    params = convert_vae22_state_dict(tmodel.state_dict())
    model = WanVAE(TINY, dec_dim=24)

    x = rng_np.standard_normal((1, 3, 9, 64, 64)).astype(np.float32)  # B C T H W
    with torch.no_grad():
        want = tmodel.encode(torch.from_numpy(x), scale=[0.0, 1.0]).numpy()

    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # → B T H W C
    got = model.apply(params, x_j, method=model.encode)
    got_t = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got_t, want, atol=2e-4, rtol=2e-3)


@requires_reference
def test_decoder_matches_reference(rng_np):
    import torch

    ref = _load_reference_vae()
    torch.manual_seed(1)
    tmodel = ref.WanVAE_(
        dim=16, dec_dim=24, z_dim=8, dim_mult=[1, 2, 4, 4], num_res_blocks=2,
        attn_scales=[], temperal_downsample=[False, True, True],
    ).eval()

    params = convert_vae22_state_dict(tmodel.state_dict())
    model = WanVAE(TINY, dec_dim=24)

    z = rng_np.standard_normal((1, 8, 3, 4, 4)).astype(np.float32)  # B C T H W
    with torch.no_grad():
        want = tmodel.decode(torch.from_numpy(z), scale=[0.0, 1.0]).numpy()

    z_j = jnp.asarray(z.transpose(0, 2, 3, 4, 1))
    got = model.apply(params, z_j, method=model.decode)
    got_t = np.asarray(got).transpose(0, 4, 1, 2, 3)
    assert got_t.shape == want.shape
    np.testing.assert_allclose(got_t, np.clip(want, -1, 1), atol=2e-4, rtol=2e-3)


def test_streaming_encode_matches_full_clip(rng_np):
    from yume_tpu.models.vae import streaming_encode

    model = WanVAE(TINY, dec_dim=24)
    video = jnp.asarray(rng_np.standard_normal((1, 9, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)
    full = model.apply(params, video, method=model.encode)
    stream = streaming_encode(model, params, video)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               atol=1e-4, rtol=1e-3)


def test_streaming_decode_matches_full_clip(rng_np):
    from yume_tpu.models.vae import streaming_decode

    model = WanVAE(TINY, dec_dim=24)
    video = jnp.zeros((1, 5, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), video)
    z = jnp.asarray(rng_np.standard_normal((1, 3, 2, 2, 8)).astype(np.float32))
    full = model.apply(params, z, method=model.decode)
    stream = streaming_decode(model, params, z)
    assert stream.shape == full.shape
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               atol=1e-4, rtol=1e-3)


def test_streaming_decode_multiframe_chunks(rng_np):
    """chunk_latent_frames > 1 (incl. a ragged tail chunk) is bit-compatible
    with the full-clip decode — the conv caches are chunk-length agnostic."""
    from yume_tpu.models.vae import streaming_decode

    model = WanVAE(TINY, dec_dim=24)
    video = jnp.zeros((1, 5, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), video)
    z = jnp.asarray(rng_np.standard_normal((1, 6, 2, 2, 8)).astype(np.float32))
    full = model.apply(params, z, method=model.decode)
    for k in (2, 3):  # 5 steady frames: 2+2+1 and 3+2 — both ragged tails
        stream = streaming_decode(model, params, z, chunk_latent_frames=k)
        assert stream.shape == full.shape
        np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                                   atol=1e-4, rtol=1e-3)


@requires_reference
def test_decoder_psnr_vs_reference(rng_np):
    """North-star quality check (BASELINE.md): per-frame PSNR of our decode
    vs the torch reference must be >= 35 dB (it is ~inf at fp32)."""
    import torch

    from yume_tpu.utils.metrics import per_frame_psnr

    ref = _load_reference_vae()
    torch.manual_seed(1)
    tmodel = ref.WanVAE_(
        dim=16, dec_dim=24, z_dim=8, dim_mult=[1, 2, 4, 4], num_res_blocks=2,
        attn_scales=[], temperal_downsample=[False, True, True],
    ).eval()
    params = convert_vae22_state_dict(tmodel.state_dict())
    model = WanVAE(TINY, dec_dim=24)

    z = rng_np.standard_normal((1, 8, 3, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = np.clip(tmodel.decode(torch.from_numpy(z), scale=[0.0, 1.0]).numpy(), -1, 1)
    got = np.asarray(model.apply(params, jnp.asarray(z.transpose(0, 2, 3, 4, 1)),
                                 method=model.decode)).transpose(0, 4, 1, 2, 3)
    p = per_frame_psnr(got, want, frame_axis=2)
    assert (p >= 35.0).all(), p


def _load_reference_vae21():
    spec = importlib.util.spec_from_file_location(
        "ref_vae21", "/root/reference/wan/modules/vae.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_vae21"] = mod
    spec.loader.exec_module(mod)
    return mod


TINY21 = VAEConfig(
    z_dim=4, base_dim=16, dim_mult=(1, 2, 4, 4), num_res_blocks=2,
    temporal_downsample=(True, True, False), stride=(4, 8, 8), patchify=1,
    arch="wan21",
)


@requires_reference
def test_wan21_encoder_matches_reference(rng_np):
    import torch

    from yume_tpu.utils.checkpoint import convert_vae21_state_dict

    ref = _load_reference_vae21()
    torch.manual_seed(3)
    tmodel = ref.WanVAE_(
        dim=16, z_dim=4, dim_mult=[1, 2, 4, 4], num_res_blocks=2,
        attn_scales=[], temperal_downsample=[True, True, False],
    ).eval()
    params = convert_vae21_state_dict(tmodel.state_dict())
    model = WanVAE(TINY21)

    x = rng_np.standard_normal((1, 3, 9, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tmodel.encode(torch.from_numpy(x), scale=[0.0, 1.0]).numpy()
    got = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                      method=model.encode)
    got_t = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got_t, want, atol=2e-4, rtol=2e-3)


@requires_reference
def test_wan21_decoder_matches_reference(rng_np):
    import torch

    from yume_tpu.utils.checkpoint import convert_vae21_state_dict

    ref = _load_reference_vae21()
    torch.manual_seed(4)
    tmodel = ref.WanVAE_(
        dim=16, z_dim=4, dim_mult=[1, 2, 4, 4], num_res_blocks=2,
        attn_scales=[], temperal_downsample=[True, True, False],
    ).eval()
    params = convert_vae21_state_dict(tmodel.state_dict())
    model = WanVAE(TINY21)

    z = rng_np.standard_normal((1, 4, 3, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = np.clip(tmodel.decode(torch.from_numpy(z), scale=[0.0, 1.0]).numpy(), -1, 1)
    got = model.apply(params, jnp.asarray(z.transpose(0, 2, 3, 4, 1)),
                      method=model.decode)
    got_t = np.asarray(got).transpose(0, 4, 1, 2, 3)
    assert got_t.shape == want.shape
    np.testing.assert_allclose(got_t, want, atol=2e-4, rtol=2e-3)
