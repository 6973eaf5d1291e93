"""14B i2v/v2v training-path tests.

Covers the round-3 gap from VERDICT.md: the i2v loss (msk/y + CLIP
conditioning, tail-only 16-ch regression — reference
hyvideo/diffusion/flow/transport.py:164-205, fastvideo/distill_model.py:
262-318, wan/image2video.py:211-402), the host-side rand_num_img branch,
and composition with MVDT + ADD distillation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yume_tpu.configs import (CLIPConfig, DiTConfig, PipelineConfig, T5Config,
                              VAEConfig)
from yume_tpu.training.i2v_batch import (build_i2v_train_batch,
                                         synthetic_i2v_batch, trim_s0n1)
from yume_tpu.training.train_step import (TrainConfig, init_train_state,
                                          make_loss_fn, make_train_step)

Z, MASK_CH, LFZ = 8, 2, 2
CFG = DiTConfig(model_type="i2v", in_dim=Z + MASK_CH + Z, out_dim=Z, dim=64,
                ffn_dim=128, freq_dim=32, text_dim=16, num_heads=4,
                num_layers=2, framepack=True, mvdt=True,
                image_context_len=5, image_dim=12)


def _setup(mvdt=False):
    from yume_tpu.models.dit import WanDiT

    dit = WanDiT(CFG, dtype=jnp.float32)
    b, f, h, w = 2, 4, 8, 8
    x = jnp.zeros((b, f, h, w, CFG.in_dim))
    t = jnp.zeros((b, f))
    ctx = jnp.zeros((b, 8, CFG.text_dim))
    clip_ctx = jnp.zeros((b, CFG.image_context_len, CFG.image_dim))
    kw = dict(clip_context=clip_ctx)
    if mvdt:
        kw.update(mvdt_rng=jax.random.PRNGKey(0), mvdt_keep=40)
    params = dit.init(jax.random.PRNGKey(0), x, t, ctx, packed=True,
                      latent_frame_zero=LFZ, **kw)
    tc = TrainConfig(learning_rate=1e-3, latent_frame_zero=LFZ, mvdt=mvdt)
    batch = synthetic_i2v_batch(jax.random.PRNGKey(1), b=b, f=f, h=h, w=w,
                                z_dim=Z, mask_ch=MASK_CH, text_len=8,
                                text_dim=CFG.text_dim,
                                image_context_len=CFG.image_context_len,
                                image_dim=CFG.image_dim)
    return dit, params, tc, batch


def test_i2v_train_step_runs_and_loss_decreases():
    dit, params, tc, batch = _setup()
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(dit.apply, tc, packed=True))
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(100))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_i2v_loss_golden_math():
    """The loss must implement the reference training_losses math exactly
    (transport.py:164-205 with reverse=True linear path + distill_model's
    y/clip conditioning): xt = (1−t)x1 + t·x0 noised over ALL frames, DiT
    input = cat([xt, y]), scalar t per sample, MSE over the trailing
    latent_frame_zero frames of the 16-ch velocity vs ut = x0 − x1, and
    denoised tail x̂₁ = xt − t·v̂. Verified with a recording mock model and
    an independent numpy transcription of those formulas (b=2 ≥ 1)."""
    b, f, h, w = 2, 4, 8, 8
    tc = TrainConfig(latent_frame_zero=LFZ, shift=3.0)
    batch = synthetic_i2v_batch(jax.random.PRNGKey(5), b=b, f=f, h=h, w=w,
                                z_dim=Z, mask_ch=MASK_CH, text_len=8,
                                text_dim=16, image_context_len=5,
                                image_dim=12)
    recorded = {}

    def mock_apply(params, x_in, t_frame, ctx, *, packed, latent_frame_zero,
                   clip_context=None, **kw):
        recorded["x_in"] = x_in
        recorded["t_frame"] = t_frame
        recorded["clip"] = clip_context
        # deterministic "velocity": linear in the input so grads exist
        return (2.0 * x_in[..., :Z] - 0.5 * x_in[..., Z:2 * Z]
                )[:, -latent_frame_zero:]

    loss_fn = make_loss_fn(mock_apply, tc, packed=True)
    rng = jax.random.PRNGKey(123)
    loss, denoised = loss_fn(None, batch, rng)

    # independent oracle from the recorded trace --------------------------
    x_in = np.asarray(recorded["x_in"], np.float64)
    t_frame = np.asarray(recorded["t_frame"], np.float64)
    # scalar-per-sample t broadcast over frames (reference t*1000)
    assert np.allclose(t_frame, t_frame[:, :1]), "t must be per-sample scalar"
    t = t_frame[:, 0] / 1000.0
    x1 = np.asarray(batch["latents"], np.float64)
    y = np.asarray(batch["y"], np.float64)
    # input layout: [xt, y]
    assert np.allclose(x_in[..., Z:], y, atol=1e-6)
    xt = x_in[..., :Z]
    # invert the path plan for x0: xt = (1−t)x1 + t·x0
    tb = t[:, None, None, None, None]
    x0 = (xt - (1.0 - tb) * x1) / tb
    ut = x0 - x1
    v = 2.0 * xt - 0.5 * y[..., :Z]
    v_tail = v[:, -LFZ:]
    expect_loss = np.mean((v_tail - ut[:, -LFZ:]) ** 2)
    expect_denoised = xt[:, -LFZ:] - tb * v_tail
    assert recorded["clip"] is not None  # CLIP context reaches the model
    np.testing.assert_allclose(float(loss), expect_loss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(denoised), expect_denoised,
                               rtol=2e-4, atol=1e-5)


def test_i2v_mvdt_composes():
    dit, params, tc, batch = _setup(mvdt=True)
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(dit.apply, tc, packed=True, mvdt_keep=40))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_i2v_distill_composes_and_gan_grads_reach_dit():
    import optax

    from yume_tpu.training.distill import init_disc_state, make_distill_train_step

    dit, params, tc, batch = _setup()
    b, f, h, w = batch["latents"].shape[:4]
    d_opt = optax.adamw(1e-4)
    disc, disc_state = init_disc_state(jax.random.PRNGKey(7), d_opt,
                                       latent_hw=(h, w), z_dim=Z)
    state = init_train_state(params, tc)
    step = jax.jit(make_distill_train_step(dit.apply, tc, disc, d_opt,
                                           packed=True))
    state, disc_state, metrics = step(state, disc_state, batch,
                                      jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["gan_loss"]))


# -- batch construction ------------------------------------------------------

def _tiny_pipe():
    from yume_tpu.pipelines.i2v import I2VPipeline

    cfg = PipelineConfig(
        name="smoke-i2v", dit=CFG,
        vae=VAEConfig(z_dim=Z, base_dim=8, dim_mult=(1, 2, 2),
                      num_res_blocks=1, temporal_downsample=(True, False),
                      stride=(2, 4, 4), patchify=1, arch="wan21"),
        t5=T5Config(vocab_size=256, dim=16, dim_attn=16, dim_ffn=24,
                    num_heads=2, num_layers=1, text_len=16),
        clip=CLIPConfig(image_size=16, patch_size=8, dim=12, num_heads=2,
                        num_layers=1, out_tokens=5),
        latent_frame_zero=LFZ)
    return I2VPipeline.from_config(
        cfg, jax.random.PRNGKey(0), init_clip=True, init_dit=False,
        dtype=jnp.float32)


def test_trim_s0n1():
    assert trim_s0n1(35, 4) == 33
    assert trim_s0n1(33, 4) == 33
    assert trim_s0n1(36, 4) == 33
    assert trim_s0n1(37, 4) == 37
    assert trim_s0n1(8, 2) == 7


@pytest.mark.parametrize("rand", [0.2, 0.9])
def test_build_i2v_batch(rand):
    pipe = _tiny_pipe()
    s0 = pipe.config.vae.stride[0]  # 2
    frame_zero = (LFZ - 1) * s0 + 1  # 3
    b, f_px, hw = 1, 11, 16
    video = jax.random.uniform(jax.random.PRNGKey(3),
                               (b, f_px, hw, hw, 3), minval=-1, maxval=1)
    ctx = jnp.zeros((b, 16, 16))
    batch = build_i2v_train_batch(pipe, video, ctx, rand_num_img=rand)
    s0 = 2
    if rand < 0.4:
        # i2v branch: 4·s0 pseudo-history + frame_zero tail = 11 px frames
        f_eff = 4 * s0 + frame_zero
    else:
        f_eff = trim_s0n1(f_px, s0)
    f_lat = (f_eff + s0 - 1) // s0
    assert batch["latents"].shape == (b, f_lat, hw // 4, hw // 4, Z)
    assert batch["y"].shape == (b, f_lat, hw // 4, hw // 4, s0 + Z)
    assert batch["clip_context"].shape == (b, 5, 12)
    assert np.isfinite(np.asarray(batch["latents"])).all()
    # msk channels: history latent frames 1, strictly-tail frames 0, and the
    # boundary latent frame STRADDLES — the reference's repeat_interleave/
    # view groups the last s0−1 history pixels with the first tail pixel,
    # giving [1]*(s0−1)+[0] (wan/image2video.py:306-320)
    msk = np.asarray(batch["y"][..., :s0])
    assert (msk[:, -LFZ + 1:] == 0).all()
    np.testing.assert_array_equal(msk[0, -LFZ, 0, 0],
                                  [1.0] * (s0 - 1) + [0.0])
    assert (msk[:, : f_lat - LFZ] == 1).all()


def test_build_i2v_batch_short_clip_forces_i2v():
    """Clips ≤ frame_zero force the i2v branch (reference
    distill_model.py:262-263)."""
    pipe = _tiny_pipe()
    video = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 16, 16, 3),
                               minval=-1, maxval=1)
    ctx = jnp.zeros((1, 16, 16))
    batch = build_i2v_train_batch(pipe, video, ctx, rand_num_img=0.9)
    # i2v branch: 8 pseudo-history + 3 tail = 11 px → 6 latent frames
    assert batch["latents"].shape[1] == 6


def test_build_i2v_batch_too_short_raises():
    """A clip shorter than frame_zero after the s0·n+1 trim cannot form the
    static i2v tail — must fail loudly, not slice an empty history."""
    pipe = _tiny_pipe()
    video = jax.random.uniform(jax.random.PRNGKey(5), (1, 1, 16, 16, 3),
                               minval=-1, maxval=1)
    ctx = jnp.zeros((1, 16, 16))
    with pytest.raises(ValueError, match="too short"):
        build_i2v_train_batch(pipe, video, ctx, rand_num_img=0.9)


def test_msk_matches_reference_construction():
    """build_mask_channels (v2v, cond_pixel_frames>1) must reproduce the
    reference's repeat_interleave/view/transpose msk exactly
    (wan/image2video.py:306-320)."""
    import torch

    from yume_tpu.pipelines.i2v import build_mask_channels

    frame_num, lat_h, lat_w, frame_zero = 17, 4, 6, 9
    ours = np.asarray(build_mask_channels(
        frame_num, lat_h, lat_w, cond_pixel_frames=frame_num - frame_zero,
        batch=1, stride_t=4))

    msk = torch.ones(1, frame_num, lat_h, lat_w)
    msk[:, -frame_zero:] = 0
    msk = torch.concat(
        [torch.repeat_interleave(msk[:, 0:1], repeats=4, dim=1), msk[:, 1:]],
        dim=1)
    msk = msk.view(1, msk.shape[1] // 4, 4, lat_h, lat_w)
    ref = msk.transpose(1, 2)[0]  # [4, F_lat, h, w] channel-major
    # ours is channels-last [1, F_lat, h, w, 4]
    np.testing.assert_array_equal(
        ours[0].transpose(3, 0, 1, 2), ref.numpy())


def test_i2v_driver_smoke(tmp_path):
    """`train.py --config i2v-14B --smoke` runs end-to-end (the round-2
    crash: out_dim-16 velocity vs in_dim-36 target, VERDICT.md missing #1)."""
    from yume_tpu import train as train_mod

    rc = train_mod.main([
        "--config", "i2v-14B", "--smoke", "--max_train_steps", "2",
        "--checkpointing_steps", "0", "--validation_steps", "2",
        "--output_dir", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "generated_test_video").exists()


def test_i2v_driver_smoke_mvdt_distil(tmp_path):
    from yume_tpu import train as train_mod

    rc = train_mod.main([
        "--config", "i2v-14B", "--smoke", "--MVDT", "--Distil",
        "--max_train_steps", "2", "--checkpointing_steps", "0",
        "--output_dir", str(tmp_path)])
    assert rc == 0
