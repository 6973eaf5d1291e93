"""ADD distillation step: GAN gradients must reach the DiT, the D step must
train on the one-step denoised tail, and the DINO converter must round-trip
torch ViT-S/16 weights (reference fastvideo/distill_model.py:306-366,
ADD/models/discriminator.py:145)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from yume_tpu.configs import DiTConfig
from yume_tpu.models.dit import WanDiT
from yume_tpu.training.distill import (init_disc_state,
                                       make_distill_train_step)
from yume_tpu.training.train_step import TrainConfig, init_train_state


@pytest.fixture(scope="module")
def distill_setup():
    cfg = DiTConfig(
        model_type="ti2v", in_dim=4, out_dim=4, dim=32, ffn_dim=64,
        freq_dim=16, text_dim=8, text_len=6, num_heads=2, num_layers=2,
        framepack=True,
    )
    dit = WanDiT(cfg, dtype=jnp.float32)
    lfz = 2
    b, f, h, w = 1, 3 + lfz, 8, 8
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, f, h, w, cfg.in_dim))
    t = jnp.zeros((b, f))
    ctx = jax.random.normal(rng, (b, cfg.text_len, cfg.text_dim)) * 0.1
    params = dit.init(jax.random.PRNGKey(1), x, t, ctx, packed=True,
                      latent_frame_zero=lfz)
    tc = TrainConfig(latent_frame_zero=lfz)
    d_opt = optax.adamw(1e-4)
    disc, disc_state = init_disc_state(jax.random.PRNGKey(2), d_opt,
                                       latent_hw=(h, w), z_dim=cfg.out_dim)
    batch = {"latents": x, "context": ctx}
    return dit, params, tc, disc, d_opt, disc_state, batch


def test_distill_step_runs_and_gan_grads_reach_dit(distill_setup):
    dit, params, tc, disc, d_opt, disc_state, batch = distill_setup
    rng = jax.random.PRNGKey(3)
    state = init_train_state(params, tc)

    step0 = make_distill_train_step(dit.apply, tc, disc, d_opt, packed=True,
                                    gan_weight=0.0)
    step1 = make_distill_train_step(dit.apply, tc, disc, d_opt, packed=True,
                                    gan_weight=10.0)
    s0, ds0, m0 = jax.jit(step0)(state, disc_state, batch, rng)
    s1, ds1, m1 = jax.jit(step1)(state, disc_state, batch, rng)

    for m, ds in ((m0, ds0), (m1, ds1)):
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["d_loss"]))
    # same data+rng, different gan weight ⇒ different DiT grads ⇒ the GAN
    # term's gradient flows into the generator (the round-1 bug was a GAN
    # term that never touched the DiT)
    g0 = float(m0["grad_norm"])
    g1 = float(m1["grad_norm"])
    assert abs(float(m0["flow_loss"]) - float(m1["flow_loss"])) < 1e-6
    assert g0 != pytest.approx(g1, rel=1e-6), (g0, g1)
    # and gan_loss scales with the weight
    assert float(m0["gan_loss"]) == 0.0
    assert float(m1["gan_loss"]) != 0.0


def test_disc_trains_on_denoised_tail(distill_setup):
    """d_loss must respond to generator quality: with the same disc, a step
    on a batch produces a d_loss strictly below the 2.0 hinge plateau after
    a few updates (the discriminator separates real tail from x̂₁)."""
    dit, params, tc, disc, d_opt, disc_state, batch = distill_setup
    state = init_train_state(params, tc)
    step = jax.jit(make_distill_train_step(dit.apply, tc, disc, d_opt,
                                           packed=True))
    losses = []
    for i in range(6):
        state, disc_state, m = step(state, disc_state, batch,
                                    jax.random.PRNGKey(10 + i))
        losses.append(float(m["d_loss"]))
    assert all(np.isfinite(l) for l in losses)
    # hinge starts at ~2.0 for an uninformative D and decreases as D learns
    assert losses[-1] < losses[0], losses


def test_dino_converter_golden():
    """Converter + DinoViT vs an inline torch implementation of the timm
    ViT-S/16 forward (pre-norm blocks, exact-GELU MLP) with random weights in
    the dino_deitsmall16_pretrain.pth key layout."""
    import torch

    from yume_tpu.models.discriminator import DinoViT
    from yume_tpu.utils.checkpoint import convert_dino_state_dict

    torch.manual_seed(0)
    dim, depth, heads, patch, img = 32, 3, 2, 8, 32
    n_tok = (img // patch) ** 2 + 1

    sd = {
        "cls_token": torch.randn(1, 1, dim) * 0.02,
        "pos_embed": torch.randn(1, n_tok, dim) * 0.02,
        "patch_embed.proj.weight": torch.randn(dim, 3, patch, patch) * 0.05,
        "patch_embed.proj.bias": torch.randn(dim) * 0.02,
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = torch.ones(dim) + torch.randn(dim) * 0.02
        sd[p + "norm1.bias"] = torch.randn(dim) * 0.02
        sd[p + "attn.qkv.weight"] = torch.randn(3 * dim, dim) * 0.05
        sd[p + "attn.qkv.bias"] = torch.randn(3 * dim) * 0.02
        sd[p + "attn.proj.weight"] = torch.randn(dim, dim) * 0.05
        sd[p + "attn.proj.bias"] = torch.randn(dim) * 0.02
        sd[p + "norm2.weight"] = torch.ones(dim) + torch.randn(dim) * 0.02
        sd[p + "norm2.bias"] = torch.randn(dim) * 0.02
        sd[p + "mlp.fc1.weight"] = torch.randn(4 * dim, dim) * 0.05
        sd[p + "mlp.fc1.bias"] = torch.randn(4 * dim) * 0.02
        sd[p + "mlp.fc2.weight"] = torch.randn(dim, 4 * dim) * 0.05
        sd[p + "mlp.fc2.bias"] = torch.randn(dim) * 0.02

    def torch_fwd(x):  # x: [B, 3, H, W]
        hooks = []
        h = torch.nn.functional.conv2d(
            x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
            stride=patch)
        b = x.shape[0]
        h = h.flatten(2).transpose(1, 2)  # [B, N, C]
        h = torch.cat([sd["cls_token"].expand(b, -1, -1), h], dim=1)
        h = h + sd["pos_embed"]
        hook_patch = h
        for i in range(depth):
            p = f"blocks.{i}."
            y = torch.nn.functional.layer_norm(
                h, (dim,), sd[p + "norm1.weight"], sd[p + "norm1.bias"],
                eps=1e-6)
            qkv = torch.nn.functional.linear(
                y, sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"])
            qkv = qkv.reshape(b, -1, 3, heads, dim // heads).permute(
                2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1)) * (dim // heads) ** -0.5
            att = att.softmax(dim=-1)
            o = (att @ v).transpose(1, 2).reshape(b, -1, dim)
            h = h + torch.nn.functional.linear(
                o, sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"])
            y = torch.nn.functional.layer_norm(
                h, (dim,), sd[p + "norm2.weight"], sd[p + "norm2.bias"],
                eps=1e-6)
            y = torch.nn.functional.linear(
                y, sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"])
            y = torch.nn.functional.gelu(y)
            h = h + torch.nn.functional.linear(
                y, sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"])
            hooks.append(h)
        return hooks + [hook_patch]

    x = torch.randn(2, 3, img, img)
    with torch.no_grad():
        ref = [t.numpy() for t in torch_fwd(x)]

    params = convert_dino_state_dict({k: v.numpy() for k, v in sd.items()},
                                     depth=depth)
    vit = DinoViT(dim=dim, depth=depth, heads=heads, patch=patch,
                  img_size=img, hooks=tuple(range(depth)))
    got = vit.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), r, rtol=2e-4, atol=2e-4)


def test_t2v_dmd_teacher_rollout():
    """generate_t2v_dmd runs a cond-only multistep trajectory on swapped
    teacher params and returns latents (reference t2v_dmd,
    wan23/textimage2video.py:519-653 — CFG branch commented out there, so
    cond-only is the faithful behavior)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yume_tpu.configs import CONFIGS, DiTConfig, T5Config, VAEConfig
    from yume_tpu.pipelines.ti2v import TI2VPipeline
    from yume_tpu.training.distill import teacher_rollout

    cfg = CONFIGS["ti2v-5B"]()
    cfg = dataclasses.replace(
        cfg,
        dit=DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64,
                      ffn_dim=128, freq_dim=32, text_dim=16, text_len=16,
                      num_heads=4, num_layers=2, framepack=True),
        vae=VAEConfig(z_dim=8, base_dim=8, dim_mult=(1, 2, 2),
                      num_res_blocks=1, temporal_downsample=(True, False),
                      stride=(2, 8, 8), patchify=2),
        t5=T5Config(vocab_size=128, dim=16, dim_attn=16, dim_ffn=24,
                    num_heads=2, num_layers=1, text_len=16),
        latent_frame_zero=2,
    )
    pipe = TI2VPipeline.from_config(cfg, jax.random.PRNGKey(0),
                                    latent_shape=(3, 4, 4),
                                    dtype=jnp.float32)
    teacher = TI2VPipeline.from_config(cfg, jax.random.PRNGKey(5),
                                       latent_shape=(3, 4, 4),
                                       dtype=jnp.float32)

    # the zero-init head makes every model output v=0 regardless of params —
    # the teacher-swap comparison would be vacuous; randomize each head with
    # a DIFFERENT seed so the two param trees produce distinct trajectories
    def _randomize_head(seed):
        def fn(path, leaf):
            names = [getattr(p, "key", "") for p in path]
            if "head" in names and names[-1] == "kernel":
                return jax.random.normal(jax.random.PRNGKey(seed),
                                         leaf.shape, leaf.dtype) * 0.1
            return leaf
        return fn

    pipe.dit_params = jax.tree_util.tree_map_with_path(
        _randomize_head(7), pipe.dit_params)
    teacher.dit_params = jax.tree_util.tree_map_with_path(
        _randomize_head(11), teacher.dit_params)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16))

    for solver in ("unipc", "dpmpp", "euler"):
        lat = pipe.generate_t2v_dmd(ctx, teacher_params=teacher.dit_params,
                                    size=(32, 32), frame_num=5, steps=4,
                                    solver=solver, seed=0)
        assert lat.shape == (1, 3, 4, 4, 8)
        assert np.isfinite(np.asarray(lat)).all()
        # the swap is real: teacher params produce the teacher's trajectory
        own = pipe.generate_t2v_dmd(ctx, size=(32, 32), frame_num=5,
                                    steps=4, solver=solver, seed=0)
        via = teacher.generate_t2v_dmd(ctx, size=(32, 32), frame_num=5,
                                       steps=4, solver=solver, seed=0)
        np.testing.assert_allclose(np.asarray(lat), np.asarray(via),
                                   atol=1e-5, rtol=1e-5)
        assert np.abs(np.asarray(own) - np.asarray(lat)).max() > 1e-3

    # the distill-side hook returns the same targets
    t = teacher_rollout(pipe, ctx, teacher.dit_params, size=(32, 32),
                        frame_num=5, steps=4, solver="unipc", seed=0)
    ref = pipe.generate_t2v_dmd(ctx, teacher_params=teacher.dit_params,
                                size=(32, 32), frame_num=5, steps=4,
                                solver="unipc", seed=0)
    np.testing.assert_allclose(np.asarray(t), np.asarray(ref), atol=0)
