"""Stock dual-expert I2V (`WanI2V.generate`, reference
wan23/image2video.py:104-204, 260-431): first-frame msk/y conditioning +
boundary-switched low/high-noise experts + per-expert CFG + UniPC/DPM++.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import requires_reference
from yume_tpu.configs import CONFIGS, DiTConfig, T5Config, VAEConfig

DIT = DiTConfig(model_type="i2v", in_dim=18, out_dim=8, dim=64, ffn_dim=128,
                freq_dim=32, text_dim=16, num_heads=8, num_layers=2,
                framepack=False)


def _tiny_pipe():
    import dataclasses

    from yume_tpu.pipelines.ti2v import TI2VPipeline

    cfg = CONFIGS["i2v-A14B"]()
    cfg = dataclasses.replace(
        cfg,
        dit=DIT,
        vae=VAEConfig(z_dim=8, base_dim=8, dim_mult=(1, 2, 2),
                      num_res_blocks=1, temporal_downsample=(True, False),
                      stride=(2, 4, 4), patchify=1, arch="wan21"),
        t5=T5Config(vocab_size=128, dim=16, dim_attn=16, dim_ffn=24,
                    num_heads=2, num_layers=1, text_len=16),
    ).check_i2v_channels()
    pipe = TI2VPipeline.from_config(cfg, jax.random.PRNGKey(0),
                                    latent_shape=(3, 4, 4),
                                    dtype=jnp.float32)
    pipe.attn_impl = "xla"

    def randomize_head(params, seed):
        # the head kernel is zero-init (DiT convention) — random-init
        # experts would emit zero velocity and every trajectory would
        # degenerate to the identity; give each expert a distinct head
        def fn(path, leaf):
            if any(getattr(k, "key", None) == "head" for k in path):
                return jax.random.normal(jax.random.PRNGKey(seed), leaf.shape,
                                         leaf.dtype) * 0.05
            return leaf
        return jax.tree_util.tree_map_with_path(fn, params)

    p_high = randomize_head(pipe.dit_params, 7)
    pipe.dit_params = p_high
    p_low = randomize_head(
        pipe.dit.init(jax.random.PRNGKey(9),
                      jnp.zeros((1, 3, 4, 4, DIT.in_dim)),
                      jnp.zeros((1, 3)),
                      jnp.zeros((1, 16, DIT.text_dim)), packed=False), 8)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, DIT.text_dim)) * 0.1
    ctx_null = jax.random.normal(jax.random.PRNGKey(3),
                                 (1, 16, DIT.text_dim)) * 0.1
    img = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3),
                             minval=-1.0, maxval=1.0)
    return pipe, p_high, p_low, ctx, ctx_null, img


@requires_reference
def test_first_frame_mask_matches_reference():
    """The latent conditioning mask must equal the reference construction
    (wan23/image2video.py:288-294) element for element."""
    import torch

    F, lat_h, lat_w, s0 = 9, 4, 6, 4
    msk = torch.ones(1, F, lat_h, lat_w)
    msk[:, 1:] = 0
    msk = torch.concat([
        torch.repeat_interleave(msk[:, 0:1], repeats=s0, dim=1), msk[:, 1:]
    ], dim=1)
    msk = msk.view(1, msk.shape[1] // s0, s0, lat_h, lat_w)
    want = msk.transpose(1, 2)[0].numpy()  # [4, F_lat, H, W]

    from yume_tpu.pipelines.ti2v import TI2VPipeline

    cfg = CONFIGS["i2v-A14B"]()  # stride_t = 4, like the reference
    host = TI2VPipeline(config=cfg, dit=None, dit_params=None,
                        vae=None, vae_params=None)
    got = np.asarray(host.first_frame_mask(F, lat_h, lat_w))  # [1,T,H,W,4]
    got_t = got[0].transpose(3, 0, 1, 2)  # → [4, F_lat, H, W]
    np.testing.assert_array_equal(got_t, want)


@requires_reference
def test_boundary_semantics_match_reference():
    """Expert selection per step must equal the reference's
    `_prepare_model_for_timestep` (wan23/image2video.py:172-204):
    t ≥ boundary·num_train_timesteps → high-noise expert."""
    import re
    import textwrap

    import torch

    src = open("/root/reference/wan23/image2video.py").read()
    m = re.search(
        r"(    def _prepare_model_for_timestep\(self, t, boundary,.*?\n)"
        r"(.*?)(?=\n    def )", src, re.S)
    assert m, "reference method not found"
    fn_src = textwrap.dedent(m.group(1) + m.group(2))

    class _Stub:  # minimal self: never offloads, models are tags
        init_on_cpu = False
        low_noise_model = "low"
        high_noise_model = "high"

    ns = {}
    exec(compile(fn_src, "ref_prepare.py", "exec"), {"torch": torch}, ns)
    prepare = ns["_prepare_model_for_timestep"]

    from yume_tpu.diffusion.multistep import sample_dpmpp_2m, sample_unipc
    from yume_tpu.diffusion.schedule import sampling_sigmas

    boundary = 0.900
    for steps, shift in ((8, 5.0), (5, 5.0), (4, 12.0)):
        sig = sampling_sigmas(steps, shift)
        want = [prepare(_Stub(), torch.tensor(float(s) * 1000.0),
                        boundary * 1000.0, False)
                for s in sig[:-1]]

        picks = []
        noise = jnp.zeros((1, 2, 2, 2, 2))
        fn_h = lambda x, s: (picks.append("high"), jnp.zeros_like(x))[1]
        fn_l = lambda x, s: (picks.append("low"), jnp.zeros_like(x))[1]
        sample_unipc(fn_h, noise, sig, denoise_fn_low=fn_l, boundary=boundary,
                     scan=False)
        assert picks == want, (steps, picks, want)

        # the scan path splits the ladder at the boundary (one scan per
        # expert), so its trace-time pick sequence is the run-length-
        # compressed per-step sequence — same expert at every sigma
        want_runs_u = [k for j, k in enumerate(want)
                       if j == 0 or want[j - 1] != k]
        picks = []
        sample_unipc(fn_h, noise, sig, denoise_fn_low=fn_l, boundary=boundary)
        assert picks == want_runs_u, ("unipc-scan", steps, picks, want_runs_u)

        # dpm++ runs one scan per expert segment, so the trace-time pick
        # sequence is the run-length-compressed form of the per-step one
        want_runs = [k for j, k in enumerate(want)
                     if j == 0 or want[j - 1] != k]
        picks = []
        jax.jit(lambda n: sample_dpmpp_2m(
            fn_h, n, sig, denoise_fn_low=fn_l, boundary=boundary))(noise)
        assert picks == want_runs, ("dpm++", steps, picks, want_runs)


@pytest.mark.parametrize("solver", ["unipc", "dpm++"])
def test_i2v_dual_same_params_equals_single_expert(solver):
    """With identical expert trees the boundary switch is the identity: the
    dual path must bit-match a single-expert run of the same solver —
    the dense-parity witness that the dual composition adds nothing but
    the switch."""
    from yume_tpu.diffusion.multistep import sample_dpmpp_2m, sample_unipc
    from yume_tpu.diffusion.schedule import sampling_sigmas

    pipe, p_high, _p_low, ctx, ctx_null, img = _tiny_pipe()
    out_dual = pipe.generate_i2v_dual(img, ctx, ctx_null, p_high, p_high,
                                      frame_num=5, steps=4, seed=1,
                                      solver=solver)
    assert np.isfinite(np.asarray(out_dual)).all()

    # reconstruct the single-expert trajectory with the same conditioning
    cfgv = pipe.config.vae
    video = jnp.concatenate([img[:, None], jnp.zeros((1, 4, 16, 16, 3))], 1)
    y = jnp.concatenate([
        pipe.first_frame_mask(5, 4, 4).astype(jnp.float32),
        pipe.encode_auto(video)], axis=-1)
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 4, cfgv.z_dim),
                              jnp.float32)
    ctx2 = jnp.concatenate([ctx, ctx_null], axis=0)

    def denoise(latent, sig_b):
        xin = jnp.concatenate([latent, y.astype(latent.dtype)], axis=-1)
        x2 = jnp.concatenate([xin, xin], axis=0).astype(jnp.bfloat16)
        t2 = jnp.broadcast_to((sig_b[0] * 1000.0)[None, None], (2, 3))
        v2 = pipe.dit.apply(p_high, x2, t2, ctx2, packed=False,
                            attn_impl="xla").astype(latent.dtype)
        return v2[1:] + 3.5 * (v2[:1] - v2[1:])

    sig = sampling_sigmas(4, pipe.config.sample_shift)
    fn = {"unipc": sample_unipc, "dpm++": sample_dpmpp_2m}[solver]
    latent = fn(denoise, noise, sig)
    want = pipe.decode_auto(latent)
    np.testing.assert_allclose(np.asarray(out_dual), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_i2v_dual_experts_actually_differ():
    """With distinct expert trees the output must differ from either
    single-expert run (the switch is real, not dead code)."""
    pipe, p_high, p_low, ctx, ctx_null, img = _tiny_pipe()
    dual = pipe.generate_i2v_dual(img, ctx, ctx_null, p_high, p_low,
                                  frame_num=5, steps=4, seed=1)
    only_high = pipe.generate_i2v_dual(img, ctx, ctx_null, p_high, p_high,
                                       frame_num=5, steps=4, seed=1)
    only_low = pipe.generate_i2v_dual(img, ctx, ctx_null, p_low, p_low,
                                      frame_num=5, steps=4, seed=1)
    assert not np.allclose(np.asarray(dual), np.asarray(only_high))
    assert not np.allclose(np.asarray(dual), np.asarray(only_low))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_i2v_dual_ep_matches_dense():
    """EPParams placement (each mesh group stores one expert, layers
    streamed over ICI) must reproduce the dense two-tree dual run."""
    from yume_tpu.parallel.expert import prepare_ep

    pipe, p_high, p_low, ctx, ctx_null, img = _tiny_pipe()
    want = pipe.generate_i2v_dual(img, ctx, ctx_null, p_high, p_low,
                                  frame_num=5, steps=4, seed=1)
    ep = prepare_ep(p_high, p_low, DIT.num_layers)
    got = pipe.generate_i2v_dual(img, ctx, ctx_null, ep, None,
                                 frame_num=5, steps=4, seed=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("solver", ["unipc", "dpm++"])
def test_i2v_dual_host_offload_matches_resident(solver):
    """offload=True (inactive expert parked on host, one device transfer at
    the boundary — ≙ reference per-step CPU shuttling,
    wan23/image2video.py:172-204) must reproduce the both-resident dual
    trajectory exactly: the phase split runs the same ladder steps on the
    same carry."""
    pipe, p_high, p_low, ctx, ctx_null, img = _tiny_pipe()
    want = pipe.generate_i2v_dual(img, ctx, ctx_null, p_high, p_low,
                                  frame_num=5, steps=4, seed=1,
                                  solver=solver)

    from yume_tpu.utils.offload import to_host

    got = pipe.generate_i2v_dual(img, ctx, ctx_null, to_host(p_high),
                                 to_host(p_low), frame_num=5, steps=4,
                                 seed=1, solver=solver, offload=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
