"""Yume-1.5 (Wan2.2-TI2V-5B) generation pipeline.

TPU-native equivalent of the reference `wan23.Yume` pipeline + sampling
drivers (wan23/textimage2video.py:60-653, fastvideo/sample/sample_5b.py:
753-1100): conditioning preparation is a pure function returning a pytree
(≙ arg_c/arg_null), the denoise loops are jitted `lax.scan`s
(diffusion/samplers.py), and the autoregressive segment rollout is a host
loop over jit-cached per-bucket compilations.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import PipelineConfig
from ..diffusion import samplers
from ..diffusion.schedule import sampling_sigmas, unipc_sigmas
from ..models.dit import WanDiT
from ..models.t5 import T5Encoder
from ..models.vae import WanVAE
from ..utils.masks import masks_like

# Live per-request progress callback for _sample_segment's io_callback.
# A mutable slot (not a jit argument): the compiled program references the
# stable _dispatch_progress fn, so swapping callbacks per request never
# changes the jit cache key.
#
# Contract: process-global and overwritten at the start of every euler
# generate_segment (set to None for progress-less calls, so the previous
# request's closure is dropped on the next call rather than eagerly —
# io_callbacks can still fire after the dispatching Python call returns).
# Concurrent generate_segment calls from multiple threads would cross-wire
# progress; serialize requests (the webapp holds a lock) or run one
# pipeline per process.
_PROGRESS_SLOT: list = [None]


def _dispatch_progress(sigma):
    cb = _PROGRESS_SLOT[0]
    if cb is not None:
        cb(sigma)


@dataclasses.dataclass(eq=False)
class TI2VPipeline:
    """Bundles model definitions + parameters for the 5B generation stack."""

    config: PipelineConfig
    dit: WanDiT
    dit_params: Any
    vae: WanVAE
    vae_params: Any
    t5: Optional[T5Encoder] = None
    t5_params: Any = None
    attn_impl: Optional[str] = None
    # multi-chip serving: with a mesh set, packed-segment denoising runs
    # the sequence-parallel trunk (parallel/sp_forward.py) over its sp axes
    mesh: Any = None
    sp_kind: str = "ulysses"

    # -- construction --------------------------------------------------------

    @classmethod
    def from_config(
        cls,
        config: PipelineConfig,
        rng: jax.Array,
        *,
        init_t5: bool = False,
        latent_shape: Tuple[int, int, int] = (2, 32, 32),
        dtype=jnp.bfloat16,
    ) -> "TI2VPipeline":
        """Random-initialised pipeline (tests / smoke runs). Real weights
        come from `load_pretrained`."""
        d_rng, v_rng, t_rng = jax.random.split(rng, 3)
        dit = WanDiT(config.dit, dtype=dtype)
        f, h, w = latent_shape
        x = jnp.zeros((1, f, h, w, config.dit.in_dim))
        t = jnp.zeros((1, f))
        ctx = jnp.zeros((1, config.dit.text_len, config.dit.text_dim))
        if dtype == jnp.bfloat16 and config.dit.dim >= 1024:
            # billion-scale models: a full fp32 random init (~20 GB for 5B)
            # exceeds single-chip HBM; materialise bf16 params from shapes
            # (real weights come from checkpoints anyway)
            shapes = jax.eval_shape(
                lambda k, a, b, c: dit.init(k, a, b, c, packed=False),
                d_rng, x, t, ctx)
            dit_params = jax.tree_util.tree_map(
                lambda s: (jax.random.normal(d_rng, s.shape, jnp.bfloat16) * 0.02
                           if s.size > 1 else jnp.zeros(s.shape, jnp.bfloat16)),
                shapes)
        else:
            dit_params = dit.init(d_rng, x, t, ctx, packed=False)

        vae = WanVAE(config.vae)
        p = config.vae.patchify
        s = config.vae.stride
        video = jnp.zeros((1, 1 + (f - 1) * s[0], h * s[1], w * s[2], 3))
        vae_params = vae.init(v_rng, video)
        if dtype == jnp.bfloat16:
            # VAE runs under bf16 autocast in the reference
            # (wan23/textimage2video.py:578); halve resident param bytes
            vae_params = jax.tree_util.tree_map(
                lambda l: l.astype(jnp.bfloat16), vae_params)

        t5 = t5_params = None
        if init_t5:
            t5 = T5Encoder(config.t5, dtype=dtype)
            ids = jnp.zeros((1, config.t5.text_len), jnp.int32)
            if dtype == jnp.bfloat16 and config.t5.dim >= 1024:
                # umT5-XXL: a full fp32 init is ~19 GB — bf16 from shapes
                t5_shapes = jax.eval_shape(
                    lambda k: t5.init(k, ids, jnp.ones_like(ids)), t_rng)
                t5_params = jax.tree_util.tree_map(
                    lambda sh: (jax.random.normal(t_rng, sh.shape,
                                                  jnp.bfloat16) * 0.02
                                if sh.dtype == jnp.float32
                                else jnp.zeros(sh.shape, sh.dtype)),
                    t5_shapes)
            else:
                t5_params = t5.init(t_rng, ids, jnp.ones_like(ids))
        return cls(config, dit, dit_params, vae, vae_params, t5, t5_params)

    # -- conditioning --------------------------------------------------------

    def encode_text(self, ids: jax.Array, mask: jax.Array) -> jax.Array:
        """[B, text_len] ids → [B, text_len, text_dim] context with padding
        zeroed (≙ the reference's per-sample unpadded embeddings re-padded by
        the DiT, wan23/modules/model.py:816-821)."""
        assert self.t5 is not None, "pipeline built without a text encoder"
        ctx = self.t5.apply(self.t5_params, ids, mask)
        return (ctx * mask[:, :, None]).astype(jnp.float32)

    # -- jitted building blocks ---------------------------------------------

    # NOTE: params are traced arguments on every jitted method — a static
    # `self` closure would bake the multi-GB weight arrays into the compiled
    # program as constants (10 GB capture observed with the 5B model).
    @functools.partial(jax.jit, static_argnums=(0, 5, 6))
    def _sample_t2v(self, params, noise, ctx, sigmas_key, steps, shift):
        sig = sampling_sigmas(steps, shift)

        def denoise(latent, t_frame):
            if isinstance(params, tuple):  # quantized trunk, unpacked mode
                from ..models.quantized import int8_dit_apply

                return int8_dit_apply(
                    self.dit, params[0], params[1],
                    latent.astype(jnp.bfloat16), t_frame, ctx, packed=False,
                    attn_impl=self.attn_impl).astype(latent.dtype)
            if type(params).__name__ == "PPParams":  # pipeline parallel
                from ..parallel.pipeline import pp_dit_apply

                return pp_dit_apply(
                    self.dit, params.other, params.staged, params.mesh,
                    latent.astype(jnp.bfloat16), t_frame, ctx, packed=False,
                    attn_impl=self.attn_impl).astype(latent.dtype)
            return self.dit.apply(
                params, latent.astype(jnp.bfloat16), t_frame, ctx,
                packed=False, attn_impl=self.attn_impl,
            ).astype(latent.dtype)

        return samplers.euler_sample(denoise, noise, sig)

    @functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
    def _sample_t2v_multistep(self, params, noise, ctx, ctx_null, steps,
                              shift, solver, guide_scale):
        """Stock multistep t2v loop (reference WanT2V.generate,
        wan/text2video.py:110-267: UniPC or DPM++ with CFG)."""
        from ..diffusion import multistep

        sig = sampling_sigmas(steps, shift)
        b, f = noise.shape[:2]

        def model(x, sigma):
            t_frame = jnp.broadcast_to(sigma[:, None] * 1000.0, (b, f))

            def fwd(c):
                if isinstance(params, tuple):  # quantized trunk (int8/int4)
                    from ..models.quantized import int8_dit_apply

                    return int8_dit_apply(
                        self.dit, params[0], params[1],
                        x.astype(jnp.bfloat16), t_frame, c, packed=False,
                        attn_impl=self.attn_impl).astype(x.dtype)
                if type(params).__name__ == "PPParams":  # pipeline parallel
                    from ..parallel.pipeline import pp_dit_apply

                    return pp_dit_apply(
                        self.dit, params.other, params.staged, params.mesh,
                        x.astype(jnp.bfloat16), t_frame, c, packed=False,
                        attn_impl=self.attn_impl).astype(x.dtype)
                return self.dit.apply(
                    params, x.astype(jnp.bfloat16), t_frame, c,
                    packed=False, attn_impl=self.attn_impl,
                ).astype(x.dtype)

            v = fwd(ctx)
            if ctx_null is not None:
                v_u = fwd(ctx_null)
                v = v_u + guide_scale * (v - v_u)
            return v

        if solver == "dpmpp":
            return multistep.sample_dpmpp_2m(model, noise, sig)
        # UniPC: the scheduler's native ladder (σ_max = 1 − 1/N,
        # fm_solvers_unipc.py set_timesteps) and optional order-3
        order = {"unipc": 2, "unipc3": 3}[solver]
        sig = unipc_sigmas(steps, shift)
        return multistep.sample_unipc(model, noise, sig, order=order)

    @functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
    def _sample_segment(self, params, latent, ctx, history_t, steps, shift,
                        lfz, progress=False):
        sig = sampling_sigmas(steps, shift)

        def denoise(lat, t_frame):
            if progress:
                # per-step host progress (≙ the reference webapp's live step
                # logging); ordered so steps report in sequence. The jit key
                # carries only the static bool — the live callback sits in
                # the module-level _PROGRESS_SLOT so per-request closures
                # don't force a full retrace+recompile of the denoise program
                import jax.experimental

                jax.experimental.io_callback(
                    _dispatch_progress, None, t_frame[0, -1], ordered=True)
            if isinstance(params, tuple):  # int8 trunk (quantize_int8())
                from ..models.quantized import int8_dit_apply

                out = int8_dit_apply(
                    self.dit, params[0], params[1], lat.astype(jnp.bfloat16),
                    t_frame, ctx, latent_frame_zero=lfz,
                    attn_impl=self.attn_impl).astype(lat.dtype)
            elif type(params).__name__ == "PPParams":  # pipeline parallel
                from ..parallel.pipeline import pp_dit_apply

                out = pp_dit_apply(
                    self.dit, params.other, params.staged, params.mesh,
                    lat.astype(jnp.bfloat16), t_frame, ctx,
                    latent_frame_zero=lfz,
                    attn_impl=self.attn_impl).astype(lat.dtype)
            elif self.mesh is not None:  # multi-chip sequence parallelism
                from ..parallel.sp_forward import sp_dit_apply

                out = sp_dit_apply(
                    self.dit, params, self.mesh, lat.astype(jnp.bfloat16),
                    t_frame, ctx, latent_frame_zero=lfz,
                    kind=self.sp_kind).astype(lat.dtype)
            else:
                out = self.dit.apply(
                    params, lat.astype(jnp.bfloat16), t_frame, ctx,
                    packed=True, latent_frame_zero=lfz, attn_impl=self.attn_impl,
                ).astype(lat.dtype)
            # packed DiT returns tail frames only; splice into full-length v
            pad = jnp.zeros_like(lat[:, : lat.shape[1] - lfz])
            return jnp.concatenate([pad, out], axis=1)

        return samplers.euler_sample_segment(
            denoise, latent, sig, lfz, history_t=history_t
        )

    @functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
    def _sample_segment_tts(self, params, latent, ctx, history_t, steps, shift,
                            lfz, mode, rng=None):
        """TTS samplers: 'sde' churn or 'time_travel' lookahead
        (reference fastvideo/sample/sample_tts.py)."""
        sig = sampling_sigmas(steps, shift)

        def denoise(lat, t_frame):
            out = self.dit.apply(
                params, lat.astype(jnp.bfloat16), t_frame, ctx,
                packed=True, latent_frame_zero=lfz, attn_impl=self.attn_impl,
            ).astype(lat.dtype)
            pad = jnp.zeros_like(lat[:, : lat.shape[1] - lfz])
            return jnp.concatenate([pad, out], axis=1)

        if mode == "sde":
            return samplers.sde_euler_sample_segment(
                denoise, latent, sig, lfz, rng, history_t=history_t)
        # 'time_travel' = lookahead only; 'tts' = lookahead + SDE churn
        # (the combined --sde --time_travel mode, reference sample_tts.py)
        return samplers.time_travel_sample_segment(
            denoise, latent, sig, lfz, history_t=history_t,
            sde=(mode == "tts"), rng=rng)

    @functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8, 9, 10))
    def _sample_segment_teacache(self, params, latent, ctx, history_t, steps,
                                 shift, lfz, cache_interval=2,
                                 cache_edge=None, cache_threshold=None):
        """Euler tail sampling with block-residual caching (TeaCache;
        reference wan/modules/model.py:977-998): full DiT every
        ``cache_interval`` steps, middle-block skipping in between.

        ``cache_edge`` = live (recomputed) blocks per side on cached steps;
        None keeps the round-3 default n//4 (middle half cached). Smaller
        edges make cached steps cheaper and the reuse error larger — the
        operating point is swept on-chip by scripts/bench_teacache_sweep.py
        and gated by tests_tpu/test_quality_gate*.py."""
        sig = sampling_sigmas(steps, shift)
        n = self.config.dit.num_layers
        edge = n // 4 if cache_edge is None else max(1, int(cache_edge))
        cache_list = tuple(range(edge, n - edge))

        def pad_v(lat, out):
            pad = jnp.zeros_like(lat[:, : lat.shape[1] - lfz])
            return jnp.concatenate([pad, out], axis=1)

        if isinstance(params, tuple):
            # quantized trunk: the delta-cache form (middle-chunk x_out−x_in
            # as ONE tensor — equivalent to per-block residuals since they
            # are only ever added back)
            from ..models.quantized import int8_dit_apply

            def full(lat, t_frame):
                out, cache = int8_dit_apply(
                    self.dit, params[0], params[1],
                    lat.astype(jnp.bfloat16), t_frame, ctx,
                    latent_frame_zero=lfz, attn_impl=self.attn_impl,
                    return_cache=True, cache_edge=edge)
                return pad_v(lat, out.astype(lat.dtype)), cache

            def cached(lat, t_frame, cache):
                out = int8_dit_apply(
                    self.dit, params[0], params[1],
                    lat.astype(jnp.bfloat16), t_frame, ctx,
                    latent_frame_zero=lfz, attn_impl=self.attn_impl,
                    block_cache=cache, cache_edge=edge)
                return pad_v(lat, out.astype(lat.dtype))
        elif self.mesh is not None:
            # multi-chip SP TeaCache: the residual cache is token-sharded
            # and stays resident on its shards between steps (≙ reference
            # cached model under FSDP, fastvideo/sample/sample.py:979-985)
            from ..parallel.sp_forward import sp_dit_apply

            def full(lat, t_frame):
                out, cache = sp_dit_apply(
                    self.dit, params, self.mesh, lat.astype(jnp.bfloat16),
                    t_frame, ctx, latent_frame_zero=lfz, kind=self.sp_kind,
                    cache_list=cache_list, return_cache=True)
                return pad_v(lat, out.astype(lat.dtype)), cache

            def cached(lat, t_frame, cache):
                out = sp_dit_apply(
                    self.dit, params, self.mesh, lat.astype(jnp.bfloat16),
                    t_frame, ctx, latent_frame_zero=lfz, kind=self.sp_kind,
                    cache_list=cache_list, block_cache=cache)
                return pad_v(lat, out.astype(lat.dtype))
        else:
            def full(lat, t_frame):
                out, cache = self.dit.apply(
                    params, lat.astype(jnp.bfloat16), t_frame, ctx, packed=True,
                    latent_frame_zero=lfz, attn_impl=self.attn_impl,
                    cache_list=cache_list, return_cache=True)
                return pad_v(lat, out.astype(lat.dtype)), cache

            def cached(lat, t_frame, cache):
                out = self.dit.apply(
                    params, lat.astype(jnp.bfloat16), t_frame, ctx, packed=True,
                    latent_frame_zero=lfz, attn_impl=self.attn_impl,
                    cache_list=cache_list, block_cache=cache)
                return pad_v(lat, out.astype(lat.dtype))

        if cache_threshold is not None:
            # data-adaptive refresh: accumulate the rel-L1 input delta and
            # refresh when it crosses the threshold (refreshes land where
            # the trajectory moves fast instead of on a fixed grid)
            return samplers.euler_sample_segment_cached_adaptive(
                full, cached, latent, sig, lfz, threshold=cache_threshold,
                history_t=history_t)
        out = samplers.euler_sample_segment_cached(
            full, cached, latent, sig, lfz, cache_interval=cache_interval,
            history_t=history_t)
        return out, jnp.asarray(-(-steps // cache_interval), jnp.int32)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _decode_p(self, params, z):
        return self.vae.apply(params, z, method=self.vae.decode)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _encode_p(self, params, video):
        return self.vae.apply(params, video, method=self.vae.encode)

    def _decode(self, z):
        return self._decode_p(self.vae_params, z)

    def _encode(self, video):
        return self._encode_p(self.vae_params, video)

    def decode_tiled(self, z, n_tiles: int = 5):
        """Width-tiled decode with blended overlaps for large frames
        (≙ webapp tiled_decode_overlap; pipelines/tiled_decode.py)."""
        from .tiled_decode import tiled_decode

        return tiled_decode(self._decode, z, n_tiles=n_tiles,
                            scale_factor=self.config.vae.stride[1])

    @functools.partial(jax.jit, static_argnums=(0, 5, 6, 7))
    def _sample_t2v_dual(self, params_high, params_low, noise, ctx, steps,
                         shift, boundary):
        """Dual low/high-noise expert sampling (stock Wan2.2 I2V 'MoE',
        reference wan23/image2video.py:104-120): high-noise params handle
        σ ≥ boundary."""
        sig = sampling_sigmas(steps, shift)

        if type(params_high).__name__ == "EPParams":
            # expert-parallel placement: each ep group stores one expert,
            # the active expert's layers stream over ICI
            # (parallel/expert.py; params_low ignored — both experts live
            # inside the EPParams)
            from ..parallel.expert import ep_dit_apply

            def mk_expert(e):
                def denoise(latent, t_frame):
                    return ep_dit_apply(
                        self.dit, params_high.others, params_high.blocks,
                        params_high.mesh, e, latent.astype(jnp.bfloat16),
                        t_frame, ctx, packed=False,
                        attn_impl=self.attn_impl).astype(latent.dtype)
                return denoise

            return samplers.dual_model_euler_sample(
                mk_expert(0), mk_expert(1), noise, sig, boundary=boundary)

        def mk(params):
            def denoise(latent, t_frame):
                return self.dit.apply(
                    params, latent.astype(jnp.bfloat16), t_frame, ctx,
                    packed=False, attn_impl=self.attn_impl,
                ).astype(latent.dtype)
            return denoise

        return samplers.dual_model_euler_sample(
            mk(params_high), mk(params_low), noise, sig, boundary=boundary)

    def generate_t2v_dual(self, ctx, params_high, params_low, *,
                          size=(1280, 704), frame_num=121, steps=50,
                          shift=None, boundary=0.875, seed=0):
        cfgv = self.config.vae
        shift = self.config.sample_shift if shift is None else shift
        f_lat = (frame_num - 1) // cfgv.stride[0] + 1
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (ctx.shape[0], f_lat, size[1] // cfgv.stride[1],
             size[0] // cfgv.stride[2], cfgv.z_dim), jnp.float32)
        latent = self._sample_t2v_dual(params_high, params_low, noise, ctx,
                                       steps, shift, boundary)
        return self.decode_auto(latent)

    def first_frame_mask(self, frame_num: int, lat_h: int, lat_w: int):
        """First-frame conditioning mask in latent space, channels-last
        [1, F_lat, lat_h, lat_w, stride_t] — the exact construction of
        reference wan23/image2video.py:288-294 (ones on pixel frame 0,
        repeated stride_t×, folded into the temporal-stride channel)."""
        s0 = self.config.vae.stride[0]
        m = jnp.ones((1, frame_num, lat_h, lat_w), jnp.float32)
        m = m.at[:, 1:].set(0.0)
        m = jnp.concatenate([jnp.repeat(m[:, :1], s0, axis=1), m[:, 1:]],
                            axis=1)
        t = m.shape[1] // s0
        m = m.reshape(1, t, s0, lat_h, lat_w)       # [1, F_lat, s0, H, W]
        return m.transpose(0, 1, 3, 4, 2)           # channels-last

    @functools.partial(jax.jit, static_argnums=(0, 7, 8, 9, 10, 11))
    def _sample_i2v_dual(self, params_high, params_low, noise, y, ctx,
                         ctx_null, steps, shift, boundary, guide_scale,
                         solver):
        """Dual-expert i2v denoising: CFG-batched velocity per expert,
        boundary-switched UniPC/DPM++ (the actual WanI2V.generate loop,
        reference wan23/image2video.py:344-411: per-step expert pick at
        t ≥ boundary·1000, per-expert guide scale, multistep solver)."""
        from ..diffusion.multistep import sample_dpmpp_2m, sample_unipc
        from ..diffusion.schedule import sampling_sigmas

        sig = sampling_sigmas(steps, shift)
        b, f_lat = noise.shape[:2]
        ctx2 = jnp.concatenate([ctx, ctx_null], axis=0)

        if type(params_high).__name__ == "EPParams":
            from ..parallel.expert import ep_dit_apply

            def apply_fn(e):
                def f(x2, t2, c2):
                    return ep_dit_apply(
                        self.dit, params_high.others, params_high.blocks,
                        params_high.mesh, e, x2, t2, c2, packed=False,
                        attn_impl=self.attn_impl)
                return f

            apply_high, apply_low = apply_fn(0), apply_fn(1)
        else:
            def mk_apply(params):
                def f(x2, t2, c2):
                    return self.dit.apply(params, x2, t2, c2, packed=False,
                                          attn_impl=self.attn_impl)
                return f

            apply_high, apply_low = mk_apply(params_high), mk_apply(params_low)

        def mk_denoise(apply, gs):
            def denoise(latent, sig_b):
                xin = jnp.concatenate([latent, y.astype(latent.dtype)], axis=-1)
                x2 = jnp.concatenate([xin, xin], axis=0).astype(jnp.bfloat16)
                t2 = jnp.broadcast_to((sig_b[0] * 1000.0)[None, None],
                                      (2 * b, f_lat))
                v2 = apply(x2, t2, ctx2).astype(latent.dtype)
                v_c, v_n = v2[:b], v2[b:]
                # noise_pred = uncond + gs·(cond − uncond) (reference :401)
                return v_n + gs * (v_c - v_n)
            return denoise

        # per-expert guide scale: guide_scale[1] above the boundary
        # (reference :388-391)
        fn_high = mk_denoise(apply_high, guide_scale[1])
        fn_low = mk_denoise(apply_low, guide_scale[0])
        sampler = {"unipc": sample_unipc, "dpm++": sample_dpmpp_2m}
        if solver not in sampler:
            raise NotImplementedError(
                f"unsupported solver {solver!r} (reference WanI2V supports "
                "unipc/dpm++, wan23/image2video.py:344-363)")
        return sampler[solver](fn_high, noise, sig,
                               denoise_fn_low=fn_low, boundary=boundary)

    @functools.partial(jax.jit,
                       static_argnums=(0, 5, 6, 7, 8, 9, 10, 11))
    def _dual_phase(self, params, carry, y, ctx2, steps, shift, gs, solver,
                    lo, hi, return_carry):
        """One expert's phase of the dual-expert ladder: steps [lo, hi) on
        ``params`` only — the building block of host-offload serving (the
        other expert is NOT an argument, so only this expert's weights are
        resident while the program runs)."""
        from ..diffusion.multistep import sample_dpmpp_2m, sample_unipc

        sig = sampling_sigmas(steps, shift)
        x0 = carry[0] if isinstance(carry, tuple) else carry.x
        b, f_lat = x0.shape[:2]

        def denoise(latent, sig_b):
            xin = jnp.concatenate([latent, y.astype(latent.dtype)], axis=-1)
            x2 = jnp.concatenate([xin, xin], axis=0).astype(jnp.bfloat16)
            t2 = jnp.broadcast_to((sig_b[0] * 1000.0)[None, None],
                                  (2 * b, f_lat))
            v2 = self.dit.apply(params, x2, t2, ctx2, packed=False,
                                attn_impl=self.attn_impl).astype(latent.dtype)
            v_c, v_n = v2[:b], v2[b:]
            return v_n + gs * (v_c - v_n)

        if solver == "unipc":
            return sample_unipc(denoise, x0, sig, step_range=(lo, hi),
                                init_carry=carry, return_carry=return_carry)
        return sample_dpmpp_2m(denoise, x0, sig, step_range=(lo, hi),
                               init_carry=carry, return_carry=return_carry)

    def _i2v_dual_offload(self, params_high, params_low, noise, y, ctx,
                          ctx_null, steps, shift, boundary, guide_scale,
                          solver):
        """Single-chip dual-expert serving with the inactive expert parked
        on host (reference per-step CPU shuttling,
        wan23/image2video.py:172-204 — here ONE transfer per segment, not
        per step: the descending ladder switches experts exactly once).
        Pass HOST (numpy) expert trees to actually save HBM; device trees
        still work but stay resident."""
        import numpy as _np

        from ..diffusion.multistep import MultistepCarry
        from ..utils.offload import to_device

        sig = _np.asarray(sampling_sigmas(steps, shift))
        n_steps = len(sig) - 1
        split = int(_np.sum(sig[:-1] >= boundary))
        ctx2 = jnp.concatenate([ctx, ctx_null], axis=0)
        if solver == "unipc":
            carry = (noise, jnp.zeros_like(noise),
                     jnp.zeros((2,) + noise.shape, noise.dtype))
        elif solver == "dpm++":
            carry = MultistepCarry(noise, jnp.zeros_like(noise),
                                   jnp.array(False))
        else:
            raise NotImplementedError(
                f"unsupported solver {solver!r} (reference WanI2V supports "
                "unipc/dpm++, wan23/image2video.py:344-363)")

        def _put(tree):
            host = any(isinstance(l, _np.ndarray)
                       for l in jax.tree_util.tree_leaves(tree)[:1])
            return to_device(tree) if host else tree

        if split:
            p = _put(params_high)
            out = self._dual_phase(p, carry, y, ctx2, steps, shift,
                                   guide_scale[1], solver, 0, split,
                                   split < n_steps)
            if split >= n_steps:
                return out
            carry = out
            # materialize the carry BEFORE freeing the high expert and
            # loading the low one — async dispatch would otherwise allocate
            # both experts at once (the OOM this mode exists to avoid)
            _ = float(jnp.sum(carry[0] if isinstance(carry, tuple)
                              else carry.x))
            del p, out
        p = _put(params_low)
        return self._dual_phase(p, carry, y, ctx2, steps, shift,
                                guide_scale[0], solver, split, n_steps,
                                False)

    def generate_i2v_dual(
        self,
        img: jax.Array,
        ctx: jax.Array,
        ctx_null: jax.Array,
        params_high,
        params_low,
        *,
        frame_num: int = 81,
        steps: Optional[int] = None,
        shift: Optional[float] = None,
        boundary: Optional[float] = None,
        guide_scale: Tuple[float, float] = (3.5, 3.5),
        seed: int = 0,
        solver: str = "unipc",
        offload: bool = False,
    ):
        """The stock ``WanI2V.generate`` (reference wan23/image2video.py:
        206-431): first-frame image conditioning (msk ++ VAE(y) channel
        concat), dual low/high-noise experts switched per step at
        σ ≥ boundary with per-expert CFG scales, UniPC or DPM++ solver,
        full-clip decode.

        img: [1, H, W, 3] pixels in [-1, 1], already at the target size
        (the reference's max_area fitting ≙ utils.masks.best_output_size).
        params_high/params_low: the two expert trees, or params_high an
        ``EPParams`` (each mesh group stores one expert; params_low=None).
        """
        cfgv = self.config.vae
        s0, sh, sw = cfgv.stride
        steps = self.config.sample_steps if steps is None else steps
        shift = self.config.sample_shift if shift is None else shift
        if boundary is None:
            boundary = self.config.boundary
        assert boundary is not None, "dual-expert sampling needs a boundary"
        b, h, w, _ = img.shape
        lat_h, lat_w = h // sh, w // sw
        f_lat = (frame_num - 1) // s0 + 1

        # y = msk ++ VAE(first frame, zero-padded clip)  (reference :315-323)
        video = jnp.concatenate(
            [img[:, None], jnp.zeros((b, frame_num - 1, h, w, 3), img.dtype)],
            axis=1)
        y_vae = self.encode_auto(video)
        msk = self.first_frame_mask(frame_num, lat_h, lat_w)
        y = jnp.concatenate([msk.astype(y_vae.dtype), y_vae], axis=-1)

        noise = jax.random.normal(
            jax.random.PRNGKey(seed), (b, f_lat, lat_h, lat_w, cfgv.z_dim),
            jnp.float32)
        if offload:
            latent = self._i2v_dual_offload(
                params_high, params_low, noise, y, ctx, ctx_null, steps,
                shift, float(boundary), tuple(guide_scale), solver)
        else:
            latent = self._sample_i2v_dual(
                params_high, params_low, noise, y, ctx, ctx_null, steps,
                shift, float(boundary), tuple(guide_scale), solver)
        return self.decode_auto(latent)

    def encode_auto(self, video):
        """Memory-aware encode: streaming 1+4k-frame chunks (the reference's
        production encode, vae2_2.py:797-829) once full-clip encoder
        activations would exceed a few GB."""
        pixels = video.shape[1] * video.shape[2] * video.shape[3]
        if pixels * 160 * 2 < (2 << 30):
            return self._encode(video)
        from ..models.vae import streaming_encode

        return streaming_encode(self.vae, self.vae_params,
                                video.astype(jnp.bfloat16))

    def decode_auto(self, z):
        """Memory-aware decode: full-clip for small outputs, streaming
        (chunked, bf16 like the reference's autocast decode,
        wan23/textimage2video.py:578) once the full-clip decoder activations
        would exceed a few GB. Exact — the streaming path is cache-carried,
        not chunk-independent. At 720p-class widths the 2-tile × 2-latent-
        frame-chunk config is the measured sweet spot on a 16 GB chip
        (5.07 s vs 5.84 s for 4×1 at the 44×80/8-frame tail; wider chunks
        or fewer tiles OOM — scripts/bench_vae_decode.py, docs/PERF.md)."""
        s = self.config.vae.stride
        # decoder peak activation ≈ pixels × 256ch × 4B at full temporal res
        pixels = (1 + (z.shape[1] - 1) * s[0]) * z.shape[2] * s[1] * z.shape[3] * s[2]
        if pixels * 256 * 2 < (2 << 30):
            return self._decode(z)
        from ..models.vae import streaming_decode
        from .tiled_decode import tiled_decode

        def stream(tile):
            return streaming_decode(self.vae, self.vae_params,
                                    tile.astype(jnp.bfloat16),
                                    chunk_latent_frames=2)

        if z.shape[3] >= 40:  # also tile width at 720p-class frames
            return tiled_decode(stream, z, n_tiles=2,
                                scale_factor=self.config.vae.stride[1])
        return stream(z)

    # -- public generation ---------------------------------------------------

    def quantize_int8(self, bits: int = 8):
        """Requantize the DiT trunk to int8 (segment sampler only; the
        unpacked t2v first segment and TeaCache keep the bf16 params)."""
        from ..models.quantized import quantize_dit_blocks

        if (not isinstance(self.dit_params, tuple)
                and type(self.dit_params).__name__ != "PPParams"):
            self.dit_params = quantize_dit_blocks(
                self.dit_params, self.config.dit.num_layers, bits=bits)

    def parallelize_pp(self, stages: int, *, devices=None):
        """Stage the bf16 trunk across a pp mesh (weights 1/S per chip);
        segment denoising then runs through parallel/pipeline.py."""
        from ..parallel.pipeline import PPParams, prepare_pp

        if not isinstance(self.dit_params, (tuple, PPParams)):
            self.dit_params = prepare_pp(
                self.dit_params, self.config.dit.num_layers, stages,
                devices=devices)

    def generate_t2v(
        self,
        ctx: jax.Array,
        *,
        size: Tuple[int, int] = (1280, 704),
        frame_num: int = 121,
        steps: int = 50,
        shift: Optional[float] = None,
        seed: int = 0,
        solver: str = "euler",
        ctx_null: Optional[jax.Array] = None,
        guide_scale: float = 5.0,
        return_latents: bool = False,
        noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Text-to-video, single segment. ``solver='euler'`` is the 5B t2v
        path (reference sample_5b.py --T2V, flag=False unpacked, no CFG);
        'unipc'/'dpmpp' with ``ctx_null`` is the stock Wan2.1 T2V loop
        (reference wan/text2video.py:110-267: multistep solver + CFG).
        ``noise`` overrides the seeded initial noise (cross-framework
        parity tests / external generators).
        Returns video [B, frame_num, H, W, 3] in [-1, 1]."""
        cfgv = self.config.vae
        shift = self.config.sample_shift if shift is None else shift
        f_lat = (frame_num - 1) // cfgv.stride[0] + 1
        h_lat = size[1] // cfgv.stride[1]
        w_lat = size[0] // cfgv.stride[2]
        if noise is None:
            noise = jax.random.normal(
                jax.random.PRNGKey(seed),
                (ctx.shape[0], f_lat, h_lat, w_lat, cfgv.z_dim), jnp.float32,
            )
        if solver == "euler":
            latent = self._sample_t2v(self.dit_params, noise, ctx, None,
                                      steps, shift)
        else:
            latent = self._sample_t2v_multistep(
                self.dit_params, noise, ctx, ctx_null, steps, shift, solver,
                guide_scale)
        if return_latents:
            return latent
        return self.decode_auto(latent)

    def generate_t2v_dmd(
        self,
        ctx: jax.Array,
        *,
        teacher_params: Any = None,
        size: Tuple[int, int] = (1280, 704),
        frame_num: int = 81,
        steps: int = 8,
        shift: float = 5.0,
        solver: str = "unipc",
        seed: int = 0,
        noise: Optional[jax.Array] = None,
        return_latents: bool = True,
    ) -> jax.Array:
        """DMD teacher rollout (reference `t2v_dmd`,
        wan23/textimage2video.py:519-653): a COND-ONLY few-step multistep
        trajectory run on ``teacher_params`` — the reference swaps in a
        ``teacher_transformer`` and leaves the CFG branch commented out
        (:637-643), so guidance is baked into the teacher. Returns LATENTS
        by default (the rollout feeds distillation targets,
        training/distill.py::teacher_rollout). ``solver``:
        'unipc' | 'dpmpp' | 'euler' (:584-608)."""
        params = self.dit_params if teacher_params is None else teacher_params
        cfgv = self.config.vae
        f_lat = (frame_num - 1) // cfgv.stride[0] + 1
        h_lat = size[1] // cfgv.stride[1]
        w_lat = size[0] // cfgv.stride[2]
        if noise is None:
            noise = jax.random.normal(
                jax.random.PRNGKey(seed),
                (ctx.shape[0], f_lat, h_lat, w_lat, cfgv.z_dim), jnp.float32)
        if solver == "euler":
            latent = self._sample_t2v(params, noise, ctx, None, steps, shift)
        else:
            latent = self._sample_t2v_multistep(
                params, noise, ctx, None, steps, shift, solver, 1.0)
        if return_latents:
            return latent
        return self.decode_auto(latent)

    def generate_segment(
        self,
        history_latents: jax.Array,
        ctx: jax.Array,
        *,
        steps: int = 4,
        shift: float = 7.0,
        seed: int = 0,
        sampler: str = "euler",
        progress_cb=None,
        noise: Optional[jax.Array] = None,
        teacache_interval: int = 3,
        teacache_edge: Optional[int] = None,
        teacache_threshold: Optional[float] = None,
    ) -> jax.Array:
        """One autoregressive continuation: append `latent_frame_zero` fresh
        noise frames after the history, denoise them (packed history,
        per-frame timesteps), return the grown latent sequence (reference
        sample_5b.py:920-1100). ``sampler``: 'euler' | 'sde' | 'time_travel'
        (TTS variants, reference sample_tts.py). ``progress_cb(sigma)`` is
        called from the device per denoise step (euler only). ``noise``
        overrides the seeded tail noise (cross-framework parity tests).
        ``teacache_interval``: for sampler='teacache', run the full DiT
        every N-th step (1 full : N−1 cached; quality-gated on-chip by
        tests_tpu/test_quality_gate.py — the default matches bench.py's
        best-serving headline). ``teacache_edge``: live blocks recomputed
        per side on cached steps (None → num_layers//4)."""
        lfz = self.config.latent_frame_zero
        b, f_hist, h, w, c = history_latents.shape
        if noise is None:
            noise = jax.random.normal(
                jax.random.PRNGKey(seed), (b, lfz, h, w, c), jnp.float32
            )
        latent = jnp.concatenate([history_latents, noise], axis=1)
        history_t = jnp.zeros((b, f_hist), jnp.float32)
        _special = type(self.dit_params).__name__ == "PPParams"
        if _special and sampler != "euler":
            raise NotImplementedError(
                f"pp trunk supports the euler sampler, got {sampler!r}")
        if isinstance(self.dit_params, tuple) and sampler not in ("euler",
                                                                  "teacache"):
            raise NotImplementedError(
                f"int8 trunk supports euler/teacache samplers, got {sampler!r}")
        if self.mesh is not None and sampler not in ("euler", "teacache"):
            # euler and teacache route through sp_dit_apply; the TTS
            # samplers use the dense dit.apply — running them with a mesh
            # set would silently fall back to single-program execution
            # instead of sharding, so refuse loudly (same style as the
            # PP/int8 guards above)
            raise NotImplementedError(
                f"multi-chip SP serving supports euler/teacache samplers, "
                f"got {sampler!r}; drop --sp or use sampler='euler'")
        if self.mesh is not None and isinstance(self.dit_params, tuple):
            raise NotImplementedError(
                "the int8/int4 storage trunk is single-chip; use --w8a8 "
                "(dynamic int8 MXU matmuls) for quantized SP serving")
        if sampler == "teacache" and teacache_interval < 1:
            raise ValueError(
                f"teacache_interval must be >= 1, got {teacache_interval}")
        if sampler == "euler":
            _PROGRESS_SLOT[0] = progress_cb
            return self._sample_segment(self.dit_params, latent, ctx, history_t,
                                        steps, shift, lfz,
                                        progress_cb is not None)
        if sampler == "teacache":
            out, n_full = self._sample_segment_teacache(
                self.dit_params, latent, ctx, history_t, steps, shift, lfz,
                teacache_interval, teacache_edge, teacache_threshold)
            # full-DiT steps actually executed (adaptive scheduling):
            # effective-cost accounting for bench/sweep tooling
            self.last_teacache_n_full = n_full
            return out
        return self._sample_segment_tts(
            self.dit_params, latent, ctx, history_t, steps, shift, lfz, sampler,
            jax.random.PRNGKey(seed + 7919))

    def generate_long(
        self,
        ctxs: List[jax.Array],
        first_segment: jax.Array,
        *,
        steps: int = 4,
        shift: float = 7.0,
        seed: int = 0,
        sampler: str = "euler",
        teacache_interval: int = 3,
        teacache_edge: Optional[int] = None,
        teacache_threshold: Optional[float] = None,
    ) -> Tuple[jax.Array, List[jax.Array]]:
        """Autoregressive rollout: `first_segment` [B, F0, h, w, z] latents
        (from t2v or an encoded image), then one segment per context in
        `ctxs` (per-segment control captions). Returns (full latent
        sequence, decoded tail videos)."""
        latents = first_segment
        videos = []
        for s, ctx in enumerate(ctxs):
            latents = self.generate_segment(
                latents, ctx, steps=steps, shift=shift, seed=seed + s + 1,
                sampler=sampler, teacache_interval=teacache_interval,
                teacache_edge=teacache_edge,
                teacache_threshold=teacache_threshold,
            )
            tail = latents[:, -self.config.latent_frame_zero:]
            videos.append(self.decode_auto(tail))
        return latents, videos

    def encode_image_conditioning(
        self, img: jax.Array, frame_num: int
    ) -> Tuple[jax.Array, jax.Array]:
        """i2v conditioning (reference wan23/textimage2video.py:381-517):
        VAE-encode the (repeated) conditioning frames, zero-pad to the
        target latent length, and build masks_like masks."""
        z = self._encode(img)
        f_target = (frame_num - 1) // self.config.vae.stride[0] + 1
        pad = f_target - z.shape[1]
        if pad > 0:
            z = jnp.concatenate(
                [z, jnp.zeros_like(z[:, -1:]).repeat(pad, axis=1)], axis=1
            )
        _, mask2 = masks_like(
            z.shape, zero=True, latent_frame_zero=self.config.latent_frame_zero
        )
        return z, mask2
