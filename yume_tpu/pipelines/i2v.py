"""Yume-1.0 (Wan2.1-I2V-14B) generation pipeline.

TPU-native equivalent of the reference `wan.Yume` pipeline + 14B sampling
driver (wan/image2video.py:94-534, fastvideo/sample/sample.py:642-887):
msk/y channel conditioning, CLIP image features, CFG Euler sampling with
per-step history re-noising, autoregressive `generate_next` re-conditioning.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import PipelineConfig
from ..diffusion import samplers
from ..diffusion.schedule import sampling_sigmas
from ..models.clip import CLIPVisual, preprocess_frames
from ..models.dit import WanDiT
from ..models.t5 import T5Encoder
from ..models.vae import WanVAE


def build_mask_channels(
    frame_num: int, lat_h: int, lat_w: int, *,
    cond_pixel_frames: int, batch: int = 1, stride_t: int = 4,
) -> jax.Array:
    """The 4-channel latent-frame conditioning mask ``msk`` (reference
    wan/image2video.py:300-320): a per-pixel-frame indicator (1 =
    conditioning frame) whose first frame is repeated 4× and then grouped
    into latent frames of 4 — channel c is the intra-group offset.

    cond_pixel_frames: number of leading pixel frames that are conditioning
    (1 for single-image i2v; F - frame_zero for v2v history mode).
    Returns [B, F_lat, lat_h, lat_w, 4].
    """
    m = np.zeros((frame_num,), np.float32)
    m[:cond_pixel_frames] = 1.0
    # first pixel frame repeated stride_t× then grouped per latent frame;
    # channel count = temporal VAE stride (4 for Wan2.1)
    m = np.concatenate([np.repeat(m[:1], stride_t), m[1:]])
    f_lat = len(m) // stride_t
    m = m.reshape(f_lat, stride_t)
    msk = np.broadcast_to(m[None, :, None, None, :],
                          (batch, f_lat, lat_h, lat_w, stride_t))
    return jnp.asarray(np.ascontiguousarray(msk))


@dataclasses.dataclass(eq=False)
class I2VPipeline:
    """Bundles the 14B generation stack."""

    config: PipelineConfig
    dit: WanDiT
    dit_params: Any
    vae: WanVAE
    vae_params: Any
    t5: Optional[T5Encoder] = None
    t5_params: Any = None
    clip: Optional[CLIPVisual] = None
    clip_params: Any = None
    attn_impl: Optional[str] = None
    # multi-chip serving: with a mesh set, CFG segment denoising runs the
    # sequence-parallel trunk (parallel/sp_forward.py) over its sp axes
    mesh: Any = None
    sp_kind: str = "ulysses"
    # CFG parallelism (xDiT cfg_degree): cond+uncond as one batch-2B call,
    # splittable across a data mesh axis
    cfg_parallel: bool = False
    # host-offload hook: called with "vae" / "dit" at phase boundaries so a
    # driver-level OffloadSlot can shuttle models through HBM (single-chip
    # 14B: T5-XXL + int4 trunk + VAE don't fit together)
    phase_cb: Any = None
    # streaming-VAE conditioning cache for autoregressive rollouts
    # (_encode_history_incremental)
    _cond_cache: Any = None

    @classmethod
    def from_config(
        cls,
        config: PipelineConfig,
        rng: jax.Array,
        *,
        init_t5: bool = False,
        init_clip: bool = False,
        init_dit: bool = True,
        latent_shape: Tuple[int, int, int] = (3, 8, 8),
        dtype=jnp.bfloat16,
    ) -> "I2VPipeline":
        """``init_dit=False`` leaves ``dit_params=None`` — the single-chip
        14B quantized path streams weights in via
        models/quantized.py::quantize_host_blocks instead (a 28 GB bf16
        init cannot be resident on a 16 GB chip)."""
        d_rng, v_rng, t_rng, c_rng = jax.random.split(rng, 4)
        dit = WanDiT(config.dit, dtype=dtype)
        f, h, w = latent_shape
        x = jnp.zeros((1, f, h, w, config.dit.in_dim))
        t = jnp.zeros((1, f))
        ctx = jnp.zeros((1, config.dit.text_len, config.dit.text_dim))
        clip_ctx = None
        if config.dit.image_context_len:
            clip_ctx = jnp.zeros((1, config.dit.image_context_len,
                                  config.clip.dim if config.clip else 1280))
        if not init_dit:
            dit_params = None
        elif dtype == jnp.bfloat16 and config.dit.dim >= 1024:
            # low-memory shape-based init (see TI2VPipeline.from_config);
            # NOTE: 14B bf16 params are ~28 GB — single-chip v5e needs the
            # fsdp-sharded path (parallel/mesh.py) or quantisation
            shapes = jax.eval_shape(
                lambda k, a, b, c: dit.init(
                    k, a, b, c, packed=True,
                    latent_frame_zero=config.latent_frame_zero,
                    clip_context=clip_ctx),
                d_rng, x, t, ctx)
            dit_params = jax.tree_util.tree_map(
                lambda sh: (jax.random.normal(d_rng, sh.shape, jnp.bfloat16) * 0.02
                            if sh.size > 1 else jnp.zeros(sh.shape, jnp.bfloat16)),
                shapes)
        else:
            dit_params = dit.init(
                d_rng, x, t, ctx, packed=True,
                latent_frame_zero=config.latent_frame_zero, clip_context=clip_ctx,
            )

        vae = WanVAE(config.vae)
        s = config.vae.stride
        video = jnp.zeros((1, 1 + (f - 1) * s[0], h * s[1], w * s[2], 3))
        vae_params = vae.init(v_rng, video)
        if dtype == jnp.bfloat16:
            # bf16 autocast parity with the reference; halves resident bytes
            vae_params = jax.tree_util.tree_map(
                lambda l: l.astype(jnp.bfloat16), vae_params)

        t5 = t5_params = clip = clip_params = None
        if init_t5:
            t5 = T5Encoder(config.t5, dtype=dtype)
            ids = jnp.zeros((1, config.t5.text_len), jnp.int32)
            if dtype == jnp.bfloat16 and config.t5.dim >= 1024:
                # umT5-XXL: a full fp32 init is ~19 GB — bf16 from shapes
                # (real weights come from the converter anyway)
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
        if init_clip and config.clip is not None:
            clip = CLIPVisual(config.clip, dtype=dtype)
            img = jnp.zeros((1, config.clip.image_size, config.clip.image_size, 3))
            clip_params = clip.init(c_rng, img)
        return cls(config, dit, dit_params, vae, vae_params, t5, t5_params,
                   clip, clip_params)

    # -- conditioning ---------------------------------------------------------

    def encode_text(self, ids, mask):
        ctx = self.t5.apply(self.t5_params, ids, mask)
        return (ctx * mask[:, :, None]).astype(jnp.float32)

    def clip_features(self, frame: jax.Array) -> jax.Array:
        """[B, H, W, 3] in [-1,1] → [B, 257, 1280] (reference
        wan/image2video.py:339-344: CLIP on the conditioning frame)."""
        x = preprocess_frames(frame, self.config.clip.image_size)
        return self.clip.apply(self.clip_params, x)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _encode_p(self, params, video):
        return self.vae.apply(params, video, method=self.vae.encode)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _decode_p(self, params, z):
        return self.vae.apply(params, z, method=self.vae.decode)

    def _encode(self, video):
        return self._encode_p(self.vae_params, video)

    def _decode(self, z):
        return self._decode_p(self.vae_params, z)

    def decode_auto(self, z):
        """Memory-aware decode: full-clip when small, exact cache-carried
        streaming (frame-by-frame) when full-clip decoder activations would
        not fit next to the resident DiT (single-chip 14B at 544×960)."""
        s = self.config.vae.stride
        out_px = z.shape[1] * s[0] * z.shape[2] * s[1] * z.shape[3] * s[2]
        if out_px * 96 * 4 < (2 << 30):
            return self._decode(z)
        from ..models.vae import streaming_decode

        return streaming_decode(self.vae, self.vae_params,
                                z.astype(jnp.bfloat16))

    def make_conditioning(
        self,
        cond_frames: jax.Array,
        frame_num: int,
        *,
        history_mode: bool = False,
        frame_zero: int = 32,
    ) -> jax.Array:
        """Build the 20-channel ``y`` conditioning (reference
        wan/image2video.py:288-369): 4 mask channels + VAE-encoded
        conditioning frames zero-padded to the full duration.

        cond_frames: [B, Fc, H, W, 3] pixel conditioning frames (1 frame for
        i2v; the history for v2v continuation).

        History mode caches the streaming-VAE encoder state: each
        autoregressive segment only encodes the NEW pixel frames and the
        zero tail (O(new) instead of the reference's O(full history) per
        segment, wan/image2video.py:490-503 — exactness comes from the
        causal VAE's carried caches, models/vae.py streaming API).
        """
        b, fc, h, w, _ = cond_frames.shape
        s = self.config.vae.stride
        lat_h, lat_w = h // s[1], w // s[2]
        pad_frames = frame_num - fc
        if history_mode:
            z_cond = self._encode_history_incremental(cond_frames, pad_frames)
        else:
            self._cond_cache = None
            padded = jnp.concatenate(
                [cond_frames,
                 jnp.zeros((b, pad_frames, h, w, 3), cond_frames.dtype)],
                axis=1,
            )
            z_cond = self._encode(padded)  # [B, F_lat, lat_h, lat_w, 16]
        msk = build_mask_channels(
            frame_num, lat_h, lat_w,
            cond_pixel_frames=fc if history_mode else 1, batch=b,
            stride_t=s[0],
        )
        return jnp.concatenate([msk, z_cond], axis=-1)

    def _stream_encode(self, frames, caches):
        """Chunked VAE encode resuming from carried caches (exact)."""
        from ..models.vae import _jit_encode_chunk

        fn = _jit_encode_chunk(self.vae)
        outs = []
        start = 0
        if caches is None:
            mu, caches = fn(self.vae_params, frames[:, :1], None)
            outs.append(mu)
            start = 1
        for i in range(start, frames.shape[1], 4):
            mu, caches = fn(self.vae_params, frames[:, i:i + 4], caches)
            outs.append(mu)
        return jnp.concatenate(outs, axis=1), caches

    def _encode_history_incremental(self, frames, pad_frames):
        b, fc, h, w, _ = frames.shape
        cache = getattr(self, "_cond_cache", None)
        if (cache is not None and 0 < cache["frames"] < fc
                and (fc - cache["frames"]) % 4 == 0
                and cache["hw"] == (h, w)):
            z_new, carry = self._stream_encode(
                frames[:, cache["frames"]:], cache["carry"])
            z_hist = jnp.concatenate([cache["z_hist"], z_new], axis=1)
        elif fc % 4 == 1:
            z_hist, carry = self._stream_encode(frames, None)
        else:
            # non-4n+1 history can't stream-chunk; fall back to full encode
            self._cond_cache = None
            padded = jnp.concatenate(
                [frames, jnp.zeros((b, pad_frames, h, w, 3), frames.dtype)],
                axis=1)
            return self._encode(padded)
        self._cond_cache = dict(frames=fc, carry=carry, z_hist=z_hist,
                                hw=(h, w))
        zeros = jnp.zeros((b, pad_frames, h, w, 3), frames.dtype)
        z_tail, _ = self._stream_encode(zeros, carry)
        return jnp.concatenate([z_hist, z_tail], axis=1)

    # -- sampling -------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 7, 8, 9))
    def _sample_cfg(self, params, noise, y, ctx, ctx_null, clip_ctx, steps,
                    shift, guide_scale):
        sig = sampling_sigmas(steps, shift)
        lfz = self.config.latent_frame_zero

        def denoise(latent, t_frame, context):
            # cfg_parallel doubles the latent batch (cond;uncond) — tile the
            # closed-over conditioning to match
            reps = latent.shape[0] // y.shape[0]
            y_ = jnp.concatenate([y] * reps, 0) if reps > 1 else y
            clip_ = (jnp.concatenate([clip_ctx] * reps, 0)
                     if reps > 1 and clip_ctx is not None else clip_ctx)
            x_in = jnp.concatenate([latent, y_], axis=-1).astype(jnp.bfloat16)
            if isinstance(params, tuple):  # int8 trunk (quantize_int8())
                from ..models.quantized import int8_dit_apply

                out = int8_dit_apply(
                    self.dit, params[0], params[1], x_in, t_frame, context,
                    latent_frame_zero=lfz, clip_context=clip_,
                    attn_impl=self.attn_impl).astype(latent.dtype)
            elif type(params).__name__ == "PPParams":  # pipeline parallel
                from ..parallel.pipeline import pp_dit_apply

                out = pp_dit_apply(
                    self.dit, params.other, params.staged, params.mesh,
                    x_in, t_frame, context, latent_frame_zero=lfz,
                    clip_context=clip_,
                    attn_impl=self.attn_impl).astype(latent.dtype)
            elif self.mesh is not None:  # multi-chip sequence parallelism
                from ..parallel.sp_forward import sp_dit_apply

                out = sp_dit_apply(
                    self.dit, params, self.mesh, x_in, t_frame, context,
                    latent_frame_zero=lfz, clip_context=clip_,
                    kind=self.sp_kind).astype(latent.dtype)
            else:
                out = self.dit.apply(
                    params, x_in, t_frame, context, packed=True,
                    latent_frame_zero=lfz, clip_context=clip_,
                    attn_impl=self.attn_impl,
                ).astype(latent.dtype)
            pad = jnp.zeros_like(latent[:, : latent.shape[1] - lfz])
            return jnp.concatenate([pad, out], axis=1)

        # the 14B loop starts from pure noise everywhere and re-noises the
        # history prefix every step (reference sample.py:756-790); the
        # "clean history" is the conditioning latent carried after the
        # stride_t mask channels of y
        clean_hist = y[..., self.config.vae.stride[0]:]
        latent0 = jnp.concatenate(
            [clean_hist[:, : noise.shape[1] - lfz], noise[:, -lfz:]], axis=1
        )
        return samplers.cfg_euler_sample_segment(
            denoise, latent0, noise, ctx, ctx_null, sig, lfz, guide_scale,
            batched_cfg=self.cfg_parallel,
        )

    @functools.partial(jax.jit,
                       static_argnums=(0, 7, 8, 9, 10, 11, 12))
    def _sample_cfg_tts(self, params, noise, y, ctx, ctx_null, clip_ctx,
                        steps, shift, guide_scale, interval, travel_steps,
                        sde, rng=None):
        """TTS sampling — the exact reference loop (fastvideo/sample/
        sample_tts.py:690-854): CFG Euler + history re-noise with time-travel
        splice-back (``interval``>0) and/or SDE churn (``sde``).
        Golden-tested against a transcription oracle in
        tests/test_tts_sampler.py."""
        sig = sampling_sigmas(steps, shift)
        lfz = self.config.latent_frame_zero

        def denoise(latent, t_frame, context):
            x_in = jnp.concatenate([latent, y], axis=-1).astype(jnp.bfloat16)
            if isinstance(params, tuple):
                from ..models.quantized import int8_dit_apply

                out = int8_dit_apply(
                    self.dit, params[0], params[1], x_in, t_frame, context,
                    latent_frame_zero=lfz, clip_context=clip_ctx,
                    attn_impl=self.attn_impl).astype(latent.dtype)
            elif self.mesh is not None:  # multi-chip sequence parallelism
                from ..parallel.sp_forward import sp_dit_apply

                out = sp_dit_apply(
                    self.dit, params, self.mesh, x_in, t_frame, context,
                    latent_frame_zero=lfz, clip_context=clip_ctx,
                    kind=self.sp_kind).astype(latent.dtype)
            else:
                out = self.dit.apply(
                    params, x_in, t_frame, context, packed=True,
                    latent_frame_zero=lfz, clip_context=clip_ctx,
                    attn_impl=self.attn_impl,
                ).astype(latent.dtype)
            pad = jnp.zeros_like(latent[:, : latent.shape[1] - lfz])
            return jnp.concatenate([pad, out], axis=1)

        clean_hist = y[..., self.config.vae.stride[0]:]
        latent0 = jnp.concatenate(
            [clean_hist[:, : noise.shape[1] - lfz], noise[:, -lfz:]], axis=1
        )
        return samplers.cfg_time_travel_sample_segment(
            denoise, latent0, noise, ctx, ctx_null, sig, lfz, guide_scale,
            interval=interval, travel_steps=travel_steps, sde=sde, rng=rng)

    @functools.partial(jax.jit, static_argnums=(0, 7, 8, 9, 10, 11, 12))
    def _sample_cfg_teacache(self, params, noise, y, ctx, ctx_null, clip_ctx,
                             steps, shift, guide_scale, cache_interval=2,
                             cache_edge=None, cache_threshold=None):
        """CFG sampling with TeaCache block-residual reuse (reference
        wan/modules/model.py:977-998): full DiT every ``cache_interval``
        steps per branch (cond/uncond caches kept separately).
        ``cache_edge`` = live blocks per side on cached steps (None →
        num_layers//4, the middle half cached — same semantics as
        TI2VPipeline._sample_segment_teacache)."""
        sig = sampling_sigmas(steps, shift)
        lfz = self.config.latent_frame_zero
        n = self.config.dit.num_layers
        edge = n // 4 if cache_edge is None else max(1, int(cache_edge))
        cache_list = tuple(range(edge, n - edge))

        def pad_v(latent, out):
            pad = jnp.zeros_like(latent[:, : latent.shape[1] - lfz])
            return jnp.concatenate([pad, out], axis=1)

        if isinstance(params, tuple):
            # quantized trunk: middle-chunk delta cache (models/quantized.py)
            from ..models.quantized import int8_dit_apply

            def full(latent, t_frame, context):
                x_in = jnp.concatenate([latent, y], axis=-1).astype(jnp.bfloat16)
                out, cache = int8_dit_apply(
                    self.dit, params[0], params[1], x_in, t_frame, context,
                    latent_frame_zero=lfz, clip_context=clip_ctx,
                    attn_impl=self.attn_impl, return_cache=True)
                return pad_v(latent, out.astype(latent.dtype)), cache

            def cached(latent, t_frame, context, cache):
                x_in = jnp.concatenate([latent, y], axis=-1).astype(jnp.bfloat16)
                out = int8_dit_apply(
                    self.dit, params[0], params[1], x_in, t_frame, context,
                    latent_frame_zero=lfz, clip_context=clip_ctx,
                    attn_impl=self.attn_impl, block_cache=cache)
                return pad_v(latent, out.astype(latent.dtype))
        elif self.mesh is not None:
            # multi-chip SP TeaCache: token-sharded residual cache kept
            # resident on its shards between steps (per CFG branch)
            from ..parallel.sp_forward import sp_dit_apply

            def full(latent, t_frame, context):
                x_in = jnp.concatenate([latent, y], axis=-1).astype(jnp.bfloat16)
                out, cache = sp_dit_apply(
                    self.dit, params, self.mesh, x_in, t_frame, context,
                    latent_frame_zero=lfz, clip_context=clip_ctx,
                    kind=self.sp_kind, cache_list=cache_list,
                    return_cache=True)
                return pad_v(latent, out.astype(latent.dtype)), cache

            def cached(latent, t_frame, context, cache):
                x_in = jnp.concatenate([latent, y], axis=-1).astype(jnp.bfloat16)
                out = sp_dit_apply(
                    self.dit, params, self.mesh, x_in, t_frame, context,
                    latent_frame_zero=lfz, clip_context=clip_ctx,
                    kind=self.sp_kind, cache_list=cache_list,
                    block_cache=cache)
                return pad_v(latent, out.astype(latent.dtype))
        else:
            def full(latent, t_frame, context):
                x_in = jnp.concatenate([latent, y], axis=-1).astype(jnp.bfloat16)
                out, cache = self.dit.apply(
                    params, x_in, t_frame, context, packed=True,
                    latent_frame_zero=lfz, clip_context=clip_ctx,
                    attn_impl=self.attn_impl, cache_list=cache_list,
                    return_cache=True)
                return pad_v(latent, out.astype(latent.dtype)), cache

            def cached(latent, t_frame, context, cache):
                x_in = jnp.concatenate([latent, y], axis=-1).astype(jnp.bfloat16)
                out = self.dit.apply(
                    params, x_in, t_frame, context, packed=True,
                    latent_frame_zero=lfz, clip_context=clip_ctx,
                    attn_impl=self.attn_impl, cache_list=cache_list,
                    block_cache=cache)
                return pad_v(latent, out.astype(latent.dtype))

        clean_hist = y[..., self.config.vae.stride[0]:]
        latent0 = jnp.concatenate(
            [clean_hist[:, : noise.shape[1] - lfz], noise[:, -lfz:]], axis=1
        )
        if cache_threshold is not None:
            return samplers.cfg_euler_sample_segment_cached_adaptive(
                full, cached, latent0, noise, ctx, ctx_null, sig, lfz,
                guide_scale, threshold=cache_threshold)
        out = samplers.cfg_euler_sample_segment_cached(
            full, cached, latent0, noise, ctx, ctx_null, sig, lfz,
            guide_scale, cache_interval=cache_interval)
        return out, jnp.asarray(-(-steps // cache_interval), jnp.int32)

    def quantize_int8(self, bits: int = 8):
        """Requantize the DiT trunk to int8 (models/quantized.py): ~½ the
        weight HBM — the path that fits 14B (28 GB bf16) on one 16 GB chip."""
        from ..models.quantized import quantize_dit_blocks

        if (not isinstance(self.dit_params, tuple)
                and type(self.dit_params).__name__ != "PPParams"):
            self.dit_params = quantize_dit_blocks(
                self.dit_params, self.config.dit.num_layers, bits=bits)

    def parallelize_pp(self, stages: int, *, devices=None):
        """Stage the bf16 trunk across a pp mesh (weights 1/S per chip):
        the other route to multi-chip 14B serving (vs quantization) —
        CFG denoising then runs through parallel/pipeline.py."""
        from ..parallel.pipeline import PPParams, prepare_pp

        if not isinstance(self.dit_params, (tuple, PPParams)):
            self.dit_params = prepare_pp(
                self.dit_params, self.config.dit.num_layers, stages,
                devices=devices)

    def generate(
        self,
        cond_frames: jax.Array,
        ctx: jax.Array,
        ctx_null: Optional[jax.Array],
        *,
        frame_num: int = 81,
        steps: int = 50,
        shift: Optional[float] = None,
        guide_scale: float = 5.0,
        history_mode: bool = False,
        seed: int = 0,
        sampler: str = "euler",
        teacache_interval: int = 3,
        teacache_edge: Optional[int] = None,
        teacache_threshold: Optional[float] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """One 14B segment: returns (latents [B, F_lat, h, w, 16], decoded
        video [B, frame_num, H, W, 3]). ``sampler``: 'euler' |
        'teacache' (block-residual caching; full DiT every
        ``teacache_interval``-th step per CFG branch, quality-gated
        on-chip).
        ``ctx_null=None`` is the DISTILLED few-step serving mode: one
        cond-only forward per step (the 5B path's 4-step trick composed
        with the 14B pipeline — guidance baked into distilled weights),
        halving per-segment cost at any step count."""
        shift = self.config.sample_shift if shift is None else shift
        b, fc, h, w, _ = cond_frames.shape
        s = self.config.vae.stride
        f_lat = (frame_num - 1) // s[0] + 1
        lat_h, lat_w = h // s[1], w // s[2]

        if self.phase_cb:
            self.phase_cb("vae")
        y = self.make_conditioning(cond_frames, frame_num,
                                   history_mode=history_mode)
        clip_frame = cond_frames[:, -1] if history_mode else cond_frames[:, 0]
        clip_ctx = (self.clip_features(clip_frame)
                    if self.clip is not None else None)
        if self.phase_cb:
            self.phase_cb("dit")
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (b, f_lat, lat_h, lat_w, self.config.vae.z_dim), jnp.float32)
        if (type(self.dit_params).__name__ == "PPParams"
                and sampler != "euler"):
            # mirror TI2V's guard: only _sample_cfg routes PPParams through
            # pp_dit_apply; the teacache/tts samplers would fall into the
            # dense dit.apply branch and fail with an opaque flax error
            raise NotImplementedError(
                f"pp trunk supports the euler sampler, got {sampler!r}")
        if ctx_null is None and sampler != "euler":
            raise NotImplementedError(
                "distilled (ctx_null=None) serving supports the euler "
                f"sampler, got {sampler!r}")
        if self.mesh is not None and isinstance(self.dit_params, tuple):
            raise NotImplementedError(
                "the int8/int4 storage trunk is single-chip; use --w8a8 "
                "(dynamic int8 MXU matmuls) for quantized SP serving")
        if sampler == "teacache" and teacache_interval < 1:
            raise ValueError(
                f"teacache_interval must be >= 1, got {teacache_interval}")
        if sampler == "teacache":
            latents, n_full = self._sample_cfg_teacache(
                self.dit_params, noise, y, ctx, ctx_null, clip_ctx, steps,
                shift, guide_scale, teacache_interval, teacache_edge,
                teacache_threshold)
            self.last_teacache_n_full = n_full
        elif sampler in ("sde", "time_travel", "tts"):
            # TTS: 'sde' = churn only, 'time_travel' = lookahead only,
            # 'tts' = both (reference sample_tts.py runs them combined)
            latents = self._sample_cfg_tts(
                self.dit_params, noise, y, ctx, ctx_null, clip_ctx, steps,
                shift, guide_scale,
                0 if sampler == "sde" else 2, 2,
                sampler in ("sde", "tts"),
                rng=jax.random.PRNGKey(seed + 7777))
        else:
            latents = self._sample_cfg(self.dit_params, noise, y, ctx,
                                       ctx_null, clip_ctx, steps, shift,
                                       guide_scale)
        if self.phase_cb:
            self.phase_cb("vae")
        return latents, self.decode_auto(latents)

    def generate_next(
        self,
        history_video: jax.Array,
        ctx: jax.Array,
        ctx_null: jax.Array,
        *,
        frame_zero: int = 32,
        steps: int = 50,
        shift: Optional[float] = None,
        guide_scale: float = 5.0,
        seed: int = 0,
        sampler: str = "euler",
        teacache_interval: int = 3,
        teacache_edge: Optional[int] = None,
        teacache_threshold: Optional[float] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Autoregressive continuation: re-condition on the decoded history
        video and denoise ``frame_zero`` new pixel frames (reference
        `generate_next`, wan/image2video.py:404-534 +
        fastvideo/sample/sample.py:864-885)."""
        b, fh, h, w, _ = history_video.shape
        frame_num = fh + frame_zero
        return self.generate(
            history_video, ctx, ctx_null, frame_num=frame_num, steps=steps,
            shift=shift, guide_scale=guide_scale, history_mode=True, seed=seed,
            sampler=sampler, teacache_interval=teacache_interval,
            teacache_edge=teacache_edge,
            teacache_threshold=teacache_threshold,
        )
