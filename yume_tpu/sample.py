"""Inference driver: t2v / i2v / autoregressive long-video sampling.

TPU-native equivalent of the reference sampling CLIs
(fastvideo/sample/sample.py, sample_tts.py, sample_5b.py and
scripts/inference/*.sh):

    python -m yume_tpu.sample --config ti2v-5B --t2v --prompt "..." --smoke
    python -m yume_tpu.sample --config ti2v-5B --jpg_dir ./jpg \
        --caption_file ./caption.txt --ckpt_dir ./Yume-5B-720P
    python -m yume_tpu.sample --config i2v-14B --sde ...   (TTS sampling)

``--smoke`` runs tiny shapes with random weights (fixture-driven smoke run,
the de-facto integration test mirroring scripts/inference/sample.sh against
test_video/).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="yume_tpu sampling")
    p.add_argument("--config", default="ti2v-5B", choices=["ti2v-5B", "i2v-14B"])
    p.add_argument("--ckpt_dir", default=None, help="dir with DiT/VAE/T5 torch checkpoints")
    p.add_argument("--t2v", action="store_true")
    p.add_argument("--prompt", default="Person moves forward (W).Camera remains still (·).")
    p.add_argument("--neg_prompt", default="")
    p.add_argument("--jpg_dir", default=None)
    p.add_argument("--caption_file", default=None,
                   help="per-line segment control captions (≙ caption.txt)")
    p.add_argument("--video_root_dir", default=None,
                   help="video-input mode: scan <dir>/<category>/*.mp4 with "
                        "sibling .txt control files, build the key/mouse "
                        "vocab caption, and continue generation from each "
                        "clip (≙ reference mp4_data over test_video/, "
                        "fastvideo/sample/sample.py:487-584)")
    p.add_argument("--input_video", default=None,
                   help="continue generation from a single .mp4 (caption "
                        "from --prompt, or a sibling .txt control file)")
    p.add_argument("--video_frames", type=int, default=33,
                   help="frames read from each input video (reference "
                        "total_frames_target=33)")
    p.add_argument("--num_euler_timesteps", "--steps", dest="steps", type=int, default=50)
    p.add_argument("--shift", type=float, default=None)
    p.add_argument("--guide_scale", type=float, default=5.0)
    p.add_argument("--frame_num", type=int, default=None)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=704)
    p.add_argument("--sample_num", type=int, default=1, help="autoregressive segments")
    p.add_argument("--sample_solver", default="euler",
                   choices=["euler", "unipc", "unipc3", "dpmpp"],
                   help="t2v solver (unipc/unipc3/dpmpp = stock Wan CFG "
                        "multistep loop, wan/text2video.py:110-267)")
    p.add_argument("--sde", action="store_true", help="TTS SDE churn sampling")
    p.add_argument("--time_travel", action="store_true", help="TTS lookahead sampling")
    p.add_argument("--int8", action="store_true",
                   help="int8-quantize the DiT trunk (halves weight HBM)")
    p.add_argument("--int4", action="store_true",
                   help="group-wise int4 DiT trunk (¼ weight HBM; fits 14B "
                        "on one 16 GB chip)")
    p.add_argument("--teacache", action="store_true",
                   help="block-residual caching between denoise steps")
    p.add_argument("--teacache_interval", type=int, default=3,
                   help="with --teacache: run the full DiT every N-th step "
                        "(1 full : N-1 cached). 3 is the quality-gated "
                        "best-serving default (bench.py headline); 2 is "
                        "more conservative")
    p.add_argument("--teacache_edge", type=int, default=None,
                   help="with --teacache: live blocks recomputed per side "
                        "on cached steps (default num_layers//4 — the "
                        "middle half is cached). Smaller = faster cached "
                        "steps, larger reuse error; swept on-chip by "
                        "scripts/bench_teacache_sweep.py")
    p.add_argument("--teacache_threshold", type=float, default=None,
                   help="with --teacache: DATA-ADAPTIVE refresh — run the "
                        "full DiT when the accumulated rel-L1 input delta "
                        "crosses this threshold (refreshes land where the "
                        "trajectory moves fast). Overrides "
                        "--teacache_interval. 0.1 is the quality-anchored "
                        "best-serving config (37.8 dB at 8/50 full steps "
                        "full-scale — docs/PERF.md round-5 sweep)")
    p.add_argument("--distilled", action="store_true",
                   help="few-step distilled serving for the 14B pipeline: "
                        "one cond-only forward per step (no CFG — guidance "
                        "is baked into distilled weights, the 5B 4-step "
                        "trick); pair with --steps 4..8")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel degree for segment denoising "
                        "(shards the token axis over an sp mesh axis; "
                        "needs that many devices)")
    p.add_argument("--sp_kind", default="ulysses",
                   choices=["ulysses", "ring", "usp"])
    p.add_argument("--pp", type=int, default=0,
                   help="pipeline-parallel stages for the bf16 trunk "
                        "(weights 1/S per chip — the unquantized route to "
                        "multi-chip 14B)")
    p.add_argument("--cfg_parallel", action="store_true",
                   help="run CFG cond+uncond as one batch-2 forward "
                        "(splits across a data mesh axis; xDiT cfg_degree "
                        "equivalent); 14B CFG path")
    p.add_argument("--w8a8", action="store_true",
                   help="int8×int8 MXU matmuls for the big block matmuls "
                        "(2x bf16 MXU peak on v5e; composes with --int4/"
                        "--int8 weight storage)")
    p.add_argument("--memory_optimization", action="store_true",
                   help="host-offload T5/VAE between phases (≙ reference "
                        "webapp CPU-GPU shuttling): required for single-chip "
                        "14B e2e where T5-XXL + int4 DiT + VAE exceed HBM")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_dir", default="./outputs")
    p.add_argument("--smoke", action="store_true", help="tiny shapes, random weights")
    p.add_argument("--tokenizer", default=None,
                   help="local umt5-xxl tokenizer dir (auto-discovered "
                        "inside --ckpt_dir); 'hash' forces the fallback")
    p.add_argument("--refine_prompt", action="store_true",
                   help="refine prompts (local HF model via --refiner_model, "
                        "template fallback otherwise)")
    p.add_argument("--refiner_model", default=None)
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of the run (xprof/"
                        "tensorboard logdir) + per-phase timing table")
    return p


def load_pipeline(args):
    from .configs import CONFIGS
    from .pipelines.i2v import I2VPipeline
    from .pipelines.ti2v import TI2VPipeline

    import dataclasses

    cfg = CONFIGS[args.config]()
    if args.smoke:
        from .configs import CLIPConfig, DiTConfig, T5Config, VAEConfig

        if cfg.name == "i2v-14B":
            # tiny 14B-shaped config (msk/y + CLIP branch), so the 14B CFG
            # driver paths run on CPU in tests
            cfg = dataclasses.replace(
                cfg,
                name="i2v-14B",
                dit=DiTConfig(model_type="i2v", in_dim=18, out_dim=8,
                              dim=128, ffn_dim=256, freq_dim=64, text_dim=32,
                              text_len=32, num_heads=4, num_layers=2,
                              framepack=True, image_context_len=5,
                              image_dim=12),
                vae=VAEConfig(z_dim=8, base_dim=8, dim_mult=(1, 2, 2),
                              num_res_blocks=1,
                              temporal_downsample=(True, False),
                              stride=(2, 4, 4), patchify=1, arch="wan21"),
                t5=T5Config(vocab_size=4096, dim=32, dim_attn=32, dim_ffn=48,
                            num_heads=2, num_layers=1, text_len=32),
                clip=CLIPConfig(image_size=16, patch_size=8, dim=12,
                                num_heads=2, num_layers=1, out_tokens=5),
                latent_frame_zero=2,
            ).check_i2v_channels()
        else:
            cfg = dataclasses.replace(
                cfg,
                dit=DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=128,
                              ffn_dim=256, freq_dim=64, text_dim=32,
                              text_len=32, num_heads=4, num_layers=2,
                              framepack=True),
                vae=VAEConfig(z_dim=8, base_dim=8, dim_mult=(1, 2, 2),
                              num_res_blocks=1,
                              temporal_downsample=(True, False),
                              stride=(2, 8, 8), patchify=2),
                t5=T5Config(vocab_size=4096, dim=32, dim_attn=32, dim_ffn=48,
                            num_heads=2, num_layers=1, text_len=32),
                latent_frame_zero=2,
            )
    if getattr(args, "w8a8", False):
        cfg = dataclasses.replace(
            cfg, dit=dataclasses.replace(cfg.dit, w8a8=True))
    cls = I2VPipeline if cfg.name == "i2v-14B" else TI2VPipeline
    # init shapes: packed mode needs at least one history frame beyond the
    # latent_frame_zero tail (the 14B lfz=9 breaks a 2-frame init)
    f_init = 3 if args.smoke else cfg.latent_frame_zero + 1
    extra = {}
    if cls is I2VPipeline:
        # 14B quantized serving: never materialize the 28 GB bf16 trunk —
        # weights stream host→int4 later (quantize_host_blocks)
        extra = dict(init_clip=True,
                     init_dit=not (args.int8 or args.int4))
    pipe = cls.from_config(
        cfg, jax.random.PRNGKey(args.seed), init_t5=True,
        latent_shape=(f_init, 4, 4) if args.smoke else (f_init, 16, 16),
        dtype=jnp.float32 if args.smoke else jnp.bfloat16,
        **extra,
    )
    if args.ckpt_dir:
        if not os.path.isdir(args.ckpt_dir):
            raise SystemExit(f"--ckpt_dir {args.ckpt_dir!r} is not a "
                             "directory")
        load_torch_weights(pipe, args.ckpt_dir,
                           load_dit=pipe.dit_params is not None)
    elif not args.smoke:
        import warnings

        warnings.warn(
            "no --ckpt_dir: running with RANDOM weights (capability/perf "
            "runs only — outputs are noise). Pass --ckpt_dir with the "
            "released torch checkpoints for real generation.", stacklevel=2)
    return cfg, pipe


def load_torch_weights(pipe, ckpt_dir: str, *, load_dit: bool = True,
                       strict: bool = True):
    """Load released torch checkpoints (safetensors DiT + .pth VAE/T5).

    ``strict`` (default): missing components RAISE instead of silently
    leaving random-init modules behind — the reference hard-requires every
    file in ``checkpoint_dir`` (wan/text2video.py:66-84), and a random VAE
    or T5 silently produces garbage latents/conditioning."""
    from .utils.checkpoint import (convert_dit_state_dict,
                                   convert_t5_state_dict,
                                   convert_vae22_state_dict,
                                   load_safetensors_state_dict)

    import torch

    # check presence of EVERY component before mutating the pipe — a strict
    # failure must not leave a half-loaded (real-DiT/random-VAE) pipeline
    missing = []
    dit_sd = None
    if load_dit:
        dit_sd = load_safetensors_state_dict(ckpt_dir)
        if not dit_sd:
            missing.append("DiT (*.safetensors [+ index.json])")
    vae_file = ("Wan2.2_VAE.pth" if pipe.config.vae.arch == "wan22"
                else "Wan2.1_VAE.pth")
    vae_path = os.path.join(ckpt_dir, vae_file)
    if not os.path.exists(vae_path):
        missing.append(vae_file)
    t5_path = os.path.join(ckpt_dir, "models_t5_umt5-xxl-enc-bf16.pth")
    if not os.path.exists(t5_path):
        missing.append("models_t5_umt5-xxl-enc-bf16.pth")
    clip_file = "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"
    clip_path = os.path.join(ckpt_dir, clip_file)
    has_clip = getattr(pipe, "clip", None) is not None
    if has_clip and not os.path.exists(clip_path):
        missing.append(clip_file)
    if missing and strict:
        raise RuntimeError(
            f"checkpoint dir {ckpt_dir!r} is missing: {', '.join(missing)} "
            "— refusing to run with random-init modules (pass strict=False "
            "to load the subset that is present)")

    if dit_sd:
        pipe.dit_params = convert_dit_state_dict(
            dit_sd, pipe.config.dit.num_layers)
    if os.path.exists(vae_path):
        if pipe.config.vae.arch == "wan22":
            pipe.vae_params = convert_vae22_state_dict(
                torch.load(vae_path, map_location="cpu"),
                num_res_blocks=pipe.config.vae.num_res_blocks)
        else:
            from .utils.checkpoint import convert_vae21_state_dict

            pipe.vae_params = convert_vae21_state_dict(
                torch.load(vae_path, map_location="cpu"),
                num_res_blocks=pipe.config.vae.num_res_blocks)
    if os.path.exists(t5_path):
        pipe.t5_params = convert_t5_state_dict(
            torch.load(t5_path, map_location="cpu"), pipe.config.t5.num_layers)
    if has_clip and os.path.exists(clip_path):
        from .utils.checkpoint import convert_clip_visual_state_dict

        pipe.clip_params = convert_clip_visual_state_dict(
            torch.load(clip_path, map_location="cpu"),
            num_layers=pipe.config.clip.num_layers)


def _host_dit_tree(args, cfg, pipe):
    """Host (numpy) DiT param tree for the streamed-quantization path:
    the converted torch checkpoint when --ckpt_dir is given, otherwise a
    synthesized random tree (capability/perf runs)."""
    from .utils.checkpoint import (convert_dit_state_dict,
                                   load_safetensors_state_dict)

    if args.ckpt_dir and os.path.isdir(args.ckpt_dir):
        try:
            sd = load_safetensors_state_dict(args.ckpt_dir)
            return convert_dit_state_dict(sd, cfg.dit.num_layers)
        except FileNotFoundError:
            pass
    rng = np.random.default_rng(args.seed)
    lfz = cfg.latent_frame_zero
    x = jnp.zeros((1, lfz + 1, 4, 4, cfg.dit.in_dim))
    t = jnp.zeros((1, lfz + 1))
    ctx = jnp.zeros((1, cfg.dit.text_len, cfg.dit.text_dim))
    clip_ctx = (jnp.zeros((1, cfg.dit.image_context_len, cfg.dit.image_dim))
                if cfg.dit.image_context_len else None)
    shapes = jax.eval_shape(
        lambda k: pipe.dit.init(k, x, t, ctx, packed=True,
                                latent_frame_zero=lfz,
                                clip_context=clip_ctx),
        jax.random.PRNGKey(args.seed))
    return jax.tree_util.tree_map(
        lambda s: (rng.standard_normal(s.shape, dtype=np.float32) * 0.02
                   if s.size > 1 else np.zeros(s.shape, np.float32)),
        shapes)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.teacache and args.teacache_interval < 1:
        # 0 would ZeroDivisionError inside jit tracing (i % interval);
        # negatives silently run the full DiT only at step 0
        raise SystemExit(
            f"--teacache_interval must be >= 1, got {args.teacache_interval}")
    os.makedirs(args.output_dir, exist_ok=True)

    from .utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from .data.tokenizer import Tokenizer

    cfg, pipe = load_pipeline(args)
    if args.sp > 1:
        from .parallel.mesh import make_mesh, make_usp_mesh

        assert len(jax.devices()) >= args.sp, (len(jax.devices()), args.sp)
        if args.sp_kind == "usp":
            pipe.mesh = make_usp_mesh(data=1, fsdp=1, sp_u=2,
                                      sp_r=args.sp // 2,
                                      devices=jax.devices()[: args.sp])
        else:
            pipe.mesh = make_mesh(data=1, fsdp=1, sp=args.sp,
                                  devices=jax.devices()[: args.sp])
        pipe.sp_kind = args.sp_kind
    if args.cfg_parallel and hasattr(pipe, "cfg_parallel"):
        pipe.cfg_parallel = True
    if args.pp > 1:
        pipe.parallelize_pp(args.pp)
    from .utils.logging_ import phase

    slot = None
    if args.memory_optimization:
        # park T5/VAE in host RAM; each visits HBM only for its phase
        # (≙ reference webapp memory_optimization, webapp_single_gpu.py:
        # 601-608,819-852) — the configuration that fits 14B e2e on 16 GB.
        # Runs BEFORE quantization so T5-XXL has left HBM by the time the
        # int4 trunk streams in.
        from .utils.offload import OffloadSlot

        slot = OffloadSlot()
        if pipe.t5_params is not None:
            slot.register("t5", pipe.t5_params)
            pipe.t5_params = None
        slot.register("vae", pipe.vae_params)
        pipe.vae_params = None

        def _phase(name):
            # slot.use evicts every other slot's device copy; drop the
            # pipeline's own references so the buffers actually free
            if name == "t5":
                if "dit_q" in slot:
                    pipe.dit_params = None
                pipe.vae_params = None
                pipe.t5_params = slot.use("t5")
            elif name == "vae":
                if "dit_q" in slot:
                    pipe.dit_params = None
                pipe.t5_params = None
                pipe.vae_params = slot.use("vae")
            else:  # dit
                pipe.t5_params = None
                pipe.vae_params = None
                if "dit_q" in slot:
                    pipe.dit_params = slot.use("dit_q")

        slot.phase = _phase
        if hasattr(pipe, "phase_cb"):
            pipe.phase_cb = _phase

    # the quantized trunk runs packed segments AND unpacked euler t2v;
    # only multistep-solver t2v still needs the bf16 trunk (quantized after
    # its first segment)
    if (args.int8 or args.int4) and not (
            args.t2v and args.sample_solver != "euler"):
        bits = 4 if args.int4 else 8
        if pipe.dit_params is None:
            # 14B: weights stream host→quantized, one block on-device at a
            # time (quantize_host_blocks) — the bf16 trunk never exists
            from .models.quantized import quantize_host_blocks

            pipe.dit_params = quantize_host_blocks(
                _host_dit_tree(args, cfg, pipe), cfg.dit.num_layers, bits)
            if slot is not None and getattr(pipe, "phase_cb", None):
                # the int4 trunk (8 GiB) cannot coexist with T5-XXL
                # (9.4 GiB): it joins the phase shuttle like the others
                slot.register("dit_q", pipe.dit_params)
                pipe.dit_params = None
                pipe.phase_cb("dit")
        else:
            pipe.quantize_int8(bits=bits)
    from .data.tokenizer import resolve_tokenizer_path

    tok = Tokenizer(resolve_tokenizer_path(args.tokenizer, args.ckpt_dir),
                    seq_len=cfg.t5.text_len, vocab_size=cfg.t5.vocab_size,
                    warn_fallback=not args.smoke)

    def encode(text):
        with phase("t5_encode"):
            if slot is not None:
                slot.phase("t5")
            ids, mask = tok([text])
            return pipe.encode_text(jnp.asarray(ids), jnp.asarray(mask))

    if args.smoke:
        size, frame_num, steps = (32, 32), 5, 2
    else:
        size = (args.width, args.height)
        frame_num = args.frame_num or cfg.frame_num
        steps = args.steps

    captions = [args.prompt]
    if args.caption_file:
        captions = ([l.strip() for l in open(args.caption_file) if l.strip()]
                    or [args.prompt])
    if args.refine_prompt:
        from .data.prompt_refine import get_refiner

        refiner = get_refiner(args.refiner_model)
        captions = [refiner(c) for c in captions]
    sampler = ("tts" if args.sde and args.time_travel else
               "sde" if args.sde else
               "time_travel" if args.time_travel else
               "teacache" if args.teacache else "euler")

    import contextlib

    from .utils.logging_ import phase_summary, profile

    with contextlib.ExitStack() as _prof:
        if args.profile_dir:
            _prof.enter_context(profile(args.profile_dir))
        rc = _run(args, cfg, pipe, encode, captions, sampler,
                  size, frame_num, steps, slot)
    if args.profile_dir:
        phase_summary()
    return rc


# fixed camera-metrics suffix appended to video-mode captions (reference
# fastvideo/sample/sample.py:689 — a constant, not a computed value)
_VIDEO_METRICS_SUFFIX = (
    "Actual distance moved:4.3697374288015297 at 100 meters per second."
    "Angular change rate (turn speed):4.520279996588001."
    "View rotation speed:4.14601429683874179.")


def iter_video_samples(args, size):
    """Yield (video [1, F, H, W, 3] in [-1,1], caption) from --input_video
    and/or --video_root_dir (category scan ≙ reference mp4_data,
    fastvideo/sample/sample.py:487-584: per-clip .txt control files →
    key/mouse vocab captions)."""
    import glob

    from .data.controls import control_caption, parse_control_txt
    from .data.dataset import read_video_frames

    n_frames = 5 if args.smoke else args.video_frames

    def load(mp4, caption):
        txt = mp4[:-4] + ".txt"
        if os.path.exists(txt):
            keys, mouse, _, _ = parse_control_txt(txt)
            if keys is not None or mouse is not None:
                caption = control_caption(keys or "None", mouse or "·")
        video = read_video_frames(mp4, list(range(n_frames)),
                                  size=(size[1], size[0]))
        return jnp.asarray(video)[None], caption

    if args.input_video:
        yield load(args.input_video, args.prompt) + ("video000",)
    if args.video_root_dir:
        # multi-host: stride the scan so each process serves disjoint clips
        # (≙ reference (step-1)*world_size+rank, fastvideo/sample/sample.py:667)
        p_idx, p_cnt = jax.process_index(), jax.process_count()
        files = [mp4
                 for sub in sorted(glob.glob(os.path.join(args.video_root_dir, "*/")))
                 for mp4 in sorted(glob.glob(os.path.join(sub, "*.mp4")))]
        for i, mp4 in enumerate(files[p_idx::p_cnt]):
            # tag by GLOBAL file index so hosts sharing an output_dir never
            # collide (local index i ↔ global p_idx + i*p_cnt)
            yield load(mp4, args.prompt) + (f"video{p_idx + i * p_cnt:03d}",)


def _run_video(args, cfg, pipe, encode, sampler, size, steps, slot=None):
    """Video-input inference: continue generation from existing clips
    (reference video mode of sample_one, fastvideo/sample/sample.py:
    686-714: the clip becomes the history — first frame repeated 16×
    prepended — and `generate` runs with flag_sample frame_zero=32)."""
    from .pipelines.i2v import I2VPipeline
    from .utils.logging_ import phase
    from .utils.video import save_video

    def vae_phase():
        if slot is not None:
            slot.phase("vae")

    n_out = 0
    for video, caption, tag in iter_video_samples(args, size):
        cap = caption + _VIDEO_METRICS_SUFFIX
        ctx = encode(cap)
        t0 = time.time()
        if isinstance(pipe, I2VPipeline):
            # --distilled: cond-only few-step serving, same as the jpg path
            ctx_null = (None if args.distilled
                        else encode(args.neg_prompt or cfg.sample_neg_prompt))
            # first frame ×16 prepended (reference sample.py:711); the
            # repeat count is nudged so the history length is ≡1 (mod s0)
            # and streams through the causal VAE exactly
            s0 = cfg.vae.stride[0]
            rep = 4 * s0 + ((1 - video.shape[1] - 4 * s0) % s0)
            history = jnp.concatenate(
                [jnp.repeat(video[:, :1], rep, axis=1), video], axis=1)
            # sampling-time tail: 32 px frames for the 14B (flag_sample
            # frame_zero, reference wan/image2video.py:275)
            frame_zero = (cfg.latent_frame_zero - 1) * s0
            for s_idx in range(args.sample_num):
                with phase("generate_next"):
                    latents, decoded = pipe.generate_next(
                        history, ctx, ctx_null, frame_zero=frame_zero,
                        steps=steps, shift=args.shift,
                        guide_scale=args.guide_scale,
                        seed=args.seed + s_idx, sampler=sampler,
                        teacache_interval=args.teacache_interval,
                        teacache_edge=args.teacache_edge,
                        teacache_threshold=args.teacache_threshold)
                out = os.path.join(
                    args.output_dir, f"{tag}_seg{s_idx:03d}.mp4")
                save_video(np.asarray(decoded[0, -frame_zero:]), out,
                           fps=cfg.sample_fps)
                n_out += 1
                history = decoded  # growing history re-conditioning
        else:
            # 5B path: VAE-encode the clip as history latents, then the
            # packed segment rollout continues it
            vae_phase()
            latents = pipe.encode_auto(video)
            for s_idx in range(args.sample_num):
                with phase("generate"):
                    latents = pipe.generate_segment(
                        latents, ctx, steps=steps,
                        shift=args.shift or cfg.sample_shift,
                        seed=args.seed + s_idx, sampler=sampler,
                        teacache_interval=args.teacache_interval,
                        teacache_edge=args.teacache_edge,
                        teacache_threshold=args.teacache_threshold)
                vae_phase()
                tail = pipe.decode_auto(
                    latents[:, -cfg.latent_frame_zero:])
                out = os.path.join(
                    args.output_dir, f"{tag}_seg{s_idx:03d}.mp4")
                save_video(np.asarray(tail[0]), out, fps=cfg.sample_fps)
                n_out += 1
        print(f"--> {tag}: {args.sample_num} segment(s) in "
              f"{time.time() - t0:.1f}s ({caption[:60]})")
    if n_out == 0:
        raise FileNotFoundError(
            f"no input videos found under {args.video_root_dir or args.input_video}")
    return 0


def _run(args, cfg, pipe, encode, captions, sampler, size, frame_num, steps,
         slot=None):
    from .pipelines.i2v import I2VPipeline
    from .utils.logging_ import phase
    from .utils.video import load_image, save_video

    if args.input_video or args.video_root_dir:
        return _run_video(args, cfg, pipe, encode, sampler, size, steps, slot)

    def vae_phase():
        if slot is not None:
            slot.phase("vae")

    t0 = time.time()
    if isinstance(pipe, I2VPipeline):
        # 14B CFG path (reference fastvideo/sample/sample.py): image (or
        # first video frame) conditioning, CFG Euler, generate_next rollout
        if args.jpg_dir is None:
            raise SystemExit(
                "the 14B i2v pipeline needs --jpg_dir (image mode), "
                "--input_video, or --video_root_dir")
        ctx = encode(captions[0])
        ctx_null = (None if args.distilled
                    else encode(args.neg_prompt or cfg.sample_neg_prompt))
        img = load_image(
            sorted(os.path.join(args.jpg_dir, f) for f in os.listdir(args.jpg_dir)
                   if f.lower().endswith((".jpg", ".png", ".jpeg")))[0],
            size=(size[1], size[0]),
        )
        with phase("generate"):
            latents, video = pipe.generate(
                jnp.asarray(img)[None, None], ctx, ctx_null,
                frame_num=frame_num, steps=steps, shift=args.shift,
                guide_scale=args.guide_scale, seed=args.seed, sampler=sampler,
                teacache_interval=args.teacache_interval,
                        teacache_edge=args.teacache_edge,
                        teacache_threshold=args.teacache_threshold)
        save_video(np.asarray(video[0]),
                   os.path.join(args.output_dir, "segment_000.mp4"),
                   fps=cfg.sample_fps)
        for s_idx in range(1, args.sample_num):
            cap = captions[min(s_idx, len(captions) - 1)]
            ctx = encode(cap)
            with phase("generate_next"):
                latents, video = pipe.generate_next(
                    video, ctx, ctx_null, frame_zero=32, steps=steps,
                    shift=args.shift, guide_scale=args.guide_scale,
                    seed=args.seed + s_idx)
            save_video(np.asarray(video[0, -32:]),
                       os.path.join(args.output_dir, f"segment_{s_idx:03d}.mp4"),
                       fps=cfg.sample_fps)
        print(f"--> {args.sample_num} segment(s) in {time.time() - t0:.1f}s")
        return 0

    if args.t2v or args.jpg_dir is None:
        ctx = encode(captions[0])
        # T5 work must finish before vae_phase(): under --memory_optimization
        # each encode() re-stages T5 and evicts the VAE, so a late ctx_null
        # would leave generate_t2v's internal decode without VAE params
        ctx_null = (encode(args.neg_prompt or cfg.sample_neg_prompt)
                    if args.sample_solver != "euler" else None)
        with phase("generate"):
            vae_phase()  # 5B fits with VAE resident; internal decode needs it
            video = pipe.generate_t2v(
                ctx, size=size if not args.smoke else (32, 32),
                frame_num=frame_num, steps=steps, shift=args.shift,
                seed=args.seed, solver=args.sample_solver,
                ctx_null=ctx_null,
                guide_scale=args.guide_scale,
            )
        with phase("vae_encode"):
            vae_phase()
            first_latents = pipe.encode_auto(video)
        if args.int8 or args.int4:
            pipe.quantize_int8(bits=4 if args.int4 else 8)
    else:
        img = load_image(
            sorted(os.path.join(args.jpg_dir, f) for f in os.listdir(args.jpg_dir)
                   if f.lower().endswith((".jpg", ".png", ".jpeg")))[0],
            size=(size[1], size[0]),
        )
        # repeat-N first-frame conditioning (reference sample.py:711 uses 16;
        # clamp to the requested duration)
        frames = jnp.asarray(np.repeat(img[None], min(16, frame_num), 0))[None]
        vae_phase()
        first_latents, _ = pipe.encode_image_conditioning(frames, frame_num)
        ctx = encode(captions[0])
        with phase("generate"):
            first_latents = pipe.generate_segment(
                first_latents[:, : -cfg.latent_frame_zero], ctx,
                steps=steps, shift=args.shift or cfg.sample_shift,
                seed=args.seed, sampler=sampler,
                teacache_interval=args.teacache_interval,
                        teacache_edge=args.teacache_edge,
                        teacache_threshold=args.teacache_threshold)
        with phase("vae_decode"):
            vae_phase()
            video = pipe.decode_auto(first_latents)

    out0 = os.path.join(args.output_dir, "segment_000.mp4")
    save_video(np.asarray(video[0]), out0, fps=cfg.sample_fps)
    print(f"--> segment 0 written to {out0} "
          f"({time.time() - t0:.1f}s, frames={video.shape[1]})")

    # autoregressive continuation, one segment per remaining caption
    latents = first_latents
    for s in range(1, args.sample_num):
        cap = captions[min(s, len(captions) - 1)]
        ctx = encode(cap)
        t1 = time.time()
        with phase("generate"):
            latents = pipe.generate_segment(
                latents, ctx, steps=steps, shift=args.shift or 7.0,
                seed=args.seed + s, sampler=sampler,
                teacache_interval=args.teacache_interval,
                        teacache_edge=args.teacache_edge,
                        teacache_threshold=args.teacache_threshold)
        with phase("vae_decode"):
            vae_phase()
            tail_video = pipe.decode_auto(latents[:, -cfg.latent_frame_zero:])
        out = os.path.join(args.output_dir, f"segment_{s:03d}.mp4")
        save_video(np.asarray(tail_video[0]), out, fps=cfg.sample_fps)
        print(f"--> Function running time: {time.time() - t1:.4f} s ({out})")

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
