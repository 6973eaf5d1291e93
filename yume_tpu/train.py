"""Training driver: flow-matching (+MVDT, +ADD distillation) fine-tuning.

TPU-native equivalent of the reference training entry
(fastvideo/distill_model.py + scripts/finetune/finetune.sh): instead of
torchrun+NCCL+FSDP, one SPMD program over a `jax.sharding.Mesh` — params
sharded on the ``fsdp`` axis, batches on ``data``, grads all-reduced by XLA.

    python -m yume_tpu.train --smoke                       # tiny synthetic run
    python -m yume_tpu.train --data_dir ./mp4_frame --MVDT --Distil \
        --ckpt_dir ./Yume-5B-720P --output_dir ./ckpts
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="yume_tpu training")
    p.add_argument("--config", default="ti2v-5B", choices=["ti2v-5B", "i2v-14B"])
    p.add_argument("--data_dir", default=None)
    p.add_argument("--full_mp4_dir", default=None)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--encoders_dir", default=None,
                   help="dir with VAE/T5 .pth weights for the encode path "
                        "(defaults to --ckpt_dir)")
    p.add_argument("--tokenizer_path", default=None,
                   help="local HF/sentencepiece tokenizer dir (umt5-xxl)")
    p.add_argument("--output_dir", default="./checkpoints")
    p.add_argument("--max_train_steps", type=int, default=100)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "adam8bit"])
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--checkpointing_steps", type=int, default=25)
    p.add_argument("--validation_steps", type=int, default=0)
    p.add_argument("--MVDT", action="store_true")
    p.add_argument("--Distil", action="store_true")
    p.add_argument("--dino_path", default=None,
                   help="DINO ViT-S/16 weights (dino_deitsmall16_pretrain.pth)"
                        " for the frozen discriminator projector")
    p.add_argument("--num_frames", type=int, default=33)
    p.add_argument("--height", type=int, default=352)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--data_parallel", type=int, default=1)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel degree: the train-step forward "
                        "runs the differentiable SP trunk over the mesh's sp "
                        "axis (≙ reference training SP init, "
                        "fastvideo/distill_model.py:478 + the autograd "
                        "collectives of utils/communications.py:106-131)")
    p.add_argument("--sp_kind", default="ulysses",
                   choices=["ulysses", "ring", "usp"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--remat", action="store_true",
                   help="activation checkpointing per DiT block")
    p.add_argument("--lora_rank", type=int, default=0,
                   help="train LoRA adapters of this rank instead of full "
                        "params (base frozen; single-chip 5B finetune)")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--export_torch_dir", default=None,
                   help="after training, export the EMA DiT to the "
                        "reference's sharded-safetensors torch layout "
                        "(TPU-trained -> torch-served interchange)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace over the step window "
                        "given by --profile_steps (xprof/tensorboard logdir)")
    p.add_argument("--profile_steps", default="2,5",
                   help="start,stop step bounds for --profile_dir capture")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    from .utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    from .configs import CONFIGS, DiTConfig
    from .models.dit import WanDiT
    from .parallel.mesh import make_mesh, shard_params
    from .training.train_step import (TrainConfig, init_train_state,
                                      make_train_step)
    from .utils.checkpoint import restore_checkpoint
    from .utils.logging_ import main_print

    cfg = CONFIGS[args.config]()
    dit_cfg = cfg.dit
    lfz = cfg.latent_frame_zero
    is_i2v = dit_cfg.model_type == "i2v"
    if args.smoke:
        from .configs import CLIPConfig, PipelineConfig, T5Config, VAEConfig

        if is_i2v:
            # tiny 14B-shaped config: 16→8 latent ch, 20→10 cond ch (msk=s0,
            # stride_t=2), CLIP branch with 5 tokens
            dit_cfg = DiTConfig(model_type="i2v", in_dim=18, out_dim=8,
                                dim=64, ffn_dim=128, freq_dim=32, text_dim=16,
                                text_len=16, num_heads=4, num_layers=2,
                                framepack=True, mvdt=args.MVDT,
                                image_context_len=5, image_dim=12)
            cfg = PipelineConfig(
                name="smoke-i2v", dit=dit_cfg,
                vae=VAEConfig(z_dim=8, base_dim=8, dim_mult=(1, 2, 2),
                              num_res_blocks=1,
                              temporal_downsample=(True, False),
                              stride=(2, 4, 4), patchify=1, arch="wan21"),
                t5=T5Config(vocab_size=256, dim=16, dim_attn=16, dim_ffn=24,
                            num_heads=2, num_layers=1, text_len=16),
                clip=CLIPConfig(image_size=16, patch_size=8, dim=12,
                                num_heads=2, num_layers=1, out_tokens=5),
                latent_frame_zero=2).check_i2v_channels()
        else:
            dit_cfg = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64,
                                ffn_dim=128, freq_dim=32, text_dim=16,
                                text_len=16, num_heads=4, num_layers=2,
                                framepack=True, mvdt=args.MVDT)
            # a full tiny pipeline config so the --data_dir encode path
            # (VAE/T5) runs at smoke scale too
            cfg = PipelineConfig(
                name="smoke", dit=dit_cfg,
                vae=VAEConfig(z_dim=8, base_dim=8, dim_mult=(1, 2, 2),
                              num_res_blocks=1,
                              temporal_downsample=(True, False),
                              stride=(2, 8, 8), patchify=2),
                t5=T5Config(vocab_size=256, dim=16, dim_attn=16, dim_ffn=24,
                            num_heads=2, num_layers=1, text_len=16),
                latent_frame_zero=2)
        lfz = 2
        args.max_train_steps = min(args.max_train_steps, 5)
        if args.data_dir:
            args.num_frames, args.height, args.width = 9, 64, 64
    elif args.MVDT:
        dit_cfg = dataclasses.replace(dit_cfg, mvdt=True)

    if args.sp > 1 and args.sp_kind == "usp":
        from .parallel.mesh import make_usp_mesh

        mesh = make_usp_mesh(data=args.data_parallel, fsdp=1, sp_u=2,
                             sp_r=args.sp // 2)
    else:
        mesh = make_mesh(data=args.data_parallel, fsdp=-1, sp=args.sp)
    main_print(f"mesh: {dict(mesh.shape)} on {len(jax.devices())} devices")
    # the dp/fsdp step is GSPMD-auto-partitioned (plain jit + sharding
    # annotations) — Mosaic kernels can't be auto-partitioned, so they must
    # trace as their jnp fallbacks (ops/partitioning.py). The --sp trunk is
    # shard_map'd (local shapes) and keeps the Pallas kernels. Assign (not
    # just set) so repeated main() calls in one process stay deterministic.
    from .ops.partitioning import set_auto_spmd

    set_auto_spmd(mesh.devices.size > 1 and args.sp <= 1)

    dtype = jnp.float32 if args.smoke else jnp.bfloat16
    dit = WanDiT(dit_cfg, dtype=dtype, remat=args.remat)

    if args.sp > 1:
        # sequence-parallel training: the flow-pass forward runs the
        # differentiable SP trunk (parallel/sp_forward.py) sharded over the
        # mesh's sp axis — 720p/long-history steps whose activations exceed
        # one chip become trainable. MVDT's token masking reorders the
        # sharded sequence, so the masked pass stays dense-only.
        assert not args.MVDT, "--sp composes with the plain/Distil flow " \
            "step; MVDT token masking is dense-only"
        assert not args.lora_rank, "--sp with --lora_rank is not supported"
        from .parallel.sp_forward import sp_dit_apply

        def fwd_apply(params, x, t_frame, ctx, *, packed=True,
                      latent_frame_zero=lfz, clip_context=None, **kw):
            assert packed and not kw, (packed, kw)
            return sp_dit_apply(dit, params, mesh, x, t_frame, ctx,
                                latent_frame_zero=latent_frame_zero,
                                clip_context=clip_context, kind=args.sp_kind)
    else:
        fwd_apply = dit.apply

    # latent geometry
    if args.smoke:
        b, f, h, w = 1, 3 + lfz, 8, 8
        text_len, text_dim = dit_cfg.text_len, dit_cfg.text_dim
    else:
        b = args.data_parallel
        f = (args.num_frames - 1) // cfg.vae.stride[0] + 1 + lfz
        h = args.height // cfg.vae.stride[1]
        w = args.width // cfg.vae.stride[2]
        text_len, text_dim = dit_cfg.text_len, dit_cfg.text_dim

    rng = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((1, f, h, w, dit_cfg.in_dim))
    t0 = jnp.zeros((1, f))
    c0 = jnp.zeros((1, text_len, text_dim))
    init_kw = {}
    if dit_cfg.image_context_len:
        init_kw["clip_context"] = jnp.zeros(
            (1, dit_cfg.image_context_len, dit_cfg.image_dim))
    mvdt_keeps = None
    if args.MVDT:
        # the reference samples mask_ratio ~ U[0.3, 0.5] per step
        # (wan23/modules/model.py:766-767); keep counts must be static under
        # jit, so we quantise — 9 ratios at 0.025 spacing (≤1.25% off any
        # continuous draw) → 9 cached compilations (docs/ARCHITECTURE.md)
        l_unpacked = f * (h // dit_cfg.patch_size[1]) * (w // dit_cfg.patch_size[2])
        ratios = [0.30 + 0.025 * i for i in range(9)]
        mvdt_keeps = [int(l_unpacked * (1.0 - r)) for r in ratios]
        init_kw.update(mvdt_rng=jax.random.PRNGKey(0), mvdt_keep=mvdt_keeps[0])
    params = dit.init(rng, x0, t0, c0, packed=True, latent_frame_zero=lfz, **init_kw)
    if args.ckpt_dir:
        from .utils.checkpoint import convert_dit_state_dict, load_safetensors_state_dict

        params = convert_dit_state_dict(
            load_safetensors_state_dict(args.ckpt_dir), dit_cfg.num_layers)
    params = shard_params(params, mesh)

    tc = TrainConfig(learning_rate=args.learning_rate, latent_frame_zero=lfz,
                     optimizer=args.optimizer,
                     lr_warmup_steps=args.lr_warmup_steps,
                     mvdt=args.MVDT)
    state = init_train_state(params, tc)
    import random as _random

    _mvdt_rng = _random.Random(args.seed)

    # optional ADD discriminator (reference distill_model.py:532-579); the
    # distillation step folds the D update and the 0.01 generator GAN term
    # into the generator step (one retained vjp, distill_model.py:306-366)
    disc = disc_state = None
    if args.Distil:
        import optax

        from .training.distill import init_disc_state, make_distill_train_step

        def _not_dino(params):
            # the DINO projector is frozen (reference requires_grad=False,
            # ADD/models/discriminator.py:150): exclude it from the optimizer
            # so AdamW weight decay can't mutate it
            import flax

            return flax.traverse_util.path_aware_map(
                lambda path, _: path[0] != "dino", params)

        d_opt = optax.masked(
            optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-5)),
            _not_dino)
        disc, disc_state = init_disc_state(
            jax.random.PRNGKey(args.seed + 1), d_opt, latent_hw=(h, w),
            z_dim=dit_cfg.out_dim,
            dino_path=args.dino_path)

        # donate the state trees: without aliasing, XLA keeps input AND
        # output copies of params+EMA+moments — the round-5 AOT witness
        # measured the un-donated 5B fsdp step at 19.8 GiB/chip peak vs
        # 16 GB HBM (scripts/aot_memory_witness.py; docs/MEMORY.md)
        def _mk(keep):
            return jax.jit(make_distill_train_step(
                fwd_apply, tc, disc, d_opt, packed=True, mvdt_keep=keep),
                donate_argnums=(0, 1))
    else:
        def _mk(keep):
            return jax.jit(make_train_step(fwd_apply, tc, packed=True,
                                           mvdt_keep=keep),
                           donate_argnums=(0,))

    if args.lora_rank:
        # parameter-efficient finetune: base frozen, only the adapter tree
        # trains (≙ the reference's peft LoRA path, fastvideo/utils/
        # checkpoint.py:340-397) — lets the 5B/14B models finetune within
        # single-chip HBM (grads + moments exist only for the adapters)
        assert not (args.MVDT or args.Distil), \
            "--lora_rank composes with the plain flow-matching step"
        from .training.lora import count_params, init_lora, make_lora_train_step

        lora = init_lora(jax.random.PRNGKey(args.seed + 2), params,
                         rank=args.lora_rank)
        main_print(f"LoRA rank {args.lora_rank}: "
                   f"{count_params(lora):,} trainable / "
                   f"{count_params(params):,} total params")
        # donate the adapter state (arg 0); the frozen base (arg 1) is
        # reused every step and must NOT be donated
        _lora_step = jax.jit(make_lora_train_step(dit.apply, tc, packed=True),
                             donate_argnums=(0,))

        def step_fn(st, batch_, rng_):
            return _lora_step(st, params, batch_, rng_)

        state = init_train_state(lora, tc)
    elif args.MVDT:
        step_fns = {k: _mk(k) for k in set(mvdt_keeps)}

        def step_fn(*a):
            return step_fns[_mvdt_rng.choice(mvdt_keeps)](*a)
    else:
        step_fn = _mk(None)

    # data: real dataset or synthetic latents
    _rand_i2v = _random.Random(args.seed + 31)

    def synthetic_batch(step):
        k = jax.random.PRNGKey(step)
        if is_i2v:
            from .training.i2v_batch import synthetic_i2v_batch

            return synthetic_i2v_batch(
                k, b=b, f=f, h=h, w=w, z_dim=dit_cfg.out_dim,
                mask_ch=cfg.vae.stride[0], text_len=text_len,
                text_dim=text_dim,
                image_context_len=dit_cfg.image_context_len,
                image_dim=dit_cfg.image_dim)
        return {
            "latents": jax.random.normal(k, (b, f, h, w, dit_cfg.in_dim)),
            "context": jax.random.normal(k, (b, text_len, text_dim)) * 0.02,
        }

    get_batch = synthetic_batch
    loader = None
    pipe = None
    if args.data_dir:
        from .data.dataset import ControlVideoDataset
        from .data.loader import PrefetchLoader
        from .data.tokenizer import Tokenizer

        ds = ControlVideoDataset(
            args.data_dir, full_mp4_dir=args.full_mp4_dir,
            n_sample_frames=args.num_frames, height=args.height,
            width=args.width)
        main_print(f"dataset: {len(ds)} clips")
        # encode fns need REAL VAE/T5 weights (reference init_model,
        # distill_model.py:720-737); load them from the checkpoint dir (or
        # explicit paths) — a random encoder would feed garbage latents
        if is_i2v:
            from .pipelines.i2v import I2VPipeline

            pipe = I2VPipeline.from_config(cfg, jax.random.PRNGKey(0),
                                           init_t5=True, init_clip=True,
                                           init_dit=False)
        else:
            from .pipelines.ti2v import TI2VPipeline

            pipe = TI2VPipeline.from_config(cfg, jax.random.PRNGKey(0),
                                            init_t5=True)
        weights_dir = args.encoders_dir or args.ckpt_dir
        if weights_dir:
            from .sample import load_torch_weights

            load_torch_weights(pipe, weights_dir, load_dit=False)
        else:
            main_print("WARNING: --data_dir without --ckpt_dir/--encoders_dir"
                       " — VAE/T5 encoders are randomly initialised")
        from .data.tokenizer import resolve_tokenizer_path

        tokenizer = Tokenizer(
            resolve_tokenizer_path(args.tokenizer_path, weights_dir),
            seq_len=text_len, vocab_size=cfg.t5.vocab_size,
            warn_fallback=not args.smoke)

        # threaded host prefetch (≙ reference DataLoader workers,
        # distill_model.py:633-654): video decode overlaps the train step
        def sample_fn(i):
            s = ds[i % len(ds)]
            return {"video": s["video"], "caption": s["caption"]}

        loader = PrefetchLoader(sample_fn, batch_size=b, num_workers=2)

        def get_batch(step):
            raw = next(loader)
            video = jnp.asarray(np.stack(raw["video"])
                                if isinstance(raw["video"], list)
                                else raw["video"])
            ids, mask = tokenizer(raw["caption"])
            ctx = pipe.encode_text(jnp.asarray(ids), jnp.asarray(mask))
            if is_i2v:
                # host rand_num_img draw picks the i2v vs v2v branch per
                # step (reference distill_model.py:262-272); both branches
                # have static shapes → at most two compilations
                from .training.i2v_batch import build_i2v_train_batch

                return build_i2v_train_batch(
                    pipe, video, ctx, rand_num_img=_rand_i2v.random())
            latents = pipe._encode(video)
            return {"latents": latents, "context": ctx}

    start_step = 0
    if args.resume and os.path.isdir(args.output_dir):
        try:
            state = restore_checkpoint(args.output_dir, state)
            start_step = int(state.step)
            main_print(f"resumed at step {start_step}")
        except Exception as e:
            main_print(f"resume failed: {e}")

    from .utils.logging_ import phase, step_annotation

    prof_lo, prof_hi = (int(s) for s in args.profile_steps.split(","))
    tracing = False
    ckpter = None  # async Checkpointer, created on first save
    times = []
    for step in range(start_step, args.max_train_steps):
        if args.profile_dir and step == prof_lo:
            os.makedirs(args.profile_dir, exist_ok=True)
            jax.profiler.start_trace(args.profile_dir)
            tracing = True
        t_start = time.time()
        with phase("get_batch"):
            batch = get_batch(step)
        step_rng = jax.random.fold_in(rng, step)
        with step_annotation(step), phase("train_step"):
            if args.Distil:
                state, disc_state, metrics = step_fn(state, disc_state, batch,
                                                     step_rng)
                loss = float(metrics["loss"])
                loss_str = (f"loss={loss:.4f} "
                            f"gan_loss={float(metrics['gan_loss']):.4f} "
                            f"d_loss={float(metrics['d_loss']):.4f}")
            else:
                state, metrics = step_fn(state, batch, step_rng)
                loss = float(metrics["loss"])
                loss_str = f"loss={loss:.4f}"
        times.append(time.time() - t_start)
        if tracing and step == prof_hi:
            jax.profiler.stop_trace()
            tracing = False
            main_print(f"trace written to {args.profile_dir}")
        main_print(f"step {step + 1}/{args.max_train_steps} {loss_str} "
                   f"grad_norm={float(metrics['grad_norm']):.3f} "
                   f"step_time={np.mean(times[-100:]):.2f}s")

        if args.checkpointing_steps and (step + 1) % args.checkpointing_steps == 0:
            if ckpter is None:
                from .utils.checkpoint import Checkpointer

                ckpter = Checkpointer(args.output_dir)
            ckpter.save(step + 1, state)
            main_print(f"checkpoint save started at step {step + 1} (async)")

        if args.validation_steps and (step + 1) % args.validation_steps == 0:
            vstate = state
            if args.lora_rank:
                from .training.lora import merge_lora

                vstate = state.replace(
                    ema_params=merge_lora(params, state.ema_params))
            _validation_rollout(args, dit, vstate, batch, lfz, step + 1,
                                pipe=pipe)

    if tracing:
        jax.profiler.stop_trace()
        main_print(f"trace written to {args.profile_dir}")
    if args.profile_dir:
        from .utils.logging_ import phase_summary

        phase_summary()
    if ckpter is not None:
        ckpter.close()  # drain the in-flight async save
    if loader is not None:
        loader.close()
    if args.export_torch_dir:
        from .utils.checkpoint import (export_dit_state_dict,
                                       save_sharded_safetensors)

        ema = state.ema_params
        if args.lora_rank:
            from .training.lora import merge_lora

            ema = merge_lora(params, ema)
        sd = export_dit_state_dict(jax.device_get(ema), dit_cfg.num_layers)
        save_sharded_safetensors(sd, args.export_torch_dir)
        main_print(f"exported {len(sd)} EMA DiT tensors to "
                   f"{args.export_torch_dir} (reference torch layout)")
    return 0


def _validation_rollout(args, dit, state, batch, lfz, step, pipe=None):
    """In-training validation: denoise a segment from the current EMA params
    and export generated-vs-ground-truth videos — reference
    distill_model.py:368-425 (50-step rollout to ./generated_test_video)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .diffusion import samplers
    from .diffusion.schedule import sampling_sigmas
    from .utils.logging_ import main_print

    latents = batch["latents"][:1]
    ctx = batch["context"][:1]
    y = batch.get("y")
    clip_ctx = batch.get("clip_context")
    b, f = latents.shape[:2]
    noise = jax.random.normal(jax.random.PRNGKey(step), latents.shape)
    latent0 = jnp.concatenate(
        [latents[:, :f - lfz], noise[:, f - lfz:]], axis=1)

    def denoise(lat, t_frame):
        # i2v batches carry the 20-ch y conditioning + CLIP context
        x_in = lat if y is None else jnp.concatenate(
            [lat, y[:1].astype(lat.dtype)], axis=-1)
        kw = {} if clip_ctx is None else {"clip_context": clip_ctx[:1]}
        out = dit.apply(state.ema_params, x_in, t_frame, ctx, packed=True,
                        latent_frame_zero=lfz, **kw)
        pad = jnp.zeros_like(lat[:, : f - lfz])
        return jnp.concatenate([pad, out], axis=1)

    sig = sampling_sigmas(10 if args.smoke else 50, 3.0)
    rolled = samplers.euler_sample_segment(
        denoise, latent0, sig, lfz,
        history_t=jnp.zeros((b, f - lfz)))
    out_dir = os.path.join(args.output_dir, "generated_test_video")
    os.makedirs(out_dir, exist_ok=True)
    mse = float(jnp.mean((rolled[:, -lfz:] - latents[:, -lfz:]) ** 2))
    if pipe is not None:
        # decode generated and ground-truth clips to mp4 (reference writes
        # `{step}_{rank}.mp4` / `..._test.mp4`, distill_model.py:400-425)
        from .utils.video import save_video, to_uint8

        for name, z in (("gen", rolled), ("gt", latents)):
            video = np.asarray(pipe.decode_auto(z[:1]).astype(jnp.float32))[0]
            path = os.path.join(out_dir, f"val_step{step}_{name}.mp4")
            save_video(to_uint8(video), path, fps=args.sample_fps
                       if hasattr(args, "sample_fps") else 16)
        main_print(f"validation @ step {step}: tail-latent MSE {mse:.4f} → "
                   f"{out_dir}/val_step{step}_gen.mp4")
    else:
        path = os.path.join(out_dir, f"val_latents_step{step}.npy")
        np.save(path, np.asarray(rolled))
        main_print(f"validation @ step {step}: tail-latent MSE {mse:.4f} → {path}")


if __name__ == "__main__":
    raise SystemExit(main())
