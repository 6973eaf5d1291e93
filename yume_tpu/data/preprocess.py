"""Preprocessing CLIs: extract VAE latents and T5 embeddings to disk.

Equivalent of the reference preprocessing tools
(fastvideo/data_preprocess/preprocess_vae_latents.py,
preprocess_text_embeddings.py and hyvideo/hyvae_extract/): writes
``latent/``, ``prompt_embed/``, ``prompt_attention_mask/`` + a JSON
manifest consumed by LatentDataset.

    python -m yume_tpu.data.preprocess --data_dir ./mp4_frame \
        --output_dir ./latents --config ti2v-5B [--smoke]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="ti2v-5B")
    p.add_argument("--data_dir", required=False, default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_frames", type=int, default=33)
    p.add_argument("--height", type=int, default=352)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--max_samples", type=int, default=0)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..sample import load_pipeline
    from .tokenizer import Tokenizer

    cfg, pipe = load_pipeline(args_shim(args))
    tok = Tokenizer(seq_len=cfg.t5.text_len, vocab_size=cfg.t5.vocab_size)

    for sub in ("latent", "prompt_embed", "prompt_attention_mask"):
        os.makedirs(os.path.join(args.output_dir, sub), exist_ok=True)

    if args.smoke or not args.data_dir:
        samples = [{"video": np.random.default_rng(i).uniform(
            -1, 1, (5, 32, 32, 3)).astype(np.float32),
            "caption": f"smoke sample {i}", "video_id": f"smoke{i}"}
            for i in range(2)]
    else:
        from .dataset import ControlVideoDataset

        ds = ControlVideoDataset(args.data_dir, n_sample_frames=args.num_frames,
                                 height=args.height, width=args.width)
        n = min(len(ds), args.max_samples) if args.max_samples else len(ds)
        samples = (ds[i] for i in range(n))

    manifest = []
    for i, s in enumerate(samples):
        latent = np.asarray(pipe._encode(jnp.asarray(s["video"])[None]))[0]
        ids, mask = tok([s["caption"]])
        embed = np.asarray(pipe.encode_text(jnp.asarray(ids), jnp.asarray(mask)))[0]
        name = f"{s['video_id']}_{i:06d}.npy"
        np.save(os.path.join(args.output_dir, "latent", name), latent)
        np.save(os.path.join(args.output_dir, "prompt_embed", name), embed)
        np.save(os.path.join(args.output_dir, "prompt_attention_mask", name), mask[0])
        manifest.append({"latent_path": name, "prompt_embed_path": name,
                         "prompt_attention_mask": name,
                         "caption": s["caption"], "length": int(latent.shape[0])})
        print(f"[{i}] {name}: latent {latent.shape}")

    with open(os.path.join(args.output_dir, "videos2caption.json"), "w") as f:
        json.dump(manifest, f)
    print(f"wrote {len(manifest)} samples to {args.output_dir}")
    return 0


def args_shim(args):
    """Adapt preprocess args to sample.load_pipeline's expectations."""
    import types

    return types.SimpleNamespace(
        config=args.config, smoke=args.smoke, seed=0, ckpt_dir=None,
    )


if __name__ == "__main__":
    raise SystemExit(main())
