"""Sweep the 720p tail-decode configuration: width tiles x latent-frame
chunk size. The round-3 default (n_tiles=4, chunk=1) issues 32 small XLA
programs whose convs run at ~30% MXU utilization (see profile_vae.py);
larger chunks and wider tiles amortize the glue and give the conv tiler
real work. Peak HBM per config is recorded so decode_auto can pick the
fastest config that leaves room for a resident DiT trunk.

Run: python scripts/bench_vae_decode.py [--configs 4x1,4x4,2x4,1x7]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yume_tpu.configs import ti2v_5b
from yume_tpu.models.vae import WanVAE, streaming_decode
from yume_tpu.pipelines.tiled_decode import tiled_decode


def peak_mb():
    stats = jax.local_devices()[0].memory_stats() or {}
    return stats.get("peak_bytes_in_use", 0) / (1 << 20)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="4x1,4x4,2x4,2x7,1x4")
    ap.add_argument("--lfz", type=int, default=8)
    args = ap.parse_args()

    cfg = ti2v_5b()
    vae = WanVAE(cfg.vae)
    h, w = 44, 80
    z1 = jnp.zeros((1, 1, h // 2, w // 4, cfg.vae.z_dim), jnp.bfloat16)
    params = vae.init(jax.random.PRNGKey(4), z1, method=vae.decode)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    z = jax.random.normal(jax.random.PRNGKey(7),
                          (1, args.lfz, h, w, cfg.vae.z_dim), jnp.bfloat16)

    for spec in args.configs.split(","):
        n_tiles, chunk = (int(v) for v in spec.split("x"))

        def stream(tile):
            return streaming_decode(vae, params, tile.astype(jnp.bfloat16),
                                    chunk_latent_frames=chunk)

        def decode(zz):
            if n_tiles == 1:
                return stream(zz)
            return tiled_decode(stream, zz, n_tiles=n_tiles,
                                scale_factor=cfg.vae.stride[1])

        try:
            out = decode(z)
            _ = float(out.sum())
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                out = decode(z)
                _ = float(out.sum())
                times.append(time.perf_counter() - t0)
            print(f"tiles={n_tiles} chunk={chunk}: {min(times):.2f} s  "
                  f"peak={peak_mb():.0f} MB  out={out.shape}")
        except Exception as e:  # OOM at big configs is informative, not fatal
            print(f"tiles={n_tiles} chunk={chunk}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
