"""Profile the steady-state 720p VAE decode chunk (one latent frame, one
4-split tile = 22x40 latent -> 4 frames @ 352x640) and print the top XLA
ops by self time. The streaming x tiled decode is 32 such calls per tail
(8 latent frames x 4 tiles); bench.py measures 5.85 s total => ~180 ms
per call. This script answers where those milliseconds go.
"""
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yume_tpu.configs import ti2v_5b
from yume_tpu.models.vae import WanVAE, _jit_decode_chunk


def main():
    cfg = ti2v_5b()
    vae = WanVAE(cfg.vae)
    h, w = 22, 40  # 44x80 latent split into 4 spatial tiles
    z1 = jnp.zeros((1, 1, h, w, cfg.vae.z_dim), jnp.bfloat16)
    params = vae.init(jax.random.PRNGKey(4), z1, method=vae.decode)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    fn = _jit_decode_chunk(vae)
    # first chunk (seeds caches) + one steady-state chunk to compile both
    out, caches = fn(params, z1, None)
    out2, caches2 = fn(params, z1, caches)
    _ = float(out2.sum())

    # time steady-state chunk: chained calls
    t0 = time.perf_counter()
    n = 5
    c = caches
    for _ in range(n):
        out2, c = fn(params, z1, c)
    _ = float(out2.sum())
    dt = (time.perf_counter() - t0) / n
    print(f"steady-state chunk: {dt*1000:.1f} ms  (x32 = {dt*32:.2f} s/tail)")

    trace_dir = "/tmp/yume_vae_trace"
    with jax.profiler.trace(trace_dir):
        out2, c2 = fn(params, z1, caches)
        _ = float(out2.sum())

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True),
                   key=os.path.getmtime)
    if not files:
        print("no trace found under", trace_dir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    # aggregate complete events on TPU device tracks by name
    by_name = {}
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname:
            continue
        name = ev.get("name", "?")
        by_name.setdefault(name, [0.0, 0])
        by_name[name][0] += ev.get("dur", 0) / 1000.0
        by_name[name][1] += 1
    total = sum(v[0] for v in by_name.values())
    print(f"device total: {total:.1f} ms across {len(by_name)} op names")
    for name, (ms, cnt) in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"{ms:9.2f} ms  x{cnt:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
