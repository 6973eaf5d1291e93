"""AOT per-chip HBM witness for the production multi-chip programs.

The dryrun validates that every parallel path compiles and runs at toy
shapes; it says nothing about whether the REAL-shape programs fit v5e-8
HBM. This script compiles them ahead-of-time against an 8-device v5e
TOPOLOGY (jax.experimental.topologies — the actual TPU compiler, no 8
chips needed) and reports XLA's per-device memory analysis:

  * 5B SP serving step: sp=8 sequence-parallel packed denoise forward at
    the 720p continuation geometry (31+8 latent frames, 44×80)
  * 5B FSDP training step: data=2 × fsdp=4, full flow-matching loss +
    AdamW + EMA, per-block remat, 352×640 trainer geometry
  * 14B SP serving step: sp=8 at the 540P geometry (1+8 frames, 68×120)

The per-config table lands in docs/MEMORY.md (run with --update_docs);
tests_tpu/test_aot_memory.py asserts the serving program lowers and fits.

Run: python scripts/aot_memory_witness.py [--configs sp5b,fsdp5b,sp14b]
"""
import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GiB = 1 << 30


def v5e8_mesh(shape, names, topology="v5e:2x4"):
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology)
    return Mesh(np.array(topo.devices).reshape(shape), names)


# per-chip HBM for the topologies we witness against
HBM_GIB = {"v5e:2x4": 16, "v5p:2x2x2": 95}


def abstract_params(shapes_tree, mesh, dtype=None):
    """Shape tree → ShapeDtypeStructs carrying the fsdp sharding rule
    (the AOT analogue of parallel.mesh.shard_params)."""
    from yume_tpu.parallel.mesh import param_sharding_rule

    def mk(path, leaf):
        spec = param_sharding_rule(path, leaf)
        for ax, name in enumerate(spec):
            if name == "fsdp" and leaf.shape[ax] % mesh.shape["fsdp"] != 0:
                spec = P()
                break
        return jax.ShapeDtypeStruct(leaf.shape, dtype or leaf.dtype,
                                    sharding=NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(mk, shapes_tree)


def replicated(tree, mesh, dtype=None):
    return jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(l.shape, dtype or l.dtype,
                                       sharding=NamedSharding(mesh, P())),
        tree)


def report(name, compiled, hbm_gib=16):
    ma = compiled.memory_analysis()
    row = dict(
        config=name,
        args_gib=round(ma.argument_size_in_bytes / GiB, 2),
        temp_gib=round(ma.temp_size_in_bytes / GiB, 2),
        out_gib=round(ma.output_size_in_bytes / GiB, 3),
        peak_gib=round(ma.peak_memory_in_bytes / GiB, 2),
        fits=bool(ma.peak_memory_in_bytes < hbm_gib * GiB),
        hbm_gib=hbm_gib,
    )
    print(row)
    sys.stdout.flush()
    return row


def _dit_shapes(cfg, lfz, f_hist, h_lat, w_lat, dtype=jnp.bfloat16):
    from yume_tpu.models.dit import WanDiT

    dit = WanDiT(cfg.dit, dtype=dtype)
    x = jax.ShapeDtypeStruct((1, f_hist + lfz, h_lat, w_lat, cfg.dit.in_dim),
                             dtype)
    t = jax.ShapeDtypeStruct((1, f_hist + lfz), jnp.float32)
    ctx = jax.ShapeDtypeStruct((1, cfg.dit.text_len, cfg.dit.text_dim), dtype)
    clip_ctx = None
    if cfg.dit.image_context_len:
        clip_ctx = jax.ShapeDtypeStruct(
            (1, cfg.dit.image_context_len, cfg.dit.image_dim), dtype)
    # clip_ctx must be an eval_shape ARGUMENT (closures stay raw
    # ShapeDtypeStructs and break .astype inside the model)
    if clip_ctx is None:
        shapes = jax.eval_shape(
            lambda k, a, b, c: dit.init(k, a, b, c, packed=True,
                                        latent_frame_zero=lfz),
            jax.random.PRNGKey(0), x, t, ctx)
    else:
        shapes = jax.eval_shape(
            lambda k, a, b, c, cc: dit.init(k, a, b, c, packed=True,
                                            latent_frame_zero=lfz,
                                            clip_context=cc),
            jax.random.PRNGKey(0), x, t, ctx, clip_ctx)
    cast = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, dtype), shapes)
    return dit, cast, (x, t, ctx, clip_ctx)


def witness_sp_serving(cfg_name, lfz, f_hist, h_lat, w_lat,
                       topology="v5e:2x4"):
    """SP=8 packed serving forward at real shapes (the --sp 8 CLI path).

    Params REPLICATE across the sp mesh (the trunk's shard_map shards the
    sequence, not the weights), so per-chip HBM carries the full bf16
    model: fine for 5B/v5e (10 GiB) and for 14B on the north-star v5p-8
    (95 GiB/chip); 14B bf16 on a 16 GiB v5e needs 31.4 GiB and is
    EXPECTED to fail there — the single-chip int4/W4A8 trunk is the
    16 GiB answer (BASELINE.md). A compile OOM is caught and recorded as
    a measured row."""
    from yume_tpu.configs import CONFIGS
    from yume_tpu.parallel.sp_forward import sp_dit_apply

    cfg = CONFIGS[cfg_name]()
    hbm = HBM_GIB[topology]
    mesh = v5e8_mesh((1, 1, 8), ("data", "fsdp", "sp"), topology)
    dit, shapes, (x, t, ctx, clip_ctx) = _dit_shapes(cfg, lfz, f_hist,
                                                     h_lat, w_lat)
    params = abstract_params(shapes, mesh)

    def rep(s):
        return (None if s is None else
                jax.ShapeDtypeStruct(s.shape, s.dtype,
                                     sharding=NamedSharding(mesh, P())))

    x, t, ctx, clip_ctx = rep(x), rep(t), rep(ctx), rep(clip_ctx)

    if clip_ctx is None:
        def f(params, x, t, ctx):
            return sp_dit_apply(dit, params, mesh, x, t, ctx,
                                latent_frame_zero=lfz)
        lowered = jax.jit(f).lower(params, x, t, ctx)
    else:
        def f(params, x, t, ctx, cc):
            return sp_dit_apply(dit, params, mesh, x, t, ctx,
                                latent_frame_zero=lfz, clip_context=cc)
        lowered = jax.jit(f).lower(params, x, t, ctx, clip_ctx)
    name = (f"{cfg_name} sp=8 serving fwd ({f_hist}+{lfz}f "
            f"{h_lat}x{w_lat}, {topology})")
    try:
        compiled = lowered.compile()
    except Exception as e:  # XLA compile OOM — record the measured need
        import re

        m = re.search(r"Used ([0-9.]+)G of", str(e))
        row = dict(config=name, peak_gib=float(m.group(1)) if m else None,
                   fits=False, hbm_gib=hbm,
                   note="XLA compile OOM (per-chip HBM exceeded)")
        print(row)
        sys.stdout.flush()
        return row
    return report(name, compiled, hbm)


def abstract_like_params(tree, mesh):
    """Shape tree → ShapeDtypeStructs under the fsdp rule (divisibility-
    checked), for trees that mirror the param structure (TrainState)."""
    from yume_tpu.parallel.mesh import param_sharding_rule

    def mk(path, leaf):
        spec = param_sharding_rule(path, leaf)
        for ax, name in enumerate(spec):
            if name == "fsdp" and leaf.shape[ax] % mesh.shape["fsdp"]:
                spec = P()
                break
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                    sharding=NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(mk, tree)


def witness_fsdp_train(data=2, fsdp=4, donate=True):
    """data × fsdp 5B training step at the trainer geometry, with the
    state donated exactly as train.py runs it (donate=False measures the
    un-aliased program — the round-5 bug this witness caught: 19.8 GiB
    peak vs 10.3 donated at data=2 fsdp=4)."""
    import dataclasses

    from yume_tpu.configs import CONFIGS
    from yume_tpu.models.dit import WanDiT
    from yume_tpu.training.train_step import (TrainConfig, init_train_state,
                                              make_train_step)

    cfg = CONFIGS["ti2v-5B"]()
    lfz = cfg.latent_frame_zero
    f_hist, h_lat, w_lat = 8, 22, 40  # 352×640 trainer geometry
    mesh = v5e8_mesh((data, fsdp, 1), ("data", "fsdp", "sp"))
    dit, shapes, _ = _dit_shapes(cfg, lfz, f_hist, h_lat, w_lat,
                                 dtype=jnp.bfloat16)
    tc = TrainConfig(latent_frame_zero=lfz)

    # abstract TrainState: params/ema sharded by the fsdp rule, adam
    # moments following the params (optax init mirrors the tree)
    params = abstract_params(shapes, mesh)
    state_shape = jax.eval_shape(lambda p: init_train_state(p, tc), params)
    state = abstract_like_params(state_shape, mesh)
    b = data
    batch = {
        "latents": jax.ShapeDtypeStruct(
            (b, f_hist + lfz, h_lat, w_lat, cfg.dit.in_dim), jnp.float32,
            sharding=NamedSharding(mesh, P("data"))),
        "context": jax.ShapeDtypeStruct(
            (b, cfg.dit.text_len, cfg.dit.text_dim), jnp.float32,
            sharding=NamedSharding(mesh, P("data"))),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32,
                               sharding=NamedSharding(mesh, P()))
    step = make_train_step(dit.apply, tc, packed=True)
    # the dp/fsdp step is GSPMD-auto-partitioned: Mosaic kernels must trace
    # as their jnp fallbacks (train.py sets the same gate)
    from yume_tpu.ops.partitioning import auto_spmd_scope

    with auto_spmd_scope():
        compiled = jax.jit(
            step, donate_argnums=(0,) if donate else ()).lower(
                state, batch, rng).compile()
    return report(f"ti2v-5B fsdp train step (data={data} fsdp={fsdp}, "
                  f"352x640{', donated' if donate else ', NO donation'})",
                  compiled)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs",
                    default="sp5b,fsdp5b,fsdp5b_8,sp14b,sp14b_v5p")
    ap.add_argument("--update_docs", action="store_true")
    args = ap.parse_args()
    rows = []
    for c in args.configs.split(","):
        if c == "sp5b":
            rows.append(witness_sp_serving("ti2v-5B", 8, 31, 44, 80))
        elif c == "fsdp5b":
            rows.append(witness_fsdp_train())
        elif c == "fsdp5b_nodonate":
            rows.append(witness_fsdp_train(donate=False))
        elif c == "fsdp5b_8":
            rows.append(witness_fsdp_train(data=1, fsdp=8))
        elif c == "sp14b":
            rows.append(witness_sp_serving("i2v-14B", 9, 1, 68, 120))
        elif c == "sp14b_v5p":
            rows.append(witness_sp_serving("i2v-14B", 9, 1, 68, 120,
                                           topology="v5p:2x2x2"))
        else:
            raise SystemExit(f"unknown config {c}")
    if args.update_docs:
        lines = ["| config | args | temp | peak | fits chip HBM |",
                 "|---|---|---|---|---|"]
        for r in rows:
            lines.append(
                f"| {r['config']} | {r.get('args_gib', '—')} GiB | "
                f"{r.get('temp_gib', '—')} GiB | {r['peak_gib']} GiB | "
                f"{'yes' if r['fits'] else 'NO'} (of {r['hbm_gib']}) |")
        print("\n".join(lines))


if __name__ == "__main__":
    main()
