"""PP/EP communication-schedule witnesses (VERDICT r3 task 7).

Real multi-chip perf is unmeasurable in this environment, so the compiled
program is the witness: these tests lower `pp_dit_apply` / `ep_dit_apply`
on the virtual 8-device mesh, parse the post-optimization HLO for
collective instructions, and assert counts + byte volumes against the
analytic model in `parallel/comm_model.py`. A refactor that doubles the
comm volume (e.g. an extra permute per tick, or streaming both experts)
fails here.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from yume_tpu.configs import DiTConfig
from yume_tpu.models.dit import WanDiT
from yume_tpu.parallel.comm_model import (ep_comm_model, pp_comm_model,
                                          _tree_bytes)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

CFG = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64, ffn_dim=128,
                freq_dim=32, text_dim=16, num_heads=4, num_layers=4,
                framepack=True)
LFZ = 2

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "s32": 4,
                "u64": 8, "u32": 4, "s8": 1, "u8": 1, "pred": 1}


def _collective_bytes(hlo: str, kind: str):
    """[(instruction_line_bytes, [shapes])] for each `kind` instruction in
    post-opt HLO; variadic instructions (combined all-reduces) count every
    result operand."""
    out = []
    for line in hlo.splitlines():
        if f" {kind}(" not in line and f" {kind}-start(" not in line:
            continue
        lhs = line.split("=", 1)
        if len(lhs) != 2:
            continue
        result_ty = lhs[1].split(kind)[0]
        shapes = re.findall(r"(\w+)\[([\d,]*)\]", result_ty)
        nbytes = 0
        for dt, dims in shapes:
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        out.append((nbytes, shapes))
    return out


def _setup(num_layers=4):
    dit = WanDiT(CFG, dtype=jnp.float32)
    b, f, h, w = 2, 4, 8, 8
    x = jnp.zeros((b, f, h, w, CFG.in_dim))
    t = jnp.zeros((b, f))
    ctx = jnp.zeros((b, 8, CFG.text_dim))
    params = dit.init(jax.random.PRNGKey(0), x, t, ctx, packed=True,
                      latent_frame_zero=LFZ)
    return dit, params, (x, t, ctx), (b, f, h, w)


def test_pp_comm_matches_model():
    from yume_tpu.parallel.pipeline import (make_pp_mesh, pp_dit_apply,
                                            pp_stage_params)

    dit, params, (x, t, ctx), (b, f, h, w) = _setup()
    S, M = 2, 2
    mesh = make_pp_mesh(S)
    other, staged = pp_stage_params(params, CFG.num_layers, S)

    fn = jax.jit(lambda o, s, xx, tt, cc: pp_dit_apply(
        dit, o, s, mesh, xx, tt, cc, latent_frame_zero=LFZ,
        num_microbatches=M, attn_impl="xla"))
    hlo = fn.lower(other, staged, x, t, ctx).compile().as_text()

    # packed token count incl. FramePack plan padding — from the embed
    emb = jax.eval_shape(
        lambda p, xx, tt, cc: dit.apply(p, xx, tt, cc, LFZ, None,
                                        method=dit.embed_packed),
        params, x, t, ctx)
    l = emb["tokens"].shape[1]
    model = pp_comm_model(microbatches=M, stages=S, mb=b // M, l=l,
                          d=CFG.dim, itemsize=4)

    perms = _collective_bytes(hlo, "collective-permute")
    assert len(perms) == model["hlo_collective_permutes"], \
        f"expected 1 activation permute in the tick loop, HLO has {len(perms)}"
    per_tick = model["permute_bytes_total"] // model["ticks"]
    assert perms[0][0] == per_tick, (perms[0], per_tick)

    ars = _collective_bytes(hlo, "all-reduce")
    assert len(ars) == model["hlo_all_reduces"], \
        f"expected 1 masked output psum, HLO has {len(ars)}"
    assert ars[0][0] == model["psum_bytes"], (ars[0], model["psum_bytes"])

    # schedule sanity: bubble fraction of the documented closed form
    assert model["bubble_fraction"] == (S - 1) / (M + S - 1)


def test_ep_comm_matches_model():
    from yume_tpu.parallel.expert import (ep_dit_apply, ep_stack_experts,
                                          make_ep_mesh)

    dit, params, (x, t, ctx), _ = _setup()
    params_b = jax.tree_util.tree_map(lambda a: a, params)
    others, blocks = ep_stack_experts(params, params_b, CFG.num_layers)
    mesh = make_ep_mesh()

    fn = jax.jit(lambda o, bl, xx, tt, cc: ep_dit_apply(
        dit, o, bl, mesh, 0, xx, tt, cc, latent_frame_zero=LFZ,
        attn_impl="xla"))
    hlo = fn.lower(others, blocks, x[:1], t[:1], ctx[:1]).compile().as_text()

    one_expert = jax.tree_util.tree_map(lambda a: a[0], blocks)
    one_layer = jax.tree_util.tree_map(lambda a: a[0], one_expert)
    model = ep_comm_model(one_expert, CFG.num_layers)

    ars = _collective_bytes(hlo, "all-reduce")
    assert 1 <= len(ars) <= model["hlo_all_reduces"], \
        (len(ars), model["hlo_all_reduces"])
    # per-layer stream = one block's params (XLA may combine the per-leaf
    # psums into variadic all-reduces; bytes are conserved)
    per_layer = sum(nb for nb, _ in ars)
    assert per_layer == _tree_bytes(one_layer), \
        (per_layer, _tree_bytes(one_layer))
    assert model["stream_bytes_total"] == \
        CFG.num_layers * _tree_bytes(one_layer)
    # no collective-permutes should appear (streaming is psum-only)
    assert not _collective_bytes(hlo, "collective-permute")
