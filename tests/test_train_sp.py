"""Sequence-parallel TRAINING: grad parity vs the dense step + long-history
smoke (VERDICT.md round-3 task 2; reference trains with SP initialized —
fastvideo/distill_model.py:478, autograd collectives
fastvideo/utils/communications.py:106-131)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yume_tpu.configs import DiTConfig
from yume_tpu.models.dit import WanDiT
from yume_tpu.parallel.mesh import make_mesh
from yume_tpu.parallel.sp_forward import sp_dit_apply
from yume_tpu.training.train_step import (TrainConfig, init_train_state,
                                          make_train_step)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

CFG = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64, ffn_dim=128,
                freq_dim=32, text_dim=16, num_heads=8, num_layers=2,
                framepack=True)
LFZ = 2


def _sp_apply(dit, mesh, kind="ulysses"):
    def apply(params, x, t_frame, ctx, *, packed=True, latent_frame_zero=LFZ,
              clip_context=None, **kw):
        assert packed and not kw
        return sp_dit_apply(dit, params, mesh, x, t_frame, ctx,
                            latent_frame_zero=latent_frame_zero,
                            clip_context=clip_context, kind=kind)
    return apply


def _setup(f=4, h=8, w=8):
    dit = WanDiT(CFG, dtype=jnp.float32)
    b = 1
    x = jnp.zeros((b, f, h, w, CFG.in_dim))
    t = jnp.zeros((b, f))
    ctx = jnp.zeros((b, 8, CFG.text_dim))
    params = dit.init(jax.random.PRNGKey(0), x, t, ctx, packed=True,
                      latent_frame_zero=LFZ)
    # the head kernel zero-initializes → randomize so grads flow through the
    # trunk in this probe (see docs: random-init training probes)
    params = jax.tree_util.tree_map_with_path(
        lambda p, l: (jax.random.normal(jax.random.PRNGKey(1), l.shape,
                                        l.dtype) * 0.02
                      if "head" in str(p).lower() and l.ndim >= 2 else l),
        params)
    tc = TrainConfig(learning_rate=1e-3, latent_frame_zero=LFZ)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(2),
                                     (b, f, h, w, CFG.in_dim)),
        "context": jax.random.normal(jax.random.PRNGKey(3),
                                     (b, 8, CFG.text_dim)) * 0.3,
    }
    return dit, params, tc, batch


@pytest.mark.parametrize("kind", ["ulysses", "ring"])
def test_sp_train_step_grad_parity(kind):
    """One SP train step must produce the same loss and updated params as
    the dense step (the SP trunk is exactly differentiable)."""
    dit, params, tc, batch = _setup()
    mesh = make_mesh(data=1, fsdp=1, sp=8)
    rng = jax.random.PRNGKey(42)

    dense_step = jax.jit(make_train_step(
        functools.partial(dit.apply, attn_impl="xla"), tc, packed=True))
    sp_step = jax.jit(make_train_step(_sp_apply(dit, mesh, kind), tc,
                                      packed=True))

    sd, md = dense_step(init_train_state(params, tc), batch, rng)
    ss, ms = sp_step(init_train_state(params, tc), batch, rng)
    np.testing.assert_allclose(float(ms["loss"]), float(md["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(ms["grad_norm"]), float(md["grad_norm"]),
                               rtol=2e-3)
    for a, b_ in zip(jax.tree_util.tree_leaves(ss.params),
                     jax.tree_util.tree_leaves(sd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-3)


def test_sp_train_long_history_smoke():
    """A long-history step (FramePack bucket 3+: ≥23 history latent frames)
    through the SP trunk — the geometry SP training exists for."""
    dit, params, tc, batch = _setup(f=26, h=8, w=8)
    mesh = make_mesh(data=1, fsdp=1, sp=8)
    step = jax.jit(make_train_step(_sp_apply(dit, mesh), tc, packed=True))
    state, metrics = step(init_train_state(params, tc), batch,
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_sp_train_driver_smoke(tmp_path):
    """`train.py --sp 2 --smoke` builds the sp mesh and trains through the
    SP trunk from the CLI."""
    from yume_tpu import train as train_mod

    rc = train_mod.main([
        "--smoke", "--sp", "2", "--max_train_steps", "2",
        "--checkpointing_steps", "0", "--output_dir", str(tmp_path)])
    assert rc == 0


def test_sp_train_driver_rejects_mvdt(tmp_path):
    from yume_tpu import train as train_mod

    with pytest.raises(AssertionError):
        train_mod.main([
            "--smoke", "--sp", "2", "--MVDT", "--max_train_steps", "1",
            "--checkpointing_steps", "0", "--output_dir", str(tmp_path)])
