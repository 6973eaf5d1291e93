"""Training step tests: loss decreases, EMA tracks, MVDT branch runs."""

import jax
import jax.numpy as jnp
import numpy as np

from yume_tpu.configs import DiTConfig
from yume_tpu.models.dit import WanDiT
from yume_tpu.training.train_step import (TrainConfig, init_train_state,
                                          make_train_step)

CFG = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64, ffn_dim=128,
                freq_dim=32, text_dim=16, num_heads=4, num_layers=2,
                framepack=True, mvdt=True)


def _setup(mvdt=False):
    dit = WanDiT(CFG, dtype=jnp.float32)
    lfz = 2
    b, f, h, w = 2, 4, 8, 8
    x = jnp.zeros((b, f, h, w, CFG.in_dim))
    t = jnp.zeros((b, f))
    ctx = jnp.zeros((b, 8, CFG.text_dim))
    kw = {}
    if mvdt:
        kw = dict(mvdt_rng=jax.random.PRNGKey(0), mvdt_keep=40)
    params = dit.init(jax.random.PRNGKey(0), x, t, ctx, packed=True,
                      latent_frame_zero=lfz, **kw)
    tc = TrainConfig(learning_rate=1e-3, latent_frame_zero=lfz, mvdt=mvdt)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (b, f, h, w, CFG.in_dim)),
        "context": jax.random.normal(jax.random.PRNGKey(2), (b, 8, CFG.text_dim)),
    }
    return dit, params, tc, batch


def test_loss_decreases():
    dit, params, tc, batch = _setup()
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(dit.apply, tc, packed=True))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(100))  # fixed noise
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


def test_ema_tracks_params():
    dit, params, tc, batch = _setup()
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(dit.apply, tc, packed=True))
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    # after one step ema = 0.995*old + 0.005*new → close to old but not equal
    p0 = jax.tree_util.tree_leaves(params)[0]
    e1 = jax.tree_util.tree_leaves(state.ema_params)[0]
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    if not np.allclose(np.asarray(p0), np.asarray(p1)):
        assert not np.allclose(np.asarray(e1), np.asarray(p1))


def test_mvdt_training_step():
    dit, params, tc, batch = _setup(mvdt=True)
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(dit.apply, tc, packed=True, mvdt_keep=40))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_lora_driver_smoke(tmp_path):
    """--lora_rank trains only the adapter tree through the CLI driver
    (validation merges adapters back onto the frozen base)."""
    from yume_tpu import train as train_mod

    rc = train_mod.main([
        "--smoke", "--lora_rank", "4", "--max_train_steps", "2",
        "--checkpointing_steps", "0", "--validation_steps", "2",
        "--output_dir", str(tmp_path),
    ])
    assert rc == 0
    assert (tmp_path / "generated_test_video").exists()
