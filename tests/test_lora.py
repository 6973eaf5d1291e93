"""LoRA adapter tests: zero-init identity, merged training decreases loss."""

import jax
import jax.numpy as jnp
import numpy as np

from yume_tpu.configs import DiTConfig
from yume_tpu.models.dit import WanDiT
from yume_tpu.training.lora import count_params, init_lora, merge_lora
from yume_tpu.training.train_step import TrainConfig, make_optimizer

CFG = DiTConfig(model_type="ti2v", in_dim=8, out_dim=8, dim=64, ffn_dim=128,
                freq_dim=32, text_dim=16, num_heads=4, num_layers=2,
                framepack=True)


def _setup():
    dit = WanDiT(CFG, dtype=jnp.float32)
    x = jnp.zeros((1, 4, 8, 8, 8))
    t = jnp.zeros((1, 4))
    ctx = jnp.zeros((1, 8, 16))
    params = dit.init(jax.random.PRNGKey(0), x, t, ctx, packed=True,
                      latent_frame_zero=2)
    # randomise the zero-initialised head kernel so gradients flow to the
    # (upstream) LoRA targets
    params = jax.tree_util.tree_map_with_path(
        lambda path, v: jax.random.normal(jax.random.PRNGKey(9), v.shape) * 0.02
        if any(getattr(q, "key", None) == "head" for q in path) else v,
        params,
    )
    return dit, params, (x, t, ctx)


def test_lora_zero_init_is_identity():
    dit, params, (x, t, ctx) = _setup()
    lora = init_lora(jax.random.PRNGKey(1), params["params"], rank=4)
    assert count_params(lora) > 0
    merged = {"params": merge_lora(params["params"], lora)}
    x_in = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    a = dit.apply(params, x_in, t, ctx, packed=True, latent_frame_zero=2)
    b = dit.apply(merged, x_in, t, ctx, packed=True, latent_frame_zero=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lora_training_decreases_loss():
    import optax

    from yume_tpu.training.lora import make_lora_train_step
    from yume_tpu.training.train_step import TrainState

    dit, params, _ = _setup()
    lora = init_lora(jax.random.PRNGKey(1), params["params"], rank=4)
    tc = TrainConfig(learning_rate=5e-3, latent_frame_zero=2)
    opt = make_optimizer(tc)

    def apply_fn(lora_tree, *args, **kw):
        return dit.apply({"params": merge_lora(params["params"], lora_tree)},
                         *args, **kw)

    from yume_tpu.training.train_step import make_train_step

    step = jax.jit(make_train_step(apply_fn, tc, packed=True))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=lora,
                       opt_state=opt.init(lora), ema_params=lora)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(3), (1, 4, 8, 8, 8)),
        "context": jax.random.normal(jax.random.PRNGKey(4), (1, 8, 16)),
    }
    losses = []
    for _ in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
