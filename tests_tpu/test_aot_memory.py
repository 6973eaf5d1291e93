"""CI witness that the PRODUCTION-shape multi-chip programs lower against
a real v5e-8 topology (VERDICT r4 task 7).

scripts/aot_memory_witness.py does the full compile and records XLA's
per-device memory analysis in docs/MEMORY.md; this test keeps the cheap
invariant in CI: the real-shape 5B sp=8 serving step and the fsdp train
step LOWER against the 8-device v5e topology with the intended shardings
(lowering runs full SPMD propagation — a sharding mismatch or invalid
mesh/shape combination fails here, before any compile)."""

import pytest

pytestmark = pytest.mark.tpu


def test_sp8_serving_and_fsdp_train_lower_at_real_shapes():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "aot_memory_witness",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "aot_memory_witness.py"))
    w = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(w)
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yume_tpu.configs import CONFIGS
    from yume_tpu.parallel.sp_forward import sp_dit_apply

    cfg = CONFIGS["ti2v-5B"]()
    lfz, f_hist, h_lat, w_lat = 8, 31, 44, 80
    mesh = w.v5e8_mesh((1, 1, 8), ("data", "fsdp", "sp"))
    dit, shapes, (x, t, ctx, _) = w._dit_shapes(cfg, lfz, f_hist, h_lat,
                                                w_lat)
    params = w.abstract_params(shapes, mesh)
    rep = lambda s: jax.ShapeDtypeStruct(
        s.shape, s.dtype, sharding=NamedSharding(mesh, P()))

    def f(params, x, t, ctx):
        return sp_dit_apply(dit, params, mesh, x, t, ctx,
                            latent_frame_zero=lfz)

    lowered = jax.jit(f).lower(params, rep(x), rep(t), rep(ctx))
    txt = lowered.as_text()
    assert "sharding" in txt  # SPMD propagation actually annotated

    # fsdp train step at the trainer geometry (only lowering, no compile)
    from yume_tpu.training.train_step import (TrainConfig, init_train_state,
                                              make_train_step)

    mesh2 = w.v5e8_mesh((2, 4, 1), ("data", "fsdp", "sp"))
    dit2, shapes2, _ = w._dit_shapes(cfg, lfz, 8, 22, 40)
    tc = TrainConfig(latent_frame_zero=lfz)
    params2 = w.abstract_params(shapes2, mesh2)
    state_shape = jax.eval_shape(lambda p: init_train_state(p, tc), params2)
    state = w.abstract_like_params(state_shape, mesh2)
    batch = {
        "latents": jax.ShapeDtypeStruct((2, 16, 22, 40, cfg.dit.in_dim),
                                        jnp.float32,
                                        sharding=NamedSharding(mesh2,
                                                               P("data"))),
        "context": jax.ShapeDtypeStruct(
            (2, cfg.dit.text_len, cfg.dit.text_dim), jnp.float32,
            sharding=NamedSharding(mesh2, P("data"))),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32,
                               sharding=NamedSharding(mesh2, P()))
    step = make_train_step(dit2.apply, tc, packed=True)
    jax.jit(step).lower(state, batch, rng)
