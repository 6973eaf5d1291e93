"""Full-scale anchor for the quality-gate proxy (VERDICT r3 task 8).

tests_tpu/test_quality_gate.py gates serving modes on a dim-768/8-layer
proxy; TeaCache skip error is depth- and width-dependent, so the proxy
floor does not by itself bound the 30-layer 5B. This anchor runs the REAL
5B width/depth (dim 3072, 30 layers, 24 heads, ffn 14336 — random bf16
weights) through the same ``generate_segment`` serving path at a mid-size
spatial grid.

Measured 2026-08-19 on 1× v5e (12-step segment, random ×0.02 weights):

    teacache@2 30.7 dB · teacache@3 28.4 · teacache@4 27.3
    w8a8+teacache@3 28.4 · w8a8 alone 53.3

i.e. the 8-layer proxy OVER-predicts full-depth TeaCache fidelity by
~11 dB (39.6 → 28.4 at interval 3) while the structural claims transfer:
quantization noise stays ~25 dB below TeaCache error (w8a8+tc ≡ tc to
within 0.1 dB), and fidelity is monotone in the interval. Random weights
are a PESSIMISTIC bound for TeaCache — its premise is the step-to-step
smoothness of a *trained* model's block residuals, which a random
t-conditioning pathway does not have — so the trained-weight value lies
between the anchor and the proxy; it cannot be measured in this
weights-free image (BASELINE.md records both ends).

The assertions are therefore (a) regression pins at measured−4 dB and
(b) the transferable structural claims — not absolute quality floors.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

STEPS = 12
LFZ = 4
F_HIST = 9
H, W = 24, 40


@pytest.fixture(scope="module")
def base():
    from yume_tpu.configs import ti2v_5b
    from yume_tpu.models.dit import WanDiT
    from yume_tpu.pipelines.ti2v import TI2VPipeline

    cfg = dataclasses.replace(ti2v_5b(), latent_frame_zero=LFZ)
    dit = WanDiT(cfg.dit, dtype=jnp.bfloat16)

    def _init(k, x, t, c):
        return dit.init(k, x, t, c, packed=True, latent_frame_zero=LFZ)

    shapes = jax.eval_shape(
        _init, jax.random.PRNGKey(0),
        jnp.zeros((1, F_HIST + LFZ, H, W, cfg.dit.in_dim), jnp.bfloat16),
        jnp.zeros((1, F_HIST + LFZ)),
        jnp.zeros((1, cfg.dit.text_len, cfg.dit.text_dim), jnp.bfloat16),
    )
    # random bf16 params without a 20 GB fp32 init (head randomized too —
    # a zero head would make every mode output v=0 identically)
    key = jax.random.PRNGKey(0)
    params = jax.tree_util.tree_map(
        lambda s: jax.random.normal(key, s.shape, jnp.bfloat16) * 0.02,
        shapes)

    pipe = TI2VPipeline(config=cfg, dit=dit, dit_params=params,
                        vae=None, vae_params=None, t5=None, t5_params=None)

    hist = jax.random.normal(jax.random.PRNGKey(1),
                             (1, F_HIST, H, W, cfg.dit.in_dim), jnp.float32)
    ctx = jax.random.normal(
        jax.random.PRNGKey(2),
        (1, cfg.dit.text_len, cfg.dit.text_dim), jnp.float32) * 0.2
    ref = np.asarray(pipe.generate_segment(
        hist, ctx, steps=STEPS, shift=7.0, sampler="euler")[:, -LFZ:],
        np.float32)
    return dict(cfg=cfg, pipe=pipe, hist=hist, ctx=ctx, ref=ref)


def _psnr(ref, got):
    rng_pp = float(ref.max() - ref.min())
    mse = float(np.mean((np.asarray(got, np.float32) - ref) ** 2))
    return 10.0 * np.log10(rng_pp ** 2 / max(mse, 1e-12))


def _wpipe(base):
    from yume_tpu.models.dit import WanDiT
    from yume_tpu.pipelines.ti2v import TI2VPipeline

    cfg = base["cfg"]
    dit_cfg = dataclasses.replace(cfg.dit, w8a8=True)
    return TI2VPipeline(
        config=dataclasses.replace(cfg, dit=dit_cfg),
        dit=WanDiT(dit_cfg, dtype=jnp.bfloat16),
        dit_params=base["pipe"].dit_params, vae=None, vae_params=None,
        t5=None, t5_params=None)


def _run(pipe, base, **kw):
    got = pipe.generate_segment(base["hist"], base["ctx"], steps=STEPS,
                                shift=7.0, **kw)
    return _psnr(base["ref"], np.asarray(got[:, -LFZ:], np.float32))


# regression pins: measured 2026-08-19/20 − 4 dB headroom. The adaptive
# rows (rel-L1 threshold refresh, round-5 sweep in docs/PERF.md) are the
# headline-config anchors: threshold 0.2 measured 38.0 dB at the SAME
# 4-full-step budget where interval 3 measured 28.4.
@pytest.mark.parametrize("mode,pin", [
    ("teacache@2", 26.7),
    ("teacache@3", 24.4),
    ("w8a8", 49.0),
    ("adaptive@0.2", 34.0),
    ("adaptive@0.1", 36.6),
])
def test_fullscale_regression_pin(base, mode, pin):
    if mode == "w8a8":
        p = _run(_wpipe(base), base, sampler="euler")
    elif mode.startswith("adaptive"):
        p = _run(base["pipe"], base, sampler="teacache",
                 teacache_threshold=float(mode.split("@")[1]))
    else:
        p = _run(base["pipe"], base, sampler="teacache",
                 teacache_interval=int(mode.split("@")[1]))
    print(f"fullscale[{mode}] latent PSNR {p:.1f} dB (pin {pin})")
    assert np.isfinite(p)
    assert p >= pin, f"{mode}: full-scale PSNR {p:.1f} dB < pin {pin}"
    assert p <= 80.0, f"{mode}: PSNR {p:.1f} dB suspiciously exact — vacuous"


def test_fullscale_adaptive_beats_fixed_at_matched_budget(base):
    """The round-5 structural claim: at the same full-step budget the
    adaptive rel-L1 schedule beats the fixed interval by several dB
    (refreshes land where the trajectory moves). Also pins the headline
    config (W8A8 + adaptive@0.2) within quant noise of bf16 adaptive."""
    pipe = base["pipe"]
    p_fixed = _run(pipe, base, sampler="teacache", teacache_interval=3)
    p_adapt = _run(pipe, base, sampler="teacache", teacache_threshold=0.2)
    n_full = int(pipe.last_teacache_n_full)
    print(f"fullscale adaptive@0.2 {p_adapt:.1f} dB (n_full {n_full}) vs "
          f"interval-3 {p_fixed:.1f} dB")
    assert n_full <= 6, n_full  # same ballpark budget as interval 3 (4/12)
    assert p_adapt >= p_fixed + 4.0

    p_w8 = _run(_wpipe(base), base, sampler="teacache",
                teacache_threshold=0.2)
    print(f"fullscale w8a8+adaptive@0.2 {p_w8:.1f} dB")
    assert abs(p_adapt - p_w8) < 3.0


def test_fullscale_quant_noise_subdominant(base):
    """The structural claim that transfers from the proxy: the W8A8
    composition costs ≈ nothing on top of TeaCache (quant noise ~25 dB
    below the cache error), so the fastest serving config is also the
    gated one."""
    p_tc = _run(base["pipe"], base, sampler="teacache", teacache_interval=3)
    p_w8 = _run(_wpipe(base), base, sampler="teacache", teacache_interval=3)
    print(f"fullscale teacache@3 {p_tc:.1f} dB vs w8a8+teacache@3 {p_w8:.1f}")
    assert abs(p_tc - p_w8) < 3.0
