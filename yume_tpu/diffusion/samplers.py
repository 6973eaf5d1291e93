"""Sampling loops: jitted `lax.scan` Euler flow integration, SDE churn,
time-travel (TTS) — the TPU-native form of the reference's Python step loops
(fastvideo/sample/sample_5b.py:960-1040, sample.py:769-790,
sample_tts.py:690-854).

All samplers take a ``denoise_fn(latent, t_frame) -> velocity`` closure (the
DiT with conditioning bound) so they compose with jit/shard_map; every loop
is a single `lax.scan` over the sigma ladder → one compilation, no
host↔device sync per step.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .transport import Transport

DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def _sigma_pairs(sigmas: np.ndarray) -> jnp.ndarray:
    """[(σ_i, σ_{i+1})] pairs for a ladder ending in 0."""
    s = jnp.asarray(sigmas, jnp.float32)
    return jnp.stack([s[:-1], s[1:]], axis=1)


def euler_sample(
    denoise_fn: DenoiseFn,
    noise: jax.Array,
    sigmas: np.ndarray,
) -> jax.Array:
    """Plain Euler flow integration over all frames (5B t2v first segment,
    reference sample_5b.py:1014-1036: scalar t, flag=False, no CFG).

    noise: [B, F, H, W, C]; sigmas: [steps+1] descending to 0.
    """
    b, f = noise.shape[:2]

    def step(latent, sig):
        s_i, s_n = sig[0], sig[1]
        t_frame = jnp.full((b, f), s_i * 1000.0)
        v = denoise_fn(latent, t_frame)
        return latent + (s_n - s_i) * v, None

    latent, _ = jax.lax.scan(step, noise, _sigma_pairs(sigmas))
    return latent


def euler_sample_segment(
    denoise_fn: DenoiseFn,
    latent: jax.Array,
    sigmas: np.ndarray,
    latent_frame_zero: int,
    *,
    history_t: Optional[jax.Array] = None,
) -> jax.Array:
    """Tail-only Euler update with frozen history (5B i2v / autoregressive
    segments, reference sample_5b.py:960-1040): per-frame timesteps — history
    frames at their mask2 values (0 at inference), tail at σ_i·1000 — and
    only the trailing ``latent_frame_zero`` frames integrate.

    latent: [B, F, H, W, C] = [history | tail noise].
    denoise_fn returns the velocity for the tail frames (packed DiT) or all
    frames (unpacked); only its trailing frames are used.
    """
    b, f = latent.shape[:2]
    f_hist = f - latent_frame_zero
    if history_t is None:
        history_t = jnp.zeros((b, f_hist), jnp.float32)

    def step(latent, sig):
        s_i, s_n = sig[0], sig[1]
        t_frame = jnp.concatenate(
            [history_t * 1000.0,
             jnp.full((b, latent_frame_zero), s_i * 1000.0)], axis=1)
        v = denoise_fn(latent, t_frame)
        v_tail = v[:, -latent_frame_zero:]
        tail = latent[:, -latent_frame_zero:] + (s_n - s_i) * v_tail
        return jnp.concatenate([latent[:, :f_hist], tail], axis=1), None

    latent, _ = jax.lax.scan(step, latent, _sigma_pairs(sigmas))
    return latent


def dual_model_euler_sample(
    denoise_high: DenoiseFn,
    denoise_low: DenoiseFn,
    noise: jax.Array,
    sigmas: np.ndarray,
    *,
    boundary: float = 0.875,
) -> jax.Array:
    """Dual low/high-noise expert sampling (stock Wan2.2 I2V 'MoE':
    reference wan23/image2video.py:104-120, 388-391 — the high-noise model
    handles σ ≥ boundary, the low-noise model the rest; the reference swaps
    models between steps via CPU⇄GPU offload, here the sigma ladder is
    statically split into two scans)."""
    sig = np.asarray(sigmas, np.float32)
    split = int(np.sum(sig[:-1] >= boundary))
    b, f = noise.shape[:2]

    def run(fn, latent, ladder):
        if len(ladder) < 2:
            return latent

        def step(latent, s):
            s_i, s_n = s[0], s[1]
            v = fn(latent, jnp.full((b, f), s_i * 1000.0))
            return latent + (s_n - s_i) * v, None

        pairs = jnp.stack([jnp.asarray(ladder[:-1]), jnp.asarray(ladder[1:])], axis=1)
        latent, _ = jax.lax.scan(step, latent, pairs)
        return latent

    latent = run(denoise_high, noise, sig[: split + 1])
    return run(denoise_low, latent, sig[split:])


def cfg_euler_sample_segment(
    denoise_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    latent: jax.Array,
    noise: jax.Array,
    ctx: jax.Array,
    ctx_null: jax.Array,
    sigmas: np.ndarray,
    latent_frame_zero: int,
    guide_scale: float,
    batched_cfg: bool = False,
) -> jax.Array:
    """14B-style CFG Euler with history re-noising (reference
    fastvideo/sample/sample.py:769-790): two DiT calls per step
    (cond/uncond), tail Euler update, history prefix re-noised to the next
    sigma: prefix ← σ_{n}·noise + (1−σ_{n})·clean_history.

    ``denoise_fn(latent, t_frame, ctx)``; ``latent`` enters at σ=1 (tail is
    noise, history already re-noised at σ_0=1 by the caller or here).

    ``batched_cfg`` runs cond+uncond as ONE batch-2B forward (identical
    math — the model is batch-independent). Under a mesh with a ``data``
    axis of 2, GSPMD splits the two branches across chips: xDiT's
    classifier-free-guidance parallelism (the reference delegates this to
    xfuser's cfg_degree).
    """
    b, f = latent.shape[:2]
    f_hist = f - latent_frame_zero
    clean_history = latent[:, :f_hist]
    # start: tail noise, history re-noised at sigma_0
    s0 = float(sigmas[0])
    hist0 = s0 * noise[:, :f_hist] + (1.0 - s0) * clean_history
    latent = jnp.concatenate([hist0, noise[:, f_hist:]], axis=1)

    ctx2 = (jnp.concatenate([ctx, ctx_null], axis=0)
            if batched_cfg and ctx_null is not None else None)

    def step(latent, sig):
        s_i, s_n = sig[0], sig[1]
        t_frame = jnp.full((b, f), s_i * 1000.0)
        if ctx_null is None:
            # distilled few-step serving: guidance is baked into the
            # weights (the 5B 4-step trick, reference sample_5b.py
            # cond-only loop), so one forward per step — halves the 14B
            # per-segment cost at any step count
            v = denoise_fn(latent, t_frame, ctx)
        else:
            if batched_cfg:
                v2 = denoise_fn(
                    jnp.concatenate([latent, latent], axis=0),
                    jnp.concatenate([t_frame, t_frame], axis=0), ctx2)
                v_c, v_u = v2[:b], v2[b:]
            else:
                v_c = denoise_fn(latent, t_frame, ctx)
                v_u = denoise_fn(latent, t_frame, ctx_null)
            v = v_u + guide_scale * (v_c - v_u)
        v_tail = v[:, -latent_frame_zero:]
        tail = latent[:, -latent_frame_zero:] + (s_n - s_i) * v_tail
        hist = s_n * noise[:, :f_hist] + (1.0 - s_n) * clean_history
        return jnp.concatenate([hist, tail], axis=1), None

    latent, _ = jax.lax.scan(step, latent, _sigma_pairs(sigmas))
    return latent


def cfg_euler_sample_segment_cached(
    denoise_full,
    denoise_cached,
    latent: jax.Array,
    noise: jax.Array,
    ctx: jax.Array,
    ctx_null: jax.Array,
    sigmas: np.ndarray,
    latent_frame_zero: int,
    guide_scale: float,
    *,
    cache_interval: int = 2,
) -> jax.Array:
    """14B CFG Euler with TeaCache block-residual reuse: every
    ``cache_interval``-th step runs the full DiT (storing residuals
    separately for the cond and uncond passes, like the reference's two
    `cache`/`cache_uncond` lists fed back through `cache_sample`,
    wan/modules/model.py:977-998 + fastvideo/sample/sample.py cache wiring);
    in-between steps skip the cached blocks. Unrolled (small step count).

    ``denoise_full(latent, t, ctx) -> (v, cache)``;
    ``denoise_cached(latent, t, ctx, cache) -> v``.
    """
    b, f = latent.shape[:2]
    f_hist = f - latent_frame_zero
    clean_history = latent[:, :f_hist]
    sig = np.asarray(sigmas, np.float32)
    s0 = float(sig[0])
    hist0 = s0 * noise[:, :f_hist] + (1.0 - s0) * clean_history
    latent = jnp.concatenate([hist0, noise[:, f_hist:]], axis=1)

    cache_c = cache_u = None
    for i in range(len(sig) - 1):
        s_i, s_n = float(sig[i]), float(sig[i + 1])
        t_frame = jnp.full((b, f), s_i * 1000.0)
        if cache_c is None or i % cache_interval == 0:
            v_c, cache_c = denoise_full(latent, t_frame, ctx)
            v_u, cache_u = denoise_full(latent, t_frame, ctx_null)
        else:
            v_c = denoise_cached(latent, t_frame, ctx, cache_c)
            v_u = denoise_cached(latent, t_frame, ctx_null, cache_u)
        v = v_u + guide_scale * (v_c - v_u)
        tail = latent[:, -latent_frame_zero:] + (s_n - s_i) * v[:, -latent_frame_zero:]
        hist = s_n * noise[:, :f_hist] + (1.0 - s_n) * clean_history
        latent = jnp.concatenate([hist, tail], axis=1)
    return latent


def cfg_sde_euler_sample_segment(
    denoise_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    latent: jax.Array,
    noise: jax.Array,
    ctx: jax.Array,
    ctx_null: jax.Array,
    sigmas: np.ndarray,
    latent_frame_zero: int,
    guide_scale: float,
    rng: jax.Array,
    *,
    eta: float = 0.3,
) -> jax.Array:
    """14B TTS sampling: CFG Euler with per-step history re-noise PLUS the
    SDE churn correction (reference fastvideo/sample/sample_tts.py:726-744
    layered on the sample.py:769-790 loop)."""
    b, f = latent.shape[:2]
    f_hist = f - latent_frame_zero
    clean_history = latent[:, :f_hist]
    s0 = float(sigmas[0])
    hist0 = s0 * noise[:, :f_hist] + (1.0 - s0) * clean_history
    latent = jnp.concatenate([hist0, noise[:, f_hist:]], axis=1)

    def step(carry, sig):
        latent, rng = carry
        rng, eps_rng = jax.random.split(rng)
        s_i, s_n = sig[0], sig[1]
        t_frame = jnp.full((b, f), s_i * 1000.0)
        v_c = denoise_fn(latent, t_frame, ctx)
        v_u = denoise_fn(latent, t_frame, ctx_null)
        v = v_u + guide_scale * (v_c - v_u)
        v_tail = v[:, -latent_frame_zero:]
        x_tail = latent[:, -latent_frame_zero:]
        dt = s_i - s_n
        tail = x_tail - dt * v_tail
        score = Transport.score_from_velocity(
            v_tail, x_tail, jnp.full((b,), s_i))
        eps = jax.random.normal(eps_rng, x_tail.shape, x_tail.dtype)
        tail = tail + (eta ** 2) * s_i * score * dt \
            + eta * jnp.sqrt(2.0 * dt * s_i) * eps
        hist = s_n * noise[:, :f_hist] + (1.0 - s_n) * clean_history
        return (jnp.concatenate([hist, tail], axis=1), rng), None

    (latent, _), _ = jax.lax.scan(step, (latent, rng), _sigma_pairs(sigmas))
    return latent


def sde_euler_sample_segment(
    denoise_fn: DenoiseFn,
    latent: jax.Array,
    sigmas: np.ndarray,
    latent_frame_zero: int,
    rng: jax.Array,
    *,
    eta: float = 0.3,
    history_t: Optional[jax.Array] = None,
) -> jax.Array:
    """SDE churn sampling (TTS; reference fastvideo/sample/sample_tts.py:
    726-744): after each Euler tail step, add an Euler–Maruyama correction
    from the score estimate: x ← x + η²·σ·score·Δt + η·√(2Δt·σ)·ε.
    """
    b, f = latent.shape[:2]
    f_hist = f - latent_frame_zero
    if history_t is None:
        history_t = jnp.zeros((b, f_hist), jnp.float32)

    def step(carry, sig):
        latent, rng = carry
        rng, eps_rng = jax.random.split(rng)
        s_i, s_n = sig[0], sig[1]
        t_frame = jnp.concatenate(
            [history_t * 1000.0,
             jnp.full((b, latent_frame_zero), s_i * 1000.0)], axis=1)
        v = denoise_fn(latent, t_frame)
        v_tail = v[:, -latent_frame_zero:]
        x_tail = latent[:, -latent_frame_zero:]
        dt = s_i - s_n
        # deterministic Euler step
        tail = x_tail - dt * v_tail
        # stochastic churn from score (velocity → score on reverse path)
        score = Transport.score_from_velocity(
            v_tail, x_tail, jnp.full((b,), s_i))
        noise = jax.random.normal(eps_rng, x_tail.shape, x_tail.dtype)
        tail = tail + (eta ** 2) * s_i * score * dt \
            + eta * jnp.sqrt(2.0 * dt * s_i) * noise
        out = jnp.concatenate([latent[:, :f_hist], tail], axis=1)
        return (out, rng), None

    (latent, _), _ = jax.lax.scan(step, (latent, rng), _sigma_pairs(sigmas))
    return latent


def time_travel_sample_segment(
    denoise_fn: DenoiseFn,
    latent: jax.Array,
    sigmas: np.ndarray,
    latent_frame_zero: int,
    *,
    interval: int = 2,
    travel_steps: int = 2,
    history_t: Optional[jax.Array] = None,
    sde: bool = False,
    rng: Optional[jax.Array] = None,
    eta: float = 0.3,
) -> jax.Array:
    """Time-travel (lookahead) sampling, frozen-history form (the reference
    loop of fastvideo/sample/sample_tts.py:690-854 adapted to the 5B
    per-frame-t/no-renoise segment convention; for the exact 14B form see
    :func:`cfg_time_travel_sample_segment`).

    Every ``interval`` steps: take a provisional Euler step, roll the ODE
    forward to step i+``travel_steps``−1, then REDO step i from the original
    state using the last lookahead velocity (the reference's splice-back —
    the lookahead velocity *replaces* the provisional one, sample_tts.py:
    836-841). With ``sde`` (the combined TTS mode, --sde --time_travel) an
    Euler–Maruyama churn from the score estimate follows every Euler tail
    update, outer and lookahead alike (reference :726-744).
    """
    b, f = latent.shape[:2]
    f_hist = f - latent_frame_zero
    if history_t is None:
        history_t = jnp.zeros((b, f_hist), jnp.float32)
    sig = np.asarray(sigmas, np.float32)
    n_steps = len(sig) - 1
    if sde and rng is None:
        raise ValueError("sde churn needs an rng")
    rngs = iter(jax.random.split(rng, 4 * n_steps * max(1, travel_steps))
                if sde else [])

    def t_frame_at(s_i):
        return jnp.concatenate(
            [history_t * 1000.0,
             jnp.full((b, latent_frame_zero), s_i * 1000.0)], axis=1)

    def euler_tail(latent, s_i, s_n, v=None):
        if v is None:
            v = denoise_fn(latent, t_frame_at(s_i))
        x_tail = latent[:, -latent_frame_zero:]
        v_tail = v[:, -latent_frame_zero:]
        tail = x_tail + (s_n - s_i) * v_tail
        if sde:
            dt = float(s_i - s_n)
            score = Transport.score_from_velocity(
                v_tail, x_tail, jnp.full((b,), float(s_i)))
            eps = jax.random.normal(next(rngs), tail.shape, tail.dtype)
            tail = tail + (eta ** 2) * float(s_i) * score * dt \
                + eta * np.sqrt(max(2.0 * dt * float(s_i), 0.0)) * eps
        return jnp.concatenate([latent[:, :f_hist], tail], axis=1), v

    # static unrolled outer loop (steps are few at inference; keeps the
    # lookahead control flow compile-time static)
    for i in range(n_steps):
        provisional, v0 = euler_tail(latent, sig[i], sig[i + 1])
        if interval > 0 and i % interval == 0:
            # lookahead rollout j = i+1 .. min(n_steps, i+travel_steps)−1
            travel_stop = min(n_steps, i + travel_steps)
            xt, v_look = provisional, None
            for j in range(i + 1, travel_stop):
                xt, v_look = euler_tail(xt, sig[j], sig[j + 1])
            if v_look is not None:
                # splice-back: redo step i from the ORIGINAL latent with the
                # lookahead velocity
                latent, _ = euler_tail(latent, sig[i], sig[i + 1], v=v_look)
                continue
        latent = provisional
    return latent


def cfg_time_travel_sample_segment(
    denoise_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    latent: jax.Array,
    noise: jax.Array,
    ctx: jax.Array,
    ctx_null: jax.Array,
    sigmas: np.ndarray,
    latent_frame_zero: int,
    guide_scale: float,
    *,
    interval: int = 2,
    travel_steps: int = 2,
    sde: bool = False,
    rng: Optional[jax.Array] = None,
    eta: float = 0.3,
) -> jax.Array:
    """The exact 14B TTS time-travel loop (reference fastvideo/sample/
    sample_tts.py:690-854): CFG Euler on the tail with per-step history
    re-noise, and every ``interval`` steps a lookahead rollout whose final
    velocity REPLACES the provisional step-i velocity (splice-back). With
    ``sde`` the Euler–Maruyama churn (:726-744) applies inside both the
    outer and travel loops.

    Arithmetic notes mirrored from the reference:
      * history re-noise index is min(S−1, ·) — the prefix never reaches
        σ=0 (:826-833);
      * the travel entry state re-noises the history at σ_{i+travel_steps}
        while the tail is at σ_{i+1} (:765-776);
      * when the inner loop is empty (i near the end) the reference would
        splice a stale velocity from the previous travel — we keep the
        provisional step instead (the only intentional divergence).
    """
    b, f = latent.shape[:2]
    f_hist = f - latent_frame_zero
    clean_history = latent[:, :f_hist]
    sig = np.asarray(sigmas, np.float32)
    n_steps = len(sig) - 1  # ladder includes the appended terminal 0

    def hist_at(idx: int):
        s = float(sig[min(n_steps - 1, idx)])
        return s * noise[:, :f_hist] + (1.0 - s) * clean_history

    def cfg_v(lat, s_i):
        t_frame = jnp.full((b, f), s_i * 1000.0)
        v_c = denoise_fn(lat, t_frame, ctx)
        v_u = denoise_fn(lat, t_frame, ctx_null)
        return v_u + guide_scale * (v_c - v_u)

    def churn(tail_new, lat_tail, v_tail, s_i, s_n, rng, final=False):
        """SDE correction on an updated tail (reference :726-744): the mean
        is shifted by −½η²·score·dσ and η√Δt noise is added. At the final
        outer step the reference zeroes Δt (no noise) but keeps the mean
        shift (:733-737)."""
        rng, eps_rng = jax.random.split(rng)
        pred_x0 = lat_tail + (0.0 - s_i) * v_tail
        delta_t = 0.0 if final else max(s_i - s_n, 0.0)
        dsigma = s_n - s_i
        std = eta * float(np.sqrt(delta_t))
        score = -(lat_tail - pred_x0 * (1.0 - s_i)) / (s_i ** 2)
        mean = tail_new + (-0.5 * eta ** 2 * score) * dsigma
        eps = jax.random.normal(eps_rng, tail_new.shape, tail_new.dtype)
        return mean + std * eps, rng

    # start: tail = fresh noise, history re-noised at σ_0 (like
    # cfg_euler_sample_segment; reference :756-760)
    latent = jnp.concatenate(
        [hist_at(0), noise[:, f_hist:]], axis=1)

    for i in range(n_steps):
        s_i, s_n = float(sig[i]), float(sig[i + 1])
        v = cfg_v(latent, s_i)
        lat_tail = latent[:, -latent_frame_zero:]
        temp_x0 = lat_tail + (s_n - s_i) * v[:, -latent_frame_zero:]
        if sde:
            temp_x0, rng = churn(temp_x0, lat_tail,
                                 v[:, -latent_frame_zero:], s_i, s_n, rng,
                                 final=(i + 1 == n_steps))

        if interval > 0 and i % interval == 0:
            travel_stop = min(n_steps - 1, i + travel_steps)
            lat_tr = jnp.concatenate([hist_at(travel_stop), temp_x0], axis=1)
            current_pred = None
            for j in range(i + 1, travel_stop):
                sj, sjn = float(sig[j]), float(sig[j + 1])
                v_tr = cfg_v(lat_tr, sj)
                tr_tail = lat_tr[:, -latent_frame_zero:]
                x0_tr = tr_tail + (sjn - sj) * v_tr[:, -latent_frame_zero:]
                if sde:
                    x0_tr, rng = churn(x0_tr, tr_tail,
                                       v_tr[:, -latent_frame_zero:], sj, sjn,
                                       rng)
                lat_tr = jnp.concatenate([hist_at(j + 1), x0_tr], axis=1)
                current_pred = v_tr
            if current_pred is not None:
                temp_x0 = lat_tail + (s_n - s_i) * \
                    current_pred[:, -latent_frame_zero:]

        latent = jnp.concatenate([hist_at(i + 1), temp_x0], axis=1)
    return latent


def euler_sample_segment_cached(
    denoise_full,
    denoise_cached,
    latent: jax.Array,
    sigmas: np.ndarray,
    latent_frame_zero: int,
    *,
    cache_interval: int = 2,
    history_t: Optional[jax.Array] = None,
):
    """Euler tail sampling with TeaCache-style block-residual reuse
    (reference wan/modules/model.py:977-998): every ``cache_interval``-th
    step runs the full DiT and stores block residuals; in-between steps skip
    the cached blocks and add the stored residuals.

    denoise_full(latent, t) -> (v, cache); denoise_cached(latent, t, cache)
    -> v. Unrolled over the ladder (step count is small at inference).
    """
    b, f = latent.shape[:2]
    f_hist = f - latent_frame_zero
    if history_t is None:
        history_t = jnp.zeros((b, f_hist), jnp.float32)
    sig = np.asarray(sigmas, np.float32)
    cache = None
    for i in range(len(sig) - 1):
        s_i, s_n = float(sig[i]), float(sig[i + 1])
        t_frame = jnp.concatenate(
            [history_t * 1000.0,
             jnp.full((b, latent_frame_zero), s_i * 1000.0)], axis=1)
        if cache is None or i % cache_interval == 0:
            v, cache = denoise_full(latent, t_frame)
        else:
            v = denoise_cached(latent, t_frame, cache)
        tail = latent[:, -latent_frame_zero:] + (s_n - s_i) * v[:, -latent_frame_zero:]
        latent = jnp.concatenate([latent[:, :f_hist], tail], axis=1)
    return latent


def _rel_l1(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(jnp.abs(a - b)) / jnp.maximum(jnp.sum(jnp.abs(b)), 1e-6)


def euler_sample_segment_cached_adaptive(
    denoise_full,
    denoise_cached,
    latent: jax.Array,
    sigmas: np.ndarray,
    latent_frame_zero: int,
    *,
    threshold: float = 0.15,
    history_t: Optional[jax.Array] = None,
):
    """TeaCache with DATA-ADAPTIVE refresh scheduling: instead of a fixed
    1-in-N interval, each step accumulates the relative-L1 delta of the
    model input (the evolving tail latent) and runs the full DiT only when
    the accumulator crosses ``threshold`` — refreshes are spent where the
    trajectory moves fast (early, high-sigma steps) and cached steps where
    it is smooth. The reference's residual-cache mechanism is
    wan/modules/model.py:977-998; the schedule there is driven externally,
    so the indicator policy is ours (TeaCache-style rel-L1 thresholding).

    Step 0 always runs full. The loop is ONE ``lax.scan`` whose body holds a
    two-branch ``lax.cond`` — the compiled program contains exactly one
    full trace and one cached trace regardless of step count (the 14B
    compile lesson), and only the taken branch executes at runtime.

    Returns ``(latent, n_full)`` — n_full counts full-DiT steps actually
    executed (includes step 0), for effective-cost accounting.
    """
    b, f = latent.shape[:2]
    f_hist = f - latent_frame_zero
    if history_t is None:
        history_t = jnp.zeros((b, f_hist), jnp.float32)
    sig = np.asarray(sigmas, np.float32)

    def t_frame_at(s_i):
        return jnp.concatenate(
            [history_t * 1000.0,
             jnp.broadcast_to(s_i * 1000.0, (b, latent_frame_zero))], axis=1)

    # step 0: full pass seeds the cache
    s0, s1 = float(sig[0]), float(sig[1])
    prev_tail = latent[:, -latent_frame_zero:]
    v, cache = denoise_full(latent, t_frame_at(jnp.float32(s0)))
    tail = prev_tail + (s1 - s0) * v[:, -latent_frame_zero:]
    latent = jnp.concatenate([latent[:, :f_hist], tail], axis=1)

    def step(carry, tr):
        lat, cache, prev_tail, accum, n_full = carry
        s_i, s_n = tr[0], tr[1]
        cur_tail = lat[:, -latent_frame_zero:]
        accum = accum + _rel_l1(cur_tail, prev_tail)
        refresh = accum >= threshold
        t_frame = t_frame_at(s_i)

        def do_full(op):
            lat_, _ = op
            v, new_cache = denoise_full(lat_, t_frame)
            return v, new_cache

        def do_cached(op):
            lat_, cache_ = op
            return denoise_cached(lat_, t_frame, cache_), cache_

        v, cache = jax.lax.cond(refresh, do_full, do_cached, (lat, cache))
        tail = cur_tail + (s_n - s_i) * v[:, -latent_frame_zero:]
        lat = jnp.concatenate([lat[:, :f_hist], tail], axis=1)
        accum = jnp.where(refresh, 0.0, accum)
        n_full = n_full + refresh.astype(jnp.int32)
        return (lat, cache, cur_tail, accum, n_full), None

    carry = (latent, cache, prev_tail, jnp.float32(0.0), jnp.int32(1))
    (latent, _, _, _, n_full), _ = jax.lax.scan(
        step, carry, _sigma_pairs(sig[1:]))
    return latent, n_full


def cfg_euler_sample_segment_cached_adaptive(
    denoise_full,
    denoise_cached,
    latent: jax.Array,
    noise: jax.Array,
    ctx: jax.Array,
    ctx_null: jax.Array,
    sigmas: np.ndarray,
    latent_frame_zero: int,
    guide_scale: float,
    *,
    threshold: float = 0.15,
):
    """CFG (14B) analogue of :func:`euler_sample_segment_cached_adaptive`:
    cond and uncond caches refresh together on the shared tail-latent
    indicator (their inputs are identical, so one indicator drives both —
    ≙ the reference keeping separate `cache`/`cache_uncond` lists but one
    step counter). Returns ``(latent, n_full)``."""
    b, f = latent.shape[:2]
    f_hist = f - latent_frame_zero
    clean_history = latent[:, :f_hist]
    sig = np.asarray(sigmas, np.float32)
    s0, s1 = float(sig[0]), float(sig[1])
    hist0 = s0 * noise[:, :f_hist] + (1.0 - s0) * clean_history
    latent = jnp.concatenate([hist0, noise[:, f_hist:]], axis=1)

    def t_frame_at(s_i):
        return jnp.broadcast_to(s_i * 1000.0, (b, f))

    prev_tail = latent[:, -latent_frame_zero:]
    v_c, cache_c = denoise_full(latent, t_frame_at(jnp.float32(s0)), ctx)
    v_u, cache_u = denoise_full(latent, t_frame_at(jnp.float32(s0)), ctx_null)
    v = v_u + guide_scale * (v_c - v_u)
    tail = prev_tail + (s1 - s0) * v[:, -latent_frame_zero:]
    hist = s1 * noise[:, :f_hist] + (1.0 - s1) * clean_history
    latent = jnp.concatenate([hist, tail], axis=1)

    def step(carry, tr):
        lat, cache_c, cache_u, prev_tail, accum, n_full = carry
        s_i, s_n = tr[0], tr[1]
        cur_tail = lat[:, -latent_frame_zero:]
        accum = accum + _rel_l1(cur_tail, prev_tail)
        refresh = accum >= threshold
        t_frame = t_frame_at(s_i)

        def do_full(op):
            lat_, _, _ = op
            v_c, new_c = denoise_full(lat_, t_frame, ctx)
            v_u, new_u = denoise_full(lat_, t_frame, ctx_null)
            return v_c, v_u, new_c, new_u

        def do_cached(op):
            lat_, cc, cu = op
            return (denoise_cached(lat_, t_frame, ctx, cc),
                    denoise_cached(lat_, t_frame, ctx_null, cu), cc, cu)

        v_c, v_u, cache_c, cache_u = jax.lax.cond(
            refresh, do_full, do_cached, (lat, cache_c, cache_u))
        v = v_u + guide_scale * (v_c - v_u)
        tail = cur_tail + (s_n - s_i) * v[:, -latent_frame_zero:]
        hist = s_n * noise[:, :f_hist] + (1.0 - s_n) * clean_history
        lat = jnp.concatenate([hist, tail], axis=1)
        accum = jnp.where(refresh, 0.0, accum)
        n_full = n_full + refresh.astype(jnp.int32)
        return (lat, cache_c, cache_u, cur_tail, accum, n_full), None

    carry = (latent, cache_c, cache_u, prev_tail, jnp.float32(0.0),
             jnp.int32(1))
    (latent, _, _, _, _, n_full), _ = jax.lax.scan(
        step, carry, _sigma_pairs(sig[1:]))
    return latent, n_full
