"""Flow-matching transport: path plan, timestep sampling, training losses.

JAX re-design of the reference Transport (hyvideo/diffusion/flow/transport.py)
specialised to the configuration the reference actually trains with
(`load_denoiser()`, hyvideo/diffusion/__init__.py:73-84): linear path (ICPlan),
velocity prediction, lognorm SNR, shift 3.0, reverse=True. Everything is a
pure function over explicit PRNG keys so it composes with jit/grad/shard_map.

Path convention (ICPlan, reverse=True; reference path.py:21-33):
    x_t = (1 − t)·x1 + t·x0        (x1 = data, x0 = noise)
    u_t = d x_t / dt = x0 − x1     (velocity target)
so t=0 is clean data and t=1 is pure noise; samplers integrate t: 1 → 0.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .schedule import shift_t


@dataclasses.dataclass(frozen=True)
class Transport:
    """Linear-path velocity flow matching (the reference's live config)."""

    shift: float = 3.0
    training_timesteps: int = 1000
    snr_type: str = "lognorm"  # 'lognorm' | 'uniform'

    def sample_t(self, rng: jax.Array, batch: int) -> jax.Array:
        """Draw training timesteps t ∈ (0,1).

        lognorm: t = sigmoid(N(0,1)) then shift-warped
        (reference transport.py:139-153).
        """
        if self.snr_type == "lognorm":
            u = jax.random.normal(rng, (batch,), dtype=jnp.float32)
            t = jax.nn.sigmoid(u)
        elif self.snr_type == "uniform":
            t = jax.random.uniform(rng, (batch,), dtype=jnp.float32)
        else:
            raise ValueError(f"unknown snr_type {self.snr_type}")
        if self.shift != 1.0:
            t = shift_t(t, self.shift)
        return t

    @staticmethod
    def plan(t: jax.Array, x0: jax.Array, x1: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """(x_t, u_t) along the reverse linear path.

        t broadcasts over all trailing dims of x0/x1 ([B] → [B,1,1,...]).
        Reference path.py:115-140 (compute_mu_t/plan) under reverse=True.
        """
        tb = t.reshape(t.shape + (1,) * (x1.ndim - t.ndim))
        xt = (1.0 - tb) * x1 + tb * x0
        ut = x0 - x1
        return xt, ut

    @staticmethod
    def score_from_velocity(v: jax.Array, x: jax.Array, t: jax.Array) -> jax.Array:
        """∇log p_t(x) from a velocity prediction (reverse linear path).

        With alpha=1−t, d_alpha=−1, sigma=t, d_sigma=1 (reference
        path.py:21-33, 74-88):
            ratio = alpha/d_alpha = −(1−t)
            var   = sigma² − ratio·d_sigma·sigma = t² + (1−t)t = t
            score = (ratio·v − x) / var
        Used by the SDE/TTS samplers (reference sample_tts.py:726-744).
        """
        tb = t.reshape(t.shape + (1,) * (x.ndim - t.ndim))
        ratio = -(1.0 - tb)
        var = tb * tb + (1.0 - tb) * tb
        return (ratio * v - x) / var

    def loss(
        self,
        v_pred: jax.Array,
        ut: jax.Array,
        *,
        tail_frames: int | None = None,
        frame_axis: int = 1,
    ) -> jax.Array:
        """Velocity-matching MSE, restricted to the trailing latent frames.

        The reference computes the loss only over the last
        `latent_frame_zero` frames (9 for 14B, 8 for 5B; reference
        transport.py:183-187, 249-253) — history frames are conditioning,
        not targets.

        Args:
            v_pred/ut: [B, F, H, W, C] (or any layout with a frame axis).
            tail_frames: number of trailing frames to include; None = all.
        """
        if tail_frames is not None:
            idx = [slice(None)] * v_pred.ndim
            idx[frame_axis] = slice(-tail_frames, None)
            v_pred = v_pred[tuple(idx)]
            ut = ut[tuple(idx)]
        diff = (v_pred.astype(jnp.float32) - ut.astype(jnp.float32)) ** 2
        return jnp.mean(diff, axis=tuple(range(1, diff.ndim)))
