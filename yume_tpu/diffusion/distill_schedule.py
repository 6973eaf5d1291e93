"""Distillation schedules: PCM (phased consistency) sigma ladders and the
discrete Euler solver used by consistency/adversarial distillation.

JAX equivalents of reference fastvideo/distill/solver.py (`PCMFMScheduler`)
and the `EulerSolver` duplicated at wan/utils/fm_solvers.py:861-936, plus
`linear_quadratic_schedule` (fastvideo/models/mochi_hf/pipeline_mochi.py,
imported by the live driver) and the FlowMatchDiscreteScheduler warp
(hyvideo/schedulers/scheduling_flow_match_discrete.py).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import shift_t


def linear_quadratic_schedule(num_steps: int, threshold: float = 0.025,
                              linear_steps: int | None = None) -> np.ndarray:
    """Linear-then-quadratic sigma schedule (reference
    pipeline_mochi.linear_quadratic_schedule, used via sample.py:41)."""
    if linear_steps is None:
        linear_steps = num_steps // 2
    linear = [i * threshold / linear_steps for i in range(linear_steps)]
    threshold_noise_step_diff = linear_steps - threshold * num_steps
    quadratic_steps = num_steps - linear_steps
    a = threshold_noise_step_diff / (linear_steps * quadratic_steps ** 2)
    b = threshold / linear_steps - 2 * a * linear_steps
    c = threshold - a * linear_steps ** 2 - b * linear_steps
    quadratic = [a * i ** 2 + b * i + c
                 for i in range(linear_steps, num_steps)]
    sigmas = np.asarray(linear + quadratic, np.float32)
    return 1.0 - sigmas


def pcm_sigmas(num_train_timesteps: int = 1000, shift: float = 1.0,
               pcm_timesteps: int = 50) -> np.ndarray:
    """Descending PCM sigma ladder (reference PCMFMScheduler.__init__,
    fastvideo/distill/solver.py:32-66)."""
    timesteps = np.linspace(1, num_train_timesteps, num_train_timesteps,
                            dtype=np.float32)[::-1]
    sigmas = shift_t(timesteps / num_train_timesteps, shift)
    idx = (np.arange(1, pcm_timesteps + 1) *
           (num_train_timesteps // pcm_timesteps)).round().astype(np.int64) - 1
    return np.ascontiguousarray(sigmas[::-1][idx][::-1])


@dataclasses.dataclass(frozen=True)
class EulerSolver:
    """Discrete Euler solver over a subsampled sigma ladder (reference
    wan/utils/fm_solvers.py:861-936): used by consistency distillation to
    step between teacher timesteps and to form multiphase targets."""

    sigmas: np.ndarray        # [K] at the euler timesteps
    sigmas_prev: np.ndarray   # [K] previous-step sigmas
    euler_timesteps: np.ndarray

    @classmethod
    def create(cls, sigmas: np.ndarray, timesteps: int = 1000,
               euler_timesteps: int = 50) -> "EulerSolver":
        step_ratio = timesteps // euler_timesteps
        idx = (np.arange(1, euler_timesteps + 1) * step_ratio).round().astype(np.int64) - 1
        sig = np.asarray(sigmas, np.float32)
        return cls(
            sigmas=sig[idx],
            sigmas_prev=np.asarray([sig[0]] + sig[idx[:-1]].tolist(), np.float32),
            euler_timesteps=idx,
        )

    def euler_step(self, sample: jax.Array, v_pred: jax.Array,
                   index: jax.Array) -> jax.Array:
        sigma = jnp.asarray(self.sigmas)[index].reshape((-1,) + (1,) * (sample.ndim - 1))
        sigma_prev = jnp.asarray(self.sigmas_prev)[index].reshape(sigma.shape)
        return sample + (sigma_prev - sigma) * v_pred

    def multiphase_pred(self, sample: jax.Array, v_pred: jax.Array,
                        index: jax.Array, multiphase: int) -> Tuple[jax.Array, jax.Array]:
        """Phased-consistency target: step to the start sigma of the current
        phase (reference euler_style_multiphase_pred,
        fm_solvers.py:896-936)."""
        k = len(self.sigmas)
        inference_indices = np.linspace(0, k, num=multiphase, endpoint=False)
        inference_indices = np.floor(inference_indices).astype(np.int64)
        idx_arr = jnp.asarray(inference_indices)
        # last phase boundary ≤ index
        expanded = jnp.broadcast_to(idx_arr[None, :], (index.shape[0], multiphase))
        valid = expanded <= index[:, None]
        last_valid = jnp.max(jnp.where(valid, expanded, -1), axis=1)
        sigma = jnp.asarray(self.sigmas)[index].reshape((-1,) + (1,) * (sample.ndim - 1))
        sigma_prev = jnp.asarray(self.sigmas)[jnp.maximum(last_valid, 0)]
        sigma_prev = jnp.where(last_valid.reshape(sigma.shape) >= 0,
                               sigma_prev.reshape(sigma.shape), 0.0)
        return sample + (sigma_prev - sigma) * v_pred, last_valid


def flow_match_discrete_timesteps(num_steps: int, shift: float = 7.0,
                                  num_train_timesteps: int = 1000,
                                  reverse: bool = True) -> np.ndarray:
    """FlowMatchDiscreteScheduler timestep ladder (reference
    hyvideo/schedulers/scheduling_flow_match_discrete.py): shift-warped
    discrete sigmas scaled to train-timestep units."""
    sigmas = np.linspace(1, 0, num_steps + 1, dtype=np.float32)
    if not reverse:
        sigmas = sigmas[::-1]
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    return sigmas[:-1] * num_train_timesteps
