"""FlowMatchEulerDiscrete scheduler — Flux.1-dev's rectified-flow schedule.

Reproduces the numerics the reference's overlay Flux img2img pipeline uses
(reference: feature/diffusers/pipelines/flux/pipeline_flux_img2img.py —
retrieve_timesteps with dynamic shifting, ``scale_noise`` for img2img noise
injection, early-``return`` after the first denoise step at :841).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FlowMatchConfig:
    num_train_timesteps: int = 1000
    shift: float = 3.0
    use_dynamic_shifting: bool = True
    base_shift: float = 0.5
    max_shift: float = 1.15
    base_image_seq_len: int = 256
    max_image_seq_len: int = 4096


def calculate_shift(image_seq_len: int, cfg: FlowMatchConfig) -> float:
    """Flux's resolution-dependent schedule shift (mu)."""
    m = (cfg.max_shift - cfg.base_shift) / (cfg.max_image_seq_len - cfg.base_image_seq_len)
    b = cfg.base_shift - m * cfg.base_image_seq_len
    return image_seq_len * m + b


@dataclasses.dataclass
class FlowMatchState:
    num_inference_steps: int
    timesteps: np.ndarray  # descending, = sigma * 1000
    sigmas: np.ndarray     # descending, with terminal 0 appended


class FlowMatchEulerDiscreteScheduler:
    order = 1
    init_noise_sigma = 1.0  # pure noise at sigma_max = 1 (rectified flow)

    def __init__(self, config: FlowMatchConfig = FlowMatchConfig()):
        self.config = config

    def set_timesteps(self, num_inference_steps: int, mu: float = None,
                      sigmas: np.ndarray = None) -> FlowMatchState:
        n = self.config.num_train_timesteps
        if sigmas is None:
            sigmas = np.linspace(1.0, 1.0 / n, num_inference_steps)
        if self.config.use_dynamic_shifting:
            if mu is None:
                mu = 1.0  # caller should pass calculate_shift(...)
            sigmas = np.exp(mu) / (np.exp(mu) + (1 / sigmas - 1))
        else:
            s = self.config.shift
            sigmas = s * sigmas / (1 + (s - 1) * sigmas)
        timesteps = sigmas * n
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return FlowMatchState(num_inference_steps, timesteps.astype(np.float32), sigmas)

    def get_timesteps(self, state: FlowMatchState, num_inference_steps: int,
                      strength: float) -> Tuple[np.ndarray, int]:
        init_timestep = min(num_inference_steps * strength, num_inference_steps)
        t_start = int(max(num_inference_steps - init_timestep, 0))
        return state.timesteps[t_start * self.order:], num_inference_steps - t_start

    def _index(self, state: FlowMatchState, timestep) -> int:
        return int(np.nonzero(np.isclose(state.timesteps, float(timestep)))[0][0])

    def scale_noise(self, state: FlowMatchState, sample, noise, timestep):
        """img2img noise injection: x_t = (1-σ)·x0 + σ·ε."""
        sigma = float(state.sigmas[self._index(state, timestep)])
        return (
            jnp.asarray(1.0 - sigma, sample.dtype) * sample
            + jnp.asarray(sigma, sample.dtype) * noise
        )

    add_noise = scale_noise

    def scale_model_input(self, state: FlowMatchState, sample, timestep):
        return sample

    def step(self, state: FlowMatchState, model_output, timestep, sample):
        i = self._index(state, timestep)
        sigma, sigma_next = float(state.sigmas[i]), float(state.sigmas[i + 1])
        prev = sample + jnp.asarray(sigma_next - sigma, sample.dtype) * model_output
        return prev, state

    # ------- lax.scan support (facade._get_sample_fn generation loop) -------
    # The Euler rectified-flow update is position-indexed only: each step
    # needs just (timestep, sigma_next - sigma), so the whole denoise loop
    # rides one scan body like the diffusion-family schedulers
    # (schedulers/diffusion.py scan_plan protocol).

    def scan_plan(self, state: FlowMatchState, timesteps=None) -> dict:
        ts = np.asarray(state.timesteps if timesteps is None else timesteps,
                        np.float32)
        n = len(ts)
        sig = np.asarray(state.sigmas, np.float32)
        # a consecutive trailing subset (the scan-plan protocol's contract,
        # schedulers/diffusion.py) must pick the deltas at ITS position in
        # the ladder, exactly as step()'s per-timestep index lookup would
        start = 0 if timesteps is None else self._index(state, float(ts[0]))
        return {'timestep': ts,
                'dsigma': sig[start + 1:start + n + 1] - sig[start:start + n]}

    def scan_step(self, row, model_output, sample, noise=None, extra=None):
        prev = sample + row['dsigma'].astype(sample.dtype) * model_output
        return prev, None

    def scan_carry_init(self, latents):
        return None
