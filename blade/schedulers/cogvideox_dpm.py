"""CogVideoX inference sampler: DPM-Solver++(2M) over the v-pred DDPM tables.

Capability parity with ``diffusers.CogVideoXDPMScheduler(timestep_spacing=
'trailing')`` as used by the reference inference CLI
(``cogvideox/train/inference.py:64-66``): a second-order multistep solver on
the snr-shifted / zero-terminal-SNR alpha tables, plus the stochastic DDIM
step the TDM trainer's trajectory simulator uses (``generate_new``,
``train_cogvideo_tdm.py:1415-1449``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from blade.schedulers.ddpm import DDPMSchedule, trailing_timesteps

__all__ = ["DPMSchedule", "make_dpm_schedule", "DPMState", "dpm_init", "dpm_step"]

_LAMBDA_CLAMP = 60.0


@dataclasses.dataclass(frozen=True)
class DPMSchedule:
    """Inference-time grid over a base DDPM table (trailing spacing)."""

    num_steps: int
    timesteps: np.ndarray  # [N] int64, descending
    alpha: np.ndarray  # [N+1]: alpha at each step + terminal 1.0
    sigma: np.ndarray  # [N+1]: sigma at each step + terminal 0.0
    lambdas: np.ndarray  # [N+1] clamped log(alpha/sigma)


def make_dpm_schedule(base: DDPMSchedule, num_inference_steps: int) -> DPMSchedule:
    ts = trailing_timesteps(base.num_train_timesteps, num_inference_steps)
    alpha = np.concatenate([base.alpha[ts], [1.0]]).astype(np.float32)
    sigma = np.concatenate([base.sigma[ts], [0.0]]).astype(np.float32)
    lam = np.log(np.maximum(alpha, 1e-30) / np.maximum(sigma, 1e-30))
    lam = np.clip(lam, -_LAMBDA_CLAMP, _LAMBDA_CLAMP).astype(np.float32)
    return DPMSchedule(
        num_steps=num_inference_steps, timesteps=ts, alpha=alpha, sigma=sigma,
        lambdas=lam,
    )


class DPMState(NamedTuple):
    x: jnp.ndarray
    m0: jnp.ndarray  # previous x0 prediction


def dpm_init(x: jnp.ndarray) -> DPMState:
    return DPMState(x=x, m0=jnp.zeros_like(x))


def dpm_step(sched: DPMSchedule, state: DPMState, v_pred, i, noise=None):
    """SDE-DPM-Solver++(2M) step i -> i+1 (CogVideoXDPMScheduler parity).

    The diffusers CogVideoX scheduler is the *stochastic* DPM++ variant:

      mult1      = (sigma_next / sigma_i) * exp(-h)
      mult2      = expm1(-2h) * alpha_next            (negative)
      mult_noise = sigma_next * sqrt(1 - exp(-2h))
      x_next     = mult1 * x - mult2 * D + mult_noise * xi

    where D is the x0 prediction at step i (first order), or the 2M
    extrapolation ``(1 + 1/(2r)) x0 - (1/(2r)) m0`` with ``r = h_last / h``
    (second order; used for 0 < i < N-1 — the final step drops to first
    order because its previous train-timestep index is negative, matching
    ``scheduling_dpm_cogvideox`` exactly).  ``noise=None`` runs the
    deterministic (zero-noise) variant.
    """
    a = jnp.asarray(sched.alpha)
    s = jnp.asarray(sched.sigma)
    lam = jnp.asarray(sched.lambdas)
    x = state.x
    # v -> x0 at the current grid point.
    x0 = a[i] * x - s[i] * v_pred

    h = lam[i + 1] - lam[i]
    i_prev = jnp.maximum(i - 1, 0)
    h_last = lam[i] - lam[i_prev]
    r = h_last / jnp.where(h == 0, 1.0, h)
    r_safe = jnp.where(i > 0, r, 1.0)
    second = (i > 0) & (i < sched.num_steps - 1)
    d = jnp.where(
        second,
        (1.0 + 1.0 / (2.0 * r_safe)) * x0 - (1.0 / (2.0 * r_safe)) * state.m0,
        x0,
    )
    exp_h = jnp.exp(-h)
    mult1 = (s[i + 1] / jnp.maximum(s[i], 1e-30)) * exp_h
    mult2 = jnp.expm1(-2.0 * h) * a[i + 1]
    mult_noise = s[i + 1] * jnp.sqrt(jnp.maximum(1.0 - exp_h * exp_h, 0.0))
    x_next = mult1 * x - mult2 * d
    if noise is not None:
        x_next = x_next + mult_noise * noise
    return DPMState(x=x_next, m0=x0)
