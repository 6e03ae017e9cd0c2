"""DDPM noise tables + v-prediction conversions (CogVideoX family).

Functional rebuild of the scheduler math the reference pulls from
``diffusers.CogVideoXDDIMScheduler`` / ``CogVideoXDPMScheduler`` and of the
conversion helpers hand-rolled inside the TDM trainer
(``train_cogvideo_tdm.py``: ``extract_into_tensor``, the ``get_velocity``
x0-recovery trick at :1431, ``Predictor.add_noise`` at :1515-1523).

All functions are pure: a :class:`DDPMSchedule` carries the precomputed
tables; timesteps are integer arrays so everything scans/vmap/jits cleanly.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = [
    "DDPMSchedule",
    "make_ddpm_schedule",
    "add_noise",
    "pred_x0_from_v",
    "pred_eps_from_x0",
    "velocity_from_x0_eps",
    "renoise",
    "ddim_step_to",
    "trailing_timesteps",
]


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Precomputed diffusion tables (float32 numpy; moved on use)."""

    num_train_timesteps: int
    alphas_cumprod: np.ndarray  # [T]
    alpha: np.ndarray  # sqrt(alphas_cumprod)
    sigma: np.ndarray  # sqrt(1 - alphas_cumprod)


def make_ddpm_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    snr_shift_scale: float = 1.0,
    rescale_betas_zero_snr: bool = True,
) -> DDPMSchedule:
    """CogVideoX defaults: scaled-linear betas, optional SNR shift and
    zero-terminal-SNR rescale (Lin et al. 2023), matching the HF model
    configs the reference loads (5B: rescale on; 2B: snr_shift_scale=3)."""
    if beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps)
    else:
        raise ValueError(beta_schedule)
    alphas_cumprod = np.cumprod(1.0 - betas)

    if snr_shift_scale != 1.0:
        alphas_cumprod = alphas_cumprod / (
            snr_shift_scale + (1 - snr_shift_scale) * alphas_cumprod
        )

    if rescale_betas_zero_snr:
        ab_sqrt = np.sqrt(alphas_cumprod)
        a0, aT = ab_sqrt[0], ab_sqrt[-1]
        ab_sqrt = (ab_sqrt - aT) * a0 / (a0 - aT)
        alphas_cumprod = ab_sqrt**2
        # Terminal step has exactly zero SNR; clamp for numerical safety in
        # divisions (the trainer's 1/(1-acp) weights etc.).
        alphas_cumprod = np.clip(alphas_cumprod, 1e-12, 1.0)

    alphas_cumprod = alphas_cumprod.astype(np.float32)
    return DDPMSchedule(
        num_train_timesteps=num_train_timesteps,
        alphas_cumprod=alphas_cumprod,
        alpha=np.sqrt(alphas_cumprod).astype(np.float32),
        sigma=np.sqrt(1.0 - alphas_cumprod).astype(np.float32),
    )


def _gather(table: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """table[t] broadcast to an ``ndim``-dimensional sample (t: [B])."""
    vals = jnp.asarray(table)[t]
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def add_noise(sched: DDPMSchedule, x0, noise, t):
    """x_t = alpha_t x0 + sigma_t noise."""
    a = _gather(sched.alpha, t, x0.ndim)
    s = _gather(sched.sigma, t, x0.ndim)
    return a * x0 + s * noise


def pred_x0_from_v(sched: DDPMSchedule, v, x_t, t):
    """x0 = alpha_t x_t - sigma_t v (the reference's ``get_velocity`` abuse:
    it passes (v_pred, noisy, t) to recover x0, ``train_cogvideo_tdm.py:1431``)."""
    a = _gather(sched.alpha, t, v.ndim)
    s = _gather(sched.sigma, t, v.ndim)
    return a * x_t - s * v


def pred_eps_from_x0(sched: DDPMSchedule, x0, x_t, t):
    """eps = (x_t - alpha_t x0) / sigma_t."""
    a = _gather(sched.alpha, t, x0.ndim)
    s = _gather(sched.sigma, t, x0.ndim)
    return (x_t - a * x0) / s


def velocity_from_x0_eps(sched: DDPMSchedule, x0, eps, t):
    """v = alpha_t eps - sigma_t x0 (the honest get_velocity)."""
    a = _gather(sched.alpha, t, x0.ndim)
    s = _gather(sched.sigma, t, x0.ndim)
    return a * eps - s * x0


def renoise(sched: DDPMSchedule, x_t1, noise, t1, t2):
    """Move a noisy sample from t1 to a *higher-noise* t2 (> t1) without
    knowing x0: x_t2 = x_t1 * a2/a1 + sqrt(s2^2 - (a2/a1 s1)^2) * noise
    (reference ``Predictor.add_noise``, ``train_cogvideo_tdm.py:1515-1523``)."""
    a1 = _gather(sched.alpha, t1, x_t1.ndim)
    a2 = _gather(sched.alpha, t2, x_t1.ndim)
    s1 = _gather(sched.sigma, t1, x_t1.ndim)
    s2 = _gather(sched.sigma, t2, x_t1.ndim)
    ratio = a2 / a1
    beta = jnp.sqrt(jnp.maximum(s2**2 - (ratio * s1) ** 2, 0.0))
    return ratio * x_t1 + beta * noise


def ddim_step_to(sched: DDPMSchedule, x0, eps, t_next):
    """Deterministic DDIM jump: x_{t_next} = alpha x0 + sigma eps.

    The reference's K-step trajectory simulator re-noises with a stochastic
    eps mix (``eta * eps_hat + sqrt(1-eta^2) * xi``) and calls ``add_noise``
    — identical to this with the mixed eps (``generate_new``,
    ``train_cogvideo_tdm.py:1443-1445``)."""
    return add_noise(sched, x0, eps, t_next)


def trailing_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """"trailing" spacing: [T-1, T-1-T/N, ...] (diffusers semantics used by
    ``CogVideoXDPMScheduler(timestep_spacing='trailing')``)."""
    step = num_train_timesteps / num_inference_steps
    ts = np.round(np.arange(num_train_timesteps, 0, -step)).astype(np.int64) - 1
    return ts[:num_inference_steps]
