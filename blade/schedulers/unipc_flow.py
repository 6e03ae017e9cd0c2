"""Flow-matching UniPC multistep scheduler (Wan2.1 family).

Functional rebuild of ``diffusers.UniPCMultistepScheduler`` configured as the
reference uses it (``wanx/train/inference.py:50``):
``prediction_type='flow_prediction', use_flow_sigmas=True, flow_shift=3.0``,
solver order 2, bh2, predict-x0, corrector on, lower-order final — plus the
flow conversions the Wan TDM trainer relies on
(``train_wanx_tdm.py:1421-1428``: sigma lookup by timestep,
``_sigma_to_alpha_sigma_t``, ``x0 = x_t - sigma_t * v``).

Flow path: ``x_t = (1 - sigma) x0 + sigma eps``; the model predicts the
velocity ``v = eps - x0``; ``lambda = log((1-sigma)/sigma)``.

The sampler is a pure step function over a small state pytree, designed to
run under ``lax.scan`` with static step indices supplied via scanned arrays.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FlowUniPCSchedule",
    "make_flow_unipc_schedule",
    "flow_training_sigmas",
    "flow_add_noise",
    "flow_pred_x0",
    "flow_pred_eps",
    "flow_renoise",
    "UniPCState",
    "unipc_init",
    "unipc_step",
    "euler_step",
]

_LAMBDA_CLAMP = 60.0  # expm1(-60) == -1 in f32; keeps terminal sigma=0 finite


def _shift_sigmas(sigmas: np.ndarray, shift: float) -> np.ndarray:
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


@dataclasses.dataclass(frozen=True)
class FlowUniPCSchedule:
    """Inference-time sigma grid (descending) with terminal zero appended."""

    num_steps: int
    sigmas: np.ndarray  # [N+1], sigmas[-1] == 0
    timesteps: np.ndarray  # [N] int64, = sigma * num_train_timesteps
    lambdas: np.ndarray  # [N+1] clamped log((1-s)/s)
    solver_order: int = 2
    lower_order_final: bool = True
    use_corrector: bool = True


def make_flow_unipc_schedule(
    num_inference_steps: int,
    *,
    num_train_timesteps: int = 1000,
    flow_shift: float = 3.0,
    solver_order: int = 2,
    lower_order_final: bool = True,
    use_corrector: bool = True,
) -> FlowUniPCSchedule:
    """diffusers ``use_flow_sigmas`` grid: ``alphas = linspace(1, 1/T, N+1)``,
    ``sigmas = flip(shifted(1 - alphas))[:-1]``, terminal 0 appended."""
    alphas = np.linspace(1.0, 1.0 / num_train_timesteps, num_inference_steps + 1)
    sigmas = 1.0 - alphas
    sigmas = np.flip(_shift_sigmas(sigmas, flow_shift))[:-1].copy()
    timesteps = (sigmas * num_train_timesteps).astype(np.int64)
    sigmas_full = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    with np.errstate(divide="ignore"):
        lambdas = np.log((1.0 - sigmas_full) / np.maximum(sigmas_full, 1e-30))
    lambdas = np.clip(lambdas, -_LAMBDA_CLAMP, _LAMBDA_CLAMP).astype(np.float32)
    return FlowUniPCSchedule(
        num_steps=num_inference_steps,
        sigmas=sigmas_full,
        timesteps=timesteps,
        lambdas=lambdas,
        solver_order=solver_order,
        lower_order_final=lower_order_final,
        use_corrector=use_corrector,
    )


def flow_training_sigmas(
    num_train_timesteps: int = 1000, flow_shift: float = 3.0
) -> np.ndarray:
    """Per-integer-timestep sigma table for TDM training.

    The reference calls ``scheduler.set_timesteps(1000)`` and looks sigmas up
    by (integer) timestep (``train_wanx_tdm.py:1011,1421``).  We provide the
    equivalent direct table: ``sigma_table[t]`` is the shifted sigma whose
    scaled value rounds to ``t`` — i.e. ``sigma(t) = shifted(t / T)`` (the
    shifted grid is exactly the image of the uniform grid, so nearest-index
    lookup reduces to evaluating the shift at t/T).
    """
    t = np.arange(num_train_timesteps, dtype=np.float64) / num_train_timesteps
    return _shift_sigmas(t, flow_shift).astype(np.float32)


def _sig(table, t, ndim):
    vals = jnp.asarray(table)[t]
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def flow_add_noise(sigma_table, x0, noise, t):
    """x_t = (1 - sigma_t) x0 + sigma_t noise."""
    s = _sig(sigma_table, t, x0.ndim)
    return (1.0 - s) * x0 + s * noise


def flow_pred_x0(sigma_table, v, x_t, t):
    """x0 = x_t - sigma_t v."""
    s = _sig(sigma_table, t, v.ndim)
    return x_t - s * v


def flow_pred_eps(sigma_table, x0, x_t, t):
    """eps = x0 + v = (x_t - (1-sigma) x0) / sigma."""
    s = _sig(sigma_table, t, x0.ndim)
    return (x_t - (1.0 - s) * x0) / jnp.maximum(s, 1e-6)


def flow_renoise(sigma_table, x_t1, noise, t1, t2):
    """Move to higher noise t2 > t1 without x0 (flow-matching analogue of the
    DDPM ``renoise``; reference ``train_wanx_tdm.py:1525-1545``)."""
    s1 = _sig(sigma_table, t1, x_t1.ndim)
    s2 = _sig(sigma_table, t2, x_t1.ndim)
    a1, a2 = 1.0 - s1, 1.0 - s2
    ratio = a2 / a1
    beta = jnp.sqrt(jnp.maximum(s2**2 - (ratio * s1) ** 2, 0.0))
    return ratio * x_t1 + beta * noise


# ---------------------------------------------------------------------------
# UniPC sampler (order <= 2, bh2, predict-x0)
# ---------------------------------------------------------------------------


class UniPCState(NamedTuple):
    x: jnp.ndarray  # current sample at sigma[i]
    m0: jnp.ndarray  # x0 prediction at step i-1
    m1: jnp.ndarray  # x0 prediction at step i-2
    last_x: jnp.ndarray  # sample at step i-1 (pre-predictor, for corrector)


def unipc_init(x: jnp.ndarray) -> UniPCState:
    z = jnp.zeros_like(x)
    return UniPCState(x=x, m0=z, m1=z, last_x=z)


def _bh2_coeffs(h):
    """Shared bh2 quantities: hh = -h (predict_x0), B_h = expm1(hh)."""
    hh = -h
    h_phi_1 = jnp.expm1(hh)
    b_h = h_phi_1  # bh2
    return hh, h_phi_1, b_h


def _uni_p(sched, x, m0, m1, i, use_order2):
    """Predictor: move x from sigma[i] to sigma[i+1]."""
    sig = jnp.asarray(sched.sigmas)
    lam = jnp.asarray(sched.lambdas)
    s0, st = sig[i], sig[i + 1]
    a_t = 1.0 - st
    h = lam[i + 1] - lam[i]
    hh, h_phi_1, b_h = _bh2_coeffs(h)
    x_t_ = (st / jnp.maximum(s0, 1e-30)) * x - a_t * h_phi_1 * m0
    # Order-2 term: D1 = (m1 - m0) / r1, r1 = (lambda[i-1] - lambda[i]) / h,
    # rho_p = 1/2 (diffusers closed form for order 2).
    i_prev = jnp.maximum(i - 1, 0)
    r1 = (lam[i_prev] - lam[i]) / h
    r1_safe = jnp.where(use_order2, r1, 1.0)
    d1 = (m1 - m0) / jnp.where(r1_safe == 0, 1.0, r1_safe)
    pred_res = jnp.where(use_order2, 0.5 * d1, jnp.zeros_like(d1))
    return x_t_ - a_t * b_h * pred_res


def _uni_c(sched, last_x, m0, m1, m_t, i, use_order2):
    """Corrector: recompute the sample at sigma[i] from last_x at sigma[i-1]
    using the fresh model output m_t at sigma[i]."""
    sig = jnp.asarray(sched.sigmas)
    lam = jnp.asarray(sched.lambdas)
    i_prev = jnp.maximum(i - 1, 0)
    s0, st = sig[i_prev], sig[i]
    a_t = 1.0 - st
    h = lam[i] - lam[i_prev]
    hh, h_phi_1, b_h = _bh2_coeffs(h)
    x_t_ = (st / jnp.maximum(s0, 1e-30)) * last_x - a_t * h_phi_1 * m0
    d1_t = m_t - m0

    # Order-1 corrector: rho_c = [1/2].
    x_c1 = x_t_ - a_t * b_h * (0.5 * d1_t)

    # Order-2 corrector: rks = [r1, 1]; solve [[1,1],[r1,1]] rho = b.
    i_pp = jnp.maximum(i - 2, 0)
    r1 = (lam[i_pp] - lam[i_prev]) / h
    r1_safe = jnp.where(use_order2, r1, 2.0)
    d1_0 = (m1 - m0) / jnp.where(r1_safe == 0, 1.0, r1_safe)
    b1 = (h_phi_1 / hh - 1.0) / b_h
    h_phi_2 = h_phi_1 / hh - 1.0
    b2 = (h_phi_2 / hh - 0.5) * 2.0 / b_h
    det = 1.0 - r1_safe
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    rho0 = (b1 - b2) / det
    rho1 = (b2 - r1_safe * b1) / det
    x_c2 = x_t_ - a_t * b_h * (rho0 * d1_0 + rho1 * d1_t)

    return jnp.where(use_order2, x_c2, x_c1)


def unipc_step(sched: FlowUniPCSchedule, state: UniPCState, v_pred, i):
    """One UniPC step: corrector at sigma[i], predictor to sigma[i+1].

    ``v_pred`` is the model velocity at ``(state.x, timesteps[i])``.
    Returns the new state; ``state.x`` after the final step is x0.
    """
    sig = jnp.asarray(sched.sigmas)
    n = sched.num_steps
    x0_i = state.x - sig[i] * v_pred  # convert to x0-prediction

    if sched.use_corrector:
        # Corrector order == previous step's predictor order (order-2 needs
        # history from step i-2, so it engages from i >= 2).
        use_c2 = (i >= 2) & (jnp.asarray(sched.solver_order) >= 2)
        corrected = _uni_c(sched, state.last_x, state.m0, state.m1, x0_i, i, use_c2)
        x_i = jnp.where(i > 0, corrected, state.x)
    else:
        x_i = state.x

    # Predictor order: warm up over the first steps, drop to 1 at the end.
    use_p2 = (i >= 1) & (jnp.asarray(sched.solver_order) >= 2)
    if sched.lower_order_final:
        use_p2 = use_p2 & (i < n - 1)
    x_next = _uni_p(sched, x_i, x0_i, state.m0, i, use_p2)

    return UniPCState(x=x_next, m0=x0_i, m1=state.m0, last_x=x_i)


def euler_step(sched: FlowUniPCSchedule, x, v_pred, i):
    """Rectified-flow Euler baseline: dx/dsigma = v."""
    sig = jnp.asarray(sched.sigmas)
    return x + (sig[i + 1] - sig[i]) * v_pred
