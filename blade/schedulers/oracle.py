"""In-repo numerical oracles: stateful numpy transcriptions of the two
diffusers schedulers the reference drives its samplers with.

diffusers cannot be installed in this environment (zero egress), so the
"golden vector" parity target (SURVEY §7 build step 1; the reference uses
``UniPCMultistepScheduler`` at ``wanx/train/inference.py:50`` and
``CogVideoXDPMScheduler`` at ``cogvideox/train/inference.py:64-66``) is
realized by transcribing the *algorithms* — list-of-model-outputs state,
order warm-up, corrector gating, ``final_alpha_cumprod`` handling — into
plain numpy here, structured like the originals so they can be re-audited
line-by-line against diffusers.  ``tests/test_scheduler_oracle.py`` asserts
step-for-step agreement between the jit-friendly samplers in
``unipc_flow.py`` / ``cogvideox_dpm.py`` and these oracles, plus frozen
golden vectors that fail on any epsilon change.

These classes are test oracles: python loops, python state, no jit.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

__all__ = ["UniPCFlowOracle", "CogVideoXDPMOracle"]


class UniPCFlowOracle:
    """UniPCMultistepScheduler(prediction_type='flow_prediction',
    use_flow_sigmas=True, solver_order=2, solver_type='bh2',
    predict_x0=True, lower_order_final=True) — numpy transcription."""

    def __init__(self, num_inference_steps: int, *,
                 num_train_timesteps: int = 1000, flow_shift: float = 3.0,
                 solver_order: int = 2, lower_order_final: bool = True,
                 use_corrector: bool = True):
        self.solver_order = solver_order
        self.lower_order_final = lower_order_final
        self.use_corrector = use_corrector
        # set_timesteps (use_flow_sigmas branch)
        alphas = np.linspace(1.0, 1.0 / num_train_timesteps,
                             num_inference_steps + 1)
        sigmas = 1.0 - alphas
        sigmas = np.flip(
            flow_shift * sigmas / (1 + (flow_shift - 1) * sigmas)
        )[:-1].copy()
        self.timesteps = (sigmas * num_train_timesteps).astype(np.int64)
        self.sigmas = np.concatenate([sigmas, [0.0]])
        self.num_inference_steps = num_inference_steps
        # runtime state
        self.model_outputs: List[Optional[np.ndarray]] = \
            [None] * solver_order
        self.lower_order_nums = 0
        self.last_sample: Optional[np.ndarray] = None
        self.this_order = 1
        self.step_index = 0

    # _sigma_to_alpha_sigma_t for flow sigmas: alpha = 1 - sigma.
    @staticmethod
    def _alpha_sigma(sigma):
        return 1.0 - sigma, sigma

    def _lambda(self, sigma):
        alpha_t, sigma_t = self._alpha_sigma(sigma)
        return np.log(np.maximum(alpha_t, 1e-30)) - \
            np.log(np.maximum(sigma_t, 1e-30))

    def convert_model_output(self, model_output, sample):
        """flow_prediction + predict_x0: x0 = sample - sigma_t * v."""
        sigma_t = self.sigmas[self.step_index]
        return sample - sigma_t * model_output

    def multistep_uni_p_bh_update(self, sample, order):
        m0 = self.model_outputs[-1]
        s0, t = self.step_index, self.step_index + 1
        sigma_t, sigma_s0 = self.sigmas[t], self.sigmas[s0]
        alpha_t, sigma_t_ = self._alpha_sigma(sigma_t)
        lambda_t = self._lambda(sigma_t)
        lambda_s0 = self._lambda(sigma_s0)
        h = lambda_t - lambda_s0

        rks, d1s = [], []
        for i in range(1, order):
            si = self.step_index - i
            mi = self.model_outputs[-(i + 1)]
            lambda_si = self._lambda(self.sigmas[si])
            rk = (lambda_si - lambda_s0) / h
            rks.append(rk)
            d1s.append((mi - m0) / rk)
        rks.append(1.0)
        rks = np.array(rks)

        hh = -h  # predict_x0
        h_phi_1 = np.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1
        b_h = h_phi_1  # bh2
        r_rows, b = [], []
        factorial_i = 1.0
        for i in range(1, order + 1):
            r_rows.append(np.power(rks, i - 1))
            b.append(h_phi_k * factorial_i / b_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1 / factorial_i
        r_mat = np.array(r_rows)
        b = np.array(b)

        x_t_ = (sigma_t_ / sigma_s0) * sample - alpha_t * h_phi_1 * m0
        if d1s:
            if order == 2:
                rhos_p = np.array([0.5])
            else:
                rhos_p = np.linalg.solve(r_mat[:-1, :-1], b[:-1])
            pred_res = sum(r * d for r, d in zip(rhos_p, d1s))
            return x_t_ - alpha_t * b_h * pred_res
        return x_t_

    def multistep_uni_c_bh_update(self, this_model_output, last_sample,
                                  this_sample, order):
        m0 = self.model_outputs[-1]
        model_t = this_model_output
        sigma_t = self.sigmas[self.step_index]
        sigma_s0 = self.sigmas[self.step_index - 1]
        alpha_t, sigma_t_ = self._alpha_sigma(sigma_t)
        lambda_t = self._lambda(sigma_t)
        lambda_s0 = self._lambda(sigma_s0)
        h = lambda_t - lambda_s0

        rks, d1s = [], []
        for i in range(1, order):
            si = self.step_index - (i + 1)
            mi = self.model_outputs[-(i + 1)]
            lambda_si = self._lambda(self.sigmas[si])
            rk = (lambda_si - lambda_s0) / h
            rks.append(rk)
            d1s.append((mi - m0) / rk)
        rks.append(1.0)
        rks = np.array(rks)

        hh = -h
        h_phi_1 = np.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1
        b_h = h_phi_1
        r_rows, b = [], []
        factorial_i = 1.0
        for i in range(1, order + 1):
            r_rows.append(np.power(rks, i - 1))
            b.append(h_phi_k * factorial_i / b_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1 / factorial_i
        r_mat = np.array(r_rows)
        b = np.array(b)

        if order == 1:
            rhos_c = np.array([0.5])
        else:
            rhos_c = np.linalg.solve(r_mat, b)

        x_t_ = (sigma_t_ / sigma_s0) * last_sample - alpha_t * h_phi_1 * m0
        if d1s:
            corr_res = sum(r * d for r, d in zip(rhos_c[:-1], d1s))
        else:
            corr_res = 0.0
        d1_t = model_t - m0
        return x_t_ - alpha_t * b_h * (corr_res + rhos_c[-1] * d1_t)

    def step(self, model_output: np.ndarray, sample: np.ndarray):
        """One scheduler.step call; advances internal state, returns the
        previous (less noisy) sample."""
        use_corrector = (
            self.use_corrector and self.step_index > 0
            and self.last_sample is not None
        )
        model_output_convert = self.convert_model_output(model_output, sample)
        if use_corrector:
            sample = self.multistep_uni_c_bh_update(
                this_model_output=model_output_convert,
                last_sample=self.last_sample,
                this_sample=sample,
                order=self.this_order,
            )
        for i in range(self.solver_order - 1):
            self.model_outputs[i] = self.model_outputs[i + 1]
        self.model_outputs[-1] = model_output_convert

        if self.lower_order_final:
            this_order = min(
                self.solver_order,
                len(self.timesteps) - self.step_index,
            )
        else:
            this_order = self.solver_order
        self.this_order = min(this_order, self.lower_order_nums + 1)
        self.last_sample = sample
        prev_sample = self.multistep_uni_p_bh_update(
            sample=sample, order=self.this_order
        )
        self.lower_order_nums = min(self.lower_order_nums + 1,
                                    self.solver_order)
        self.step_index += 1
        return prev_sample


class CogVideoXDPMOracle:
    """CogVideoXDPMScheduler (SDE-DPM-Solver++(2M), v-prediction,
    trailing spacing, set_alpha_to_one) — numpy transcription.

    The noise is an explicit argument (the torch original draws it from a
    generator inside ``step``)."""

    def __init__(self, alphas_cumprod: np.ndarray,
                 num_inference_steps: int, *,
                 final_alpha_cumprod: float = 1.0):
        self.alphas_cumprod = np.asarray(alphas_cumprod, np.float64)
        t = len(self.alphas_cumprod)
        self.num_train_timesteps = t
        self.num_inference_steps = num_inference_steps
        step = t / num_inference_steps
        ts = np.round(np.arange(t, 0, -step)).astype(np.int64) - 1
        self.timesteps = ts[:num_inference_steps]
        self.final_alpha_cumprod = final_alpha_cumprod

    @staticmethod
    def _lamb(alpha_prod):
        return np.log(np.sqrt(
            np.maximum(alpha_prod, 1e-60) / np.maximum(1 - alpha_prod, 1e-60)
        ))

    def get_variables(self, alpha_prod_t, alpha_prod_t_prev,
                      alpha_prod_t_back=None):
        lamb = self._lamb(alpha_prod_t)
        lamb_next = self._lamb(alpha_prod_t_prev)
        h = lamb_next - lamb
        if alpha_prod_t_back is not None:
            lamb_previous = self._lamb(alpha_prod_t_back)
            h_last = lamb - lamb_previous
            r = h_last / h
            return h, r, lamb, lamb_next
        return h, None, lamb, lamb_next

    def get_mult(self, h, r, alpha_prod_t, alpha_prod_t_prev,
                 alpha_prod_t_back):
        mult1 = np.sqrt((1 - alpha_prod_t_prev) / (1 - alpha_prod_t)) \
            * np.exp(-h)
        mult2 = np.expm1(-2 * h) * np.sqrt(alpha_prod_t_prev)
        if alpha_prod_t_back is not None:
            mult3 = 1 + 1 / (2 * r)
            mult4 = 1 / (2 * r)
            return mult1, mult2, mult3, mult4
        return mult1, mult2

    def step(self, model_output, old_pred_original_sample, timestep,
             timestep_back, sample, noise):
        prev_timestep = timestep - \
            self.num_train_timesteps // self.num_inference_steps
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (
            self.alphas_cumprod[prev_timestep] if prev_timestep >= 0
            else self.final_alpha_cumprod
        )
        alpha_prod_t_back = (
            self.alphas_cumprod[timestep_back]
            if timestep_back is not None else None
        )
        beta_prod_t = 1 - alpha_prod_t
        # v_prediction
        pred_original_sample = (alpha_prod_t ** 0.5) * sample \
            - (beta_prod_t ** 0.5) * model_output

        h, r, _, _ = self.get_variables(
            alpha_prod_t, alpha_prod_t_prev, alpha_prod_t_back)
        mult = list(self.get_mult(
            h, r, alpha_prod_t, alpha_prod_t_prev, alpha_prod_t_back))
        mult_noise = (1 - alpha_prod_t_prev) ** 0.5 \
            * (1 - np.exp(-2 * h)) ** 0.5

        prev_sample = mult[0] * sample - mult[1] * pred_original_sample \
            + mult_noise * noise
        if old_pred_original_sample is None or prev_timestep < 0:
            return prev_sample, pred_original_sample

        denoised_d = mult[2] * pred_original_sample \
            - mult[3] * old_pred_original_sample
        x_advanced = mult[0] * sample - mult[1] * denoised_d \
            + mult_noise * noise
        return x_advanced, pred_original_sample
