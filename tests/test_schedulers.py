"""Scheduler numerics tests: table invariants, conversion round trips, and
ODE-integration accuracy of the samplers (known velocity fields)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blade.schedulers import ddpm as D
from blade.schedulers import unipc_flow as F
from blade.schedulers.cogvideox_dpm import dpm_init, dpm_step, make_dpm_schedule


# --------------------------------------------------------------------- DDPM


def test_zero_terminal_snr():
    sched = D.make_ddpm_schedule(rescale_betas_zero_snr=True)
    assert sched.alphas_cumprod[-1] < 1e-6
    assert sched.alphas_cumprod[0] > 0.99

def test_snr_shift_monotone():
    s1 = D.make_ddpm_schedule(snr_shift_scale=1.0, rescale_betas_zero_snr=False)
    s3 = D.make_ddpm_schedule(snr_shift_scale=3.0, rescale_betas_zero_snr=False)
    # SNR shift (scale>1) lowers alphas_cumprod (more noise at same t).
    assert (s3.alphas_cumprod < s1.alphas_cumprod + 1e-9).all()
    assert (np.diff(s1.alphas_cumprod) < 0).all()


def test_v_roundtrip():
    sched = D.make_ddpm_schedule()
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4))
    t = jnp.array([100, 800])
    x_t = D.add_noise(sched, x0, eps, t)
    v = D.velocity_from_x0_eps(sched, x0, eps, t)
    x0_rec = D.pred_x0_from_v(sched, v, x_t, t)
    eps_rec = D.pred_eps_from_x0(sched, x0_rec, x_t, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps), atol=1e-4)


def test_renoise_matches_add_noise_deterministic():
    sched = D.make_ddpm_schedule()
    x0 = jnp.ones((1, 3))
    t1 = jnp.array([200])
    t2 = jnp.array([600])
    x_t1 = D.add_noise(sched, x0, jnp.zeros_like(x0), t1)
    x_t2 = D.renoise(sched, x_t1, jnp.zeros_like(x0), t1, t2)
    expect = D.add_noise(sched, x0, jnp.zeros_like(x0), t2)
    np.testing.assert_allclose(np.asarray(x_t2), np.asarray(expect), atol=1e-6)


def test_renoise_variance_is_correct():
    """renoise(x_t1, xi) must produce marginal Var = sigma_t2^2 when x_t1 was
    produced with unit-variance noise: a2/a1*s1 and beta are orthogonal."""
    sched = D.make_ddpm_schedule(rescale_betas_zero_snr=False)
    t1, t2 = jnp.array([300]), jnp.array([700])
    a1, s1 = sched.alpha[300], sched.sigma[300]
    a2, s2 = sched.alpha[700], sched.sigma[700]
    ratio = a2 / a1
    beta_sq = s2**2 - (ratio * s1) ** 2
    var = (ratio * s1) ** 2 + beta_sq
    np.testing.assert_allclose(var, s2**2, rtol=1e-6)


def test_trailing_timesteps():
    ts = D.trailing_timesteps(1000, 8)
    assert ts[0] == 999
    assert len(ts) == 8
    assert (np.diff(ts) == -125).all()


# --------------------------------------------------------------------- Flow


def test_flow_schedule_grid():
    sched = F.make_flow_unipc_schedule(8, flow_shift=3.0)
    assert sched.sigmas[0] > 0.99  # near-1 start
    assert sched.sigmas[-1] == 0.0
    assert (np.diff(sched.sigmas) < 0).all()
    assert len(sched.timesteps) == 8
    # shift pushes sigma mass up: midpoint sigma > unshifted midpoint
    unshifted = F.make_flow_unipc_schedule(8, flow_shift=1.0)
    assert sched.sigmas[4] > unshifted.sigmas[4]


def test_flow_conversions_roundtrip():
    table = F.flow_training_sigmas(1000, flow_shift=3.0)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 5))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 5))
    t = jnp.array([123, 857])
    x_t = F.flow_add_noise(table, x0, eps, t)
    v = eps - x0
    np.testing.assert_allclose(
        np.asarray(F.flow_pred_x0(table, v, x_t, t)), np.asarray(x0), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(F.flow_pred_eps(table, x0, x_t, t)), np.asarray(eps), atol=1e-4
    )


def _run_sampler(sched, velocity_fn, x1, method):
    if method == "unipc":
        state = F.unipc_init(x1)
        for i in range(sched.num_steps):
            sigma = sched.sigmas[i]
            v = velocity_fn(state.x, sigma)
            state = F.unipc_step(sched, state, v, jnp.asarray(i))
        return state.x
    x = x1
    for i in range(sched.num_steps):
        v = velocity_fn(x, sched.sigmas[i])
        x = F.euler_step(sched, x, v, jnp.asarray(i))
    return x


def test_unipc_exact_on_constant_velocity():
    """dx/dsigma = c  =>  x(0) = x(1) - c; any consistent solver is exact."""
    sched = F.make_flow_unipc_schedule(4, flow_shift=3.0)
    c = jnp.array([1.7, -0.3])
    x1 = jnp.array([0.5, 2.0])
    out = _run_sampler(sched, lambda x, s: c, x1, "unipc")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x1 - c), rtol=2e-3, atol=2e-3)


def test_unipc_beats_euler_on_curved_field():
    """v = 2 sigma c  =>  x(0) = x(1) - c.  Order-2 UniPC should integrate the
    linear-in-sigma field much better than Euler at the same step count."""
    c = jnp.array([1.0])
    x1 = jnp.array([0.0])
    target = x1 - c
    sched = F.make_flow_unipc_schedule(8, flow_shift=1.0)
    vf = lambda x, s: 2 * s * c
    err_unipc = abs(float(_run_sampler(sched, vf, x1, "unipc")[0] - target[0]))
    err_euler = abs(float(_run_sampler(sched, vf, x1, "euler")[0] - target[0]))
    assert err_unipc < err_euler * 0.35, (err_unipc, err_euler)
    assert err_unipc < 5e-3


def test_unipc_perfect_linear_model_recovers_x0():
    """If the model is exact for a flow between fixed x0 and eps, the sampler
    must land on x0 from x1 = eps."""
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.normal(rng, (4, 8))
    eps = jax.random.normal(jax.random.PRNGKey(3), (4, 8))
    v_true = eps - x0  # constant along the linear path
    sched = F.make_flow_unipc_schedule(8, flow_shift=3.0)
    out = _run_sampler(sched, lambda x, s: v_true, eps, "unipc")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------- DPM (cog)


def test_dpm_perfect_model_recovers_x0():
    """A model whose x0-prediction is exact at every state must make the
    SDE-DPM++ sampler land exactly on x0 (the terminal step collapses to
    the x0 prediction; intermediate noise injections cancel)."""
    base = D.make_ddpm_schedule()
    sched = make_dpm_schedule(base, 8)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (3, 6))
    rng = jax.random.PRNGKey(6)

    def v_at(x, i):
        # v such that pred_x0(v, x, t) == x0: v = (a x - x0) / s.
        a, s = sched.alpha[i], sched.sigma[i]
        return (a * x - x0) / s

    state = dpm_init(jax.random.normal(jax.random.PRNGKey(5), (3, 6)))
    for i in range(sched.num_steps):
        xi = jax.random.normal(jax.random.fold_in(rng, i), x0.shape)
        state = dpm_step(sched, state, v_at(state.x, i), jnp.asarray(i), xi)
    np.testing.assert_allclose(np.asarray(state.x), np.asarray(x0),
                               rtol=2e-3, atol=2e-3)


def test_dpm_schedule_terminal():
    base = D.make_ddpm_schedule()
    sched = make_dpm_schedule(base, 8)
    assert sched.sigma[-1] == 0.0 and sched.alpha[-1] == 1.0
    assert sched.timesteps[0] == 999
