"""Step-for-step parity between the jit-friendly samplers and the in-repo
numpy transcriptions of the diffusers schedulers (UniPCMultistepScheduler
flow/bh2 and CogVideoXDPMScheduler SDE-DPM++2M), plus frozen golden
vectors that fail on any epsilon change."""

import jax
import jax.numpy as jnp
import numpy as np

from blade.schedulers import ddpm as D
from blade.schedulers import unipc_flow as F
from blade.schedulers.cogvideox_dpm import dpm_init, dpm_step, make_dpm_schedule
from blade.schedulers.oracle import CogVideoXDPMOracle, UniPCFlowOracle

STEPS = 8


def _synthetic_v(x, kind, seed=7):
    """A deterministic, state-dependent 'model': mixes x with a fixed field
    so multistep history actually matters."""
    rng = np.random.default_rng(seed)
    field = rng.standard_normal(x.shape)
    return 0.3 * np.asarray(x, np.float64) + field * (0.5 if kind else 1.0)


def test_unipc_matches_oracle_stepwise():
    oracle = UniPCFlowOracle(STEPS, flow_shift=3.0)
    sched = F.make_flow_unipc_schedule(STEPS, flow_shift=3.0)
    np.testing.assert_allclose(sched.sigmas, oracle.sigmas, atol=1e-7)
    np.testing.assert_array_equal(sched.timesteps, oracle.timesteps)

    x0 = np.random.default_rng(0).standard_normal((2, 6))
    state = F.unipc_init(jnp.asarray(x0, jnp.float32))
    xo = x0.copy()
    for i in range(STEPS):
        v_jax = _synthetic_v(np.asarray(state.x, np.float64), True)
        v_ora = _synthetic_v(xo, True)
        state = F.unipc_step(sched, state, jnp.asarray(v_jax, jnp.float32),
                             jnp.asarray(i))
        xo = oracle.step(v_ora, xo)
        np.testing.assert_allclose(
            np.asarray(state.x, np.float64), xo, rtol=2e-4, atol=2e-4,
            err_msg=f"UniPC diverged from diffusers oracle at step {i}",
        )


def test_unipc_corrector_engages():
    """With the corrector off the trajectories must differ (guards against
    a silently-disabled corrector passing the parity test)."""
    sched_c = F.make_flow_unipc_schedule(STEPS, flow_shift=3.0)
    sched_nc = F.make_flow_unipc_schedule(
        STEPS, flow_shift=3.0, use_corrector=False)
    x0 = np.random.default_rng(1).standard_normal((2, 6))
    sc = F.unipc_init(jnp.asarray(x0, jnp.float32))
    sn = F.unipc_init(jnp.asarray(x0, jnp.float32))
    for i in range(STEPS):
        vc = jnp.asarray(_synthetic_v(np.asarray(sc.x), True), jnp.float32)
        vn = jnp.asarray(_synthetic_v(np.asarray(sn.x), True), jnp.float32)
        sc = F.unipc_step(sched_c, sc, vc, jnp.asarray(i))
        sn = F.unipc_step(sched_nc, sn, vn, jnp.asarray(i))
    assert float(jnp.abs(sc.x - sn.x).max()) > 1e-4


def test_cog_dpm_matches_oracle_stepwise():
    base = D.make_ddpm_schedule()  # CogVideoX-5B tables (zero-terminal-SNR)
    sched = make_dpm_schedule(base, STEPS)
    oracle = CogVideoXDPMOracle(base.alphas_cumprod, STEPS)
    np.testing.assert_array_equal(sched.timesteps, oracle.timesteps)

    gen = np.random.default_rng(2)
    x0 = gen.standard_normal((2, 6))
    noises = [gen.standard_normal((2, 6)) for _ in range(STEPS)]

    state = dpm_init(jnp.asarray(x0, jnp.float32))
    xo = x0.copy()
    old_pred = None
    for i in range(STEPS):
        v_jax = _synthetic_v(np.asarray(state.x, np.float64), False)
        v_ora = _synthetic_v(xo, False)
        state = dpm_step(sched, state, jnp.asarray(v_jax, jnp.float32),
                         jnp.asarray(i), jnp.asarray(noises[i], jnp.float32))
        t = int(oracle.timesteps[i])
        t_back = int(oracle.timesteps[i - 1]) if i > 0 else None
        xo, old_pred = oracle.step(v_ora, old_pred, t, t_back, xo, noises[i])
        np.testing.assert_allclose(
            np.asarray(state.x, np.float64), xo, rtol=3e-4, atol=3e-4,
            err_msg=f"CogVideoX DPM diverged from diffusers oracle at step {i}",
        )


def test_cog_dpm_noise_is_injected():
    """SDE semantics: different noise, different trajectory (not terminal)."""
    base = D.make_ddpm_schedule()
    sched = make_dpm_schedule(base, STEPS)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 4)),
                    jnp.float32)
    s1 = dpm_step(sched, dpm_init(x), jnp.zeros_like(x), jnp.asarray(1),
                  jnp.ones_like(x))
    s2 = dpm_step(sched, dpm_init(x), jnp.zeros_like(x), jnp.asarray(1),
                  -jnp.ones_like(x))
    assert float(jnp.abs(s1.x - s2.x).max()) > 1e-3


# ------------------------------------------------------------ golden vectors
# Frozen oracle outputs on fixed inputs: any change to the scheduler math
# (tables, order gating, corrector, mults) moves these and fails loudly.

def _golden_inputs():
    x = np.linspace(-1.0, 1.0, 8).reshape(2, 4)
    v = np.cos(np.arange(8, dtype=np.float64)).reshape(2, 4)
    return x, v


def test_unipc_golden_vector():
    x, v = _golden_inputs()
    oracle = UniPCFlowOracle(4, flow_shift=3.0)
    out = x.copy()
    for _ in range(4):
        out = oracle.step(v, out)
    expect = np.array([
        [-1.99966644, -1.2544078, -0.0125634, 0.84680514],
        [0.79628274, 0.14500386, -0.2455643, 0.24634921],
    ])
    np.testing.assert_allclose(out, expect, rtol=1e-7, atol=1e-7)


def test_cog_dpm_golden_vector():
    x, v = _golden_inputs()
    base = D.make_ddpm_schedule()
    oracle = CogVideoXDPMOracle(base.alphas_cumprod, 4)
    out = x.copy()
    old = None
    noise = np.full_like(x, 0.25)
    for i in range(4):
        t = int(oracle.timesteps[i])
        t_back = int(oracle.timesteps[i - 1]) if i > 0 else None
        out, old = oracle.step(v, old, t, t_back, out, noise)
    expect = np.array([
        [-1.05210234, -0.44119882, 0.82984953, 1.592447],
        [1.14546525, -0.10014251, -0.99916997, -0.72505518],
    ])
    np.testing.assert_allclose(out, expect, rtol=1e-7, atol=1e-7)
