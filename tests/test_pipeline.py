"""Sampler decompositions: the host-loop stepper must reproduce the
lax.scan sampler exactly (same jaxpr math, different compile units)."""

import jax
import jax.numpy as jnp
import numpy as np

from blade.sampling.pipeline import sample_wan, wan_stepper


def _toy_model(params):
    """Cheap nonlinear 'velocity' model: mixes x, t and text."""

    def fn(x, t, text, rng):
        tt = t.reshape((-1,) + (1,) * (x.ndim - 1)) / 1000.0
        bias = text.mean() * 0.1
        v = jnp.tanh(x * params["w"] + tt) + bias
        return v.astype(jnp.bfloat16)

    return fn


def test_wan_stepper_matches_scan_exactly():
    rng = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), (2, 4, 3, 8, 8))
    text = jax.random.normal(jax.random.fold_in(rng, 2), (2, 7, 16))
    fn = _toy_model({"w": 0.7})

    ref = jax.jit(
        lambda n, te: sample_wan(fn, n, te, rng=rng, num_steps=8,
                                 flow_shift=3.0)
    )(noise, text)

    init, step = wan_stepper(fn, num_steps=8, flow_shift=3.0)
    jstep = jax.jit(step)
    state = init(noise)
    for i in range(8):
        state = jstep(state, jnp.asarray(i), text, rng)
    np.testing.assert_array_equal(np.asarray(state.x), np.asarray(ref))


def test_wan_stepper_compiles_once():
    fn = _toy_model({"w": 0.3})
    init, step = wan_stepper(fn, num_steps=8)
    jstep = jax.jit(step)
    noise = jnp.ones((1, 2, 2, 4, 4))
    text = jnp.ones((1, 3, 8))
    rng = jax.random.PRNGKey(5)
    state = init(noise)
    for i in range(8):
        state = jstep(state, jnp.asarray(i), text, rng)
    # one compilation across all 8 traced-index calls
    assert jstep._cache_size() == 1
