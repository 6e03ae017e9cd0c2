"""Sampler decompositions: the host-loop stepper must reproduce the
lax.scan sampler exactly (same jaxpr math, different compile units)."""

import jax
import jax.numpy as jnp
import numpy as np

from blade.sampling.pipeline import (
    cog_stepper,
    cog_stepper_reuse,
    sample_cogvideox,
    sample_wan,
    wan_stepper,
    wan_stepper_reuse,
)


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


def _toy_masked_model(params):
    """Toy model honouring the collect_mask/masks protocol: the 'mask' is a
    data-dependent summary of x that perturbs the velocity, so replayed
    masks are distinguishable from refreshed ones unless the state matches."""

    def fn(x, t, text, rng, masks=None, collect_mask=False):
        tt = t.reshape((-1,) + (1,) * (x.ndim - 1)) / 1000.0
        m = masks if masks is not None else jnp.tanh(x.mean() * 3.0)
        v = (jnp.tanh(x * params["w"] + tt) + text.mean() * 0.1 + m * 0.05
             ).astype(jnp.bfloat16)
        if collect_mask:
            return v, jnp.tanh(x.mean() * 3.0)
        return v

    return fn


def test_wan_stepper_reuse_matches_scan_sampler():
    rng = jax.random.PRNGKey(3)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), (1, 4, 3, 8, 8))
    text = jax.random.normal(jax.random.fold_in(rng, 2), (1, 7, 16))
    fn = _toy_masked_model({"w": 0.6})
    every = 3

    ref = jax.jit(
        lambda n, te: sample_wan(fn, n, te, rng=rng, num_steps=8,
                                 flow_shift=3.0, mask_refresh_every=every)
    )(noise, text)

    init, refresh, reuse = wan_stepper_reuse(fn, num_steps=8, flow_shift=3.0)
    jrefresh = jax.jit(refresh)
    jreuse = jax.jit(reuse)
    state = init(noise)
    masks = None
    for i in range(8):
        if i % every == 0:
            state, masks = jrefresh(state, jnp.asarray(i), text, rng)
        else:
            state = jreuse(state, masks, jnp.asarray(i), text, rng)
    np.testing.assert_array_equal(np.asarray(state.x), np.asarray(ref))
    assert jrefresh._cache_size() == 1 and jreuse._cache_size() == 1


def test_cog_stepper_reuse_matches_scan_sampler():
    rng = jax.random.PRNGKey(9)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), (1, 4, 3, 8, 8))
    text = jax.random.normal(jax.random.fold_in(rng, 2), (1, 7, 16))
    fn = _toy_masked_model({"w": 0.5})
    every = 3

    ref = jax.jit(
        lambda n, te: sample_cogvideox(fn, n, te, rng=rng, num_steps=8,
                                       mask_refresh_every=every)
    )(noise, text)

    init, refresh, reuse = cog_stepper_reuse(fn, num_steps=8)
    jrefresh = jax.jit(refresh)
    jreuse = jax.jit(reuse)
    state = init(noise)
    masks = None
    for i in range(8):
        if i % every == 0:
            state, masks = jrefresh(state, jnp.asarray(i), text, rng)
        else:
            state = jreuse(state, masks, jnp.asarray(i), text, rng)
    # Not bit-exact: XLA fuses the dpm_step math differently around the
    # scan's lax.cond than in the standalone step (f32 associativity,
    # ~4e-7); logic errors (wrong/stale masks) show up at ~1e-2.
    np.testing.assert_allclose(np.asarray(state.x), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)
    assert jrefresh._cache_size() == 1 and jreuse._cache_size() == 1


def test_cog_stepper_matches_scan_exactly():
    rng = jax.random.PRNGKey(7)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), (2, 3, 4, 8, 8))
    text = jax.random.normal(jax.random.fold_in(rng, 2), (2, 7, 16))
    fn = _toy_model({"w": 0.4})

    ref = jax.jit(
        lambda n, te: sample_cogvideox(fn, n, te, rng=rng, num_steps=8)
    )(noise, text)

    init, step = cog_stepper(fn, num_steps=8)
    jstep = jax.jit(step)
    state = init(noise)
    for i in range(8):
        state = jstep(state, jnp.asarray(i), text, rng)
    np.testing.assert_array_equal(np.asarray(state.x), np.asarray(ref))
    assert jstep._cache_size() == 1


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
