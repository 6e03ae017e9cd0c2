"""Wan DiT forward tests (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from blade.models.wan_dit import WAN_TINY, WanModel


def _make(b=1, t=2, h=8, w=8, text_len=16):
    model = WanModel(WAN_TINY, dtype=jnp.float32)
    latents = jax.random.normal(jax.random.PRNGKey(0), (b, 16, t, h, w))
    timestep = jnp.array([500.0] * b)
    text = jax.random.normal(jax.random.PRNGKey(1), (b, text_len, WAN_TINY.text_dim))
    params = model.init(jax.random.PRNGKey(2), latents, timestep, text)
    return model, params, latents, timestep, text


def test_forward_shape_and_finite():
    model, params, latents, timestep, text = _make()
    out = model.apply(params, latents, timestep, text)
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out)).all()


def test_timestep_changes_output():
    model, params, latents, timestep, text = _make()
    o1 = model.apply(params, latents, timestep, text)
    o2 = model.apply(params, latents, jnp.array([10.0]), text)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-4


def test_text_conditioning_matters():
    model, params, latents, timestep, text = _make()
    o1 = model.apply(params, latents, timestep, text)
    o2 = model.apply(params, latents, timestep, text * 0.0)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-4


def test_jit_and_grad():
    model, params, latents, timestep, text = _make()

    @jax.jit
    def loss(p):
        out = model.apply(p, latents, timestep, text)
        return jnp.mean(out**2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in leaves)


def test_custom_attention_fn_is_used():
    calls = []

    def spy_attention(q, k, v, **kw):
        calls.append(q.shape)
        from blade.kernels.ref_attention import dense_attention_with_lse
        return dense_attention_with_lse(q, k, v)[0]

    model = WanModel(WAN_TINY, dtype=jnp.float32, attention_fn=spy_attention)
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 8, 8))
    text = jax.random.normal(jax.random.PRNGKey(1), (1, 16, WAN_TINY.text_dim))
    params = model.init(jax.random.PRNGKey(2), latents, jnp.array([1.0]), text)
    model.apply(params, latents, jnp.array([1.0]), text)
    # one self-attention call per block, [B, H, L, d]
    assert len([c for c in calls]) >= WAN_TINY.num_layers
    assert calls[-1] == (1, 2, 2 * 4 * 4, 64)
