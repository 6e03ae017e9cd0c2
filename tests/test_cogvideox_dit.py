"""CogVideoX DiT forward tests (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from blade.models.cogvideox_dit import COGVIDEOX_TINY, CogVideoXModel


def _make(b=1, t=2, h=8, w=8, text_len=8):
    model = CogVideoXModel(COGVIDEOX_TINY, dtype=jnp.float32)
    latents = jax.random.normal(jax.random.PRNGKey(0), (b, t, 16, h, w))
    timestep = jnp.array([500.0] * b)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, text_len, COGVIDEOX_TINY.text_embed_dim)
    )
    params = model.init(jax.random.PRNGKey(2), latents, timestep, text)
    return model, params, latents, timestep, text


def test_forward_shape_and_finite():
    model, params, latents, timestep, text = _make()
    out = model.apply(params, latents, timestep, text)
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out)).all()


def test_conditioning_and_time():
    model, params, latents, timestep, text = _make()
    o = model.apply(params, latents, timestep, text)
    o_t = model.apply(params, latents, jnp.array([3.0]), text)
    o_c = model.apply(params, latents, timestep, text * 0)
    assert np.abs(np.asarray(o - o_t)).max() > 1e-4
    assert np.abs(np.asarray(o - o_c)).max() > 1e-4


def test_joint_attention_sees_text():
    """attention_fn must receive the concatenated [text, video] sequence."""
    shapes = []

    def spy(q, k, v, **kw):
        shapes.append(q.shape)
        from blade.kernels.ref_attention import dense_attention_with_lse
        return dense_attention_with_lse(q, k, v)[0]

    model = CogVideoXModel(COGVIDEOX_TINY, dtype=jnp.float32, attention_fn=spy)
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 8, 8))
    text = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 64))
    params = model.init(jax.random.PRNGKey(2), latents, jnp.array([1.0]), text)
    model.apply(params, latents, jnp.array([1.0]), text)
    # video tokens = 2 * 4 * 4 = 32, text 8 -> 40 total
    assert shapes[-1] == (1, 2, 40, 64)


def test_grad_flows():
    model, params, latents, timestep, text = _make()

    def loss(p):
        return jnp.mean(model.apply(p, latents, timestep, text) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))
