"""End-to-end ASA module tests (small geometry, interpret-mode kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blade.attention.asa import ASAConfig, adaptive_sparse_attention, asa_attention
from blade.kernels.ref_attention import dense_attention_with_lse

# Tiny geometry: 8x4x2 = 64 video tokens + 64 text = 128 -> 1 block... use
# bigger: 16x8x4 = 512 video + 0 text, blocks = 4.
TINY = ASAConfig(
    latent_width=16, latent_height=8, latent_frames=4,
    text_length=0, sample_gap=4,
    min_retain_ratio=0.25, max_retain_ratio=1.0,
    sample_tokens_per_block=32,
)


def _qkv(rng, cfg, b=1, h=2, d=32):
    l = cfg.seq_len
    kq, kk, kv = jax.random.split(rng, 3)
    return (
        jax.random.normal(kq, (b, h, l, d)),
        jax.random.normal(kk, (b, h, l, d)),
        jax.random.normal(kv, (b, h, l, d)),
    )


def test_asa_shapes_and_finite():
    q, k, v = _qkv(jax.random.PRNGKey(0), TINY)
    out, sparsity = asa_attention(jax.random.PRNGKey(1), q, k, v, TINY, interpret=True)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()
    s = float(sparsity)
    assert -1.0 <= s <= 1.0


def test_asa_full_retention_close_to_dense():
    """With max_retain=1.0 and threshold 1.0 the mask keeps everything; the
    pooled branch adds only a small low-res correction, so the result must
    be close to dense attention (identical up to the pooled branch mass)."""
    cfg = ASAConfig(
        latent_width=16, latent_height=8, latent_frames=4,
        text_length=0, sample_gap=4,
        min_retain_ratio=1.0, max_retain_ratio=1.0,
        energy_threshold=2.0,  # never reached -> keep all
    )
    q, k, v = _qkv(jax.random.PRNGKey(2), cfg)
    out, sparsity = adaptive_sparse_attention(
        jax.random.PRNGKey(3), q, k, v, cfg, interpret=True
    )
    ref, _ = dense_attention_with_lse(q, k, v)
    # Pooled branch weight ~ gap/(L+gap) per row; small but nonzero.
    err = np.abs(np.asarray(out) - np.asarray(ref)).mean()
    assert err < 0.05, err
    assert float(sparsity) <= 0.0  # full mask => sparsity = -1/gap


def test_asa_gradients_flow():
    q, k, v = _qkv(jax.random.PRNGKey(4), TINY)

    def loss(q, k, v):
        out, _ = adaptive_sparse_attention(
            jax.random.PRNGKey(5), q, k, v, TINY, interpret=True
        )
        return jnp.sum(out**2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for name, arr in zip("qkv", g):
        a = np.asarray(arr)
        assert np.isfinite(a).all(), name
        assert np.abs(a).max() > 0, name


def test_asa_with_text_and_rearrange():
    cfg = ASAConfig(
        latent_width=8, latent_height=8, latent_frames=4,
        text_length=64, sample_gap=4,
        min_retain_ratio=0.5, max_retain_ratio=1.0,
    )
    q, k, v = _qkv(jax.random.PRNGKey(6), cfg)
    out, _ = asa_attention(jax.random.PRNGKey(7), q, k, v, cfg, interpret=True)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


def test_asa_multilevel_mode():
    cfg = ASAConfig(
        latent_width=16, latent_height=8, latent_frames=8,
        text_length=0, sample_gap=4, mask_mode="multilevel",
    )
    q, k, v = _qkv(jax.random.PRNGKey(8), cfg)
    out, sparsity = adaptive_sparse_attention(
        jax.random.PRNGKey(9), q, k, v, cfg, interpret=True
    )
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(float(sparsity), 1 - 0.15625, atol=1e-6)
