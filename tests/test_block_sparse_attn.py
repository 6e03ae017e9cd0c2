"""Pallas block-sparse attention kernel tests (interpret mode on CPU).

Mirrors the reference's ``test_block_sparse_attention.py`` strategy:
  1. dense equivalence: all-ones mask vs plain softmax attention,
  2. gradient correctness vs autodiff through the dense reference,
  3. sparse patterns: masked-out blocks never contribute,
  4. ragged lengths (non multiples of 128).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blade.kernels.block_sparse_attn import block_sparse_attention, flash_attention
from blade.kernels.ref_attention import block_masked_attention, dense_attention_with_lse


def _rand_qkv(rng, b=1, h=2, lq=256, lk=256, d=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, h, lq, d), dtype)
    k = jax.random.normal(kk, (b, h, lk, d), dtype)
    v = jax.random.normal(kv, (b, h, lk, d), dtype)
    return q, k, v


def test_dense_equivalence():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0))
    out, lse = flash_attention(q, k, v, interpret=True)
    ref_out, ref_lse = dense_attention_with_lse(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=1e-5, rtol=1e-5)


def test_all_ones_mask_matches_dense():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1))
    mask = jnp.ones((1, 2, 2, 2), dtype=bool)
    out, lse = block_sparse_attention(q, k, v, mask, interpret=True)
    ref_out, ref_lse = dense_attention_with_lse(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=1e-5, rtol=1e-5)


def test_sparse_mask_matches_masked_reference():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), lq=384, lk=512)
    rng = jax.random.PRNGKey(3)
    mask = jax.random.uniform(rng, (1, 2, 3, 4)) < 0.5
    # Guarantee at least one block per row.
    mask = mask.at[..., 0].set(True)
    out, lse = block_sparse_attention(q, k, v, mask, interpret=True)
    ref_out, ref_lse = block_masked_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=1e-5, rtol=1e-5)


def test_union_bound_matches_unbounded():
    """union_bound (the energy-clamp glue fast lane) is a pure glue
    optimization: identical output to the unbounded path, including
    forced fully-on rows above the bound."""
    from blade.attention.masks import energy_mask

    nk = 16
    q, k, v = _rand_qkv(jax.random.PRNGKey(9), lq=1024, lk=nk * 128)
    scores = jax.random.uniform(jax.random.PRNGKey(10), (1, 2, 8, nk))
    mask = energy_mask(scores, min_retain_ratio=0.125, max_retain_ratio=0.25)
    bound = 2 * (int(nk * 0.25) + 2)  # the clamp bound asa.py derives (12)
    # precondition of the lane: every union row above the bound is full
    union = np.asarray(mask).reshape(2, 4, 2, nk).any(axis=2)
    counts = union.sum(-1)
    assert ((counts <= bound) | (counts == nk)).all(), counts
    out_b, lse_b = block_sparse_attention(
        q, k, v, mask, interpret=True, union_bound=bound)
    out_u, lse_u = block_sparse_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_u),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_b), np.asarray(lse_u),
                               atol=1e-6, rtol=1e-6)


def test_bias_shifts_lse():
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), lq=128, lk=128)
    out0, lse0 = flash_attention(q, k, v, interpret=True)
    out1, lse1 = flash_attention(q, k, v, bias=1.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lse1 - lse0), 1.5, atol=1e-5)


def test_ragged_lengths():
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), lq=200, lk=300)
    out, lse = flash_attention(q, k, v, interpret=True)
    ref_out, ref_lse = dense_attention_with_lse(q, k, v)
    assert out.shape == (1, 2, 200, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=1e-5, rtol=1e-5)


def test_bf16_accuracy():
    q, k, v = _rand_qkv(jax.random.PRNGKey(6), dtype=jnp.bfloat16)
    out, _ = flash_attention(q, k, v, interpret=True)
    ref_out, _ = dense_attention_with_lse(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref_out)).mean()
    assert err < 2e-2, f"bf16 mean abs err {err}"


def test_gradients_dense():
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), b=1, h=1, lq=128, lk=256)

    def loss_kernel(q, k, v):
        out, lse = flash_attention(q, k, v, interpret=True)
        return jnp.sum(out * out) + 0.1 * jnp.sum(lse)

    def loss_ref(q, k, v):
        out, lse = dense_attention_with_lse(q, k, v)
        return jnp.sum(out * out) + 0.1 * jnp.sum(lse)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=f"d{name}"
        )


def test_gradients_sparse():
    q, k, v = _rand_qkv(jax.random.PRNGKey(8), b=1, h=2, lq=256, lk=384)
    mask = jax.random.uniform(jax.random.PRNGKey(9), (1, 2, 2, 3)) < 0.6
    mask = mask.at[..., 0].set(True)

    def loss_kernel(q, k, v):
        out, lse = block_sparse_attention(q, k, v, mask, interpret=True)
        return jnp.sum(jnp.sin(out)) + 0.05 * jnp.sum(lse)

    def loss_ref(q, k, v):
        out, lse = block_masked_attention(q, k, v, mask)
        return jnp.sum(jnp.sin(out)) + 0.05 * jnp.sum(lse)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=f"d{name}"
        )


def test_gradients_ragged():
    q, k, v = _rand_qkv(jax.random.PRNGKey(10), b=1, h=1, lq=150, lk=270)

    def loss_kernel(q, k, v):
        out, _ = flash_attention(q, k, v, interpret=True)
        return jnp.sum(out**2)

    def loss_ref(q, k, v):
        out, _ = dense_attention_with_lse(q, k, v)
        return jnp.sum(out**2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_sparse_union_mode_matches_reference():
    """Experimental union-gather path (SPARSE_UNION) must be exact."""
    import blade.kernels.block_sparse_attn as BSA

    q, k, v = _rand_qkv(jax.random.PRNGKey(20), lq=384, lk=512)
    mask = jax.random.uniform(jax.random.PRNGKey(21), (1, 2, 3, 4)) < 0.5
    mask = mask.at[..., 0].set(True)
    old = BSA.SPARSE_UNION
    try:
        BSA.SPARSE_UNION = True
        out, lse = block_sparse_attention(q, k, v, mask, interpret=True)
    finally:
        BSA.SPARSE_UNION = old
    ref_out, ref_lse = block_masked_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=1e-5, rtol=1e-5)
