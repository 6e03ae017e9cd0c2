"""Mask-prediction machinery tests: energy invariants, multi-level bands,
block-list conversion, pooled-score sanity (reference semantics from
``transfer_attn_to_mask`` / ``efficient_attn_with_pooling``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blade.attention import masks as M


def _rand_scores(rng, b=2, h=3, nq=16, nk=16):
    s = jax.random.uniform(rng, (b, h, nq, nk)) ** 4  # peaked
    return s / jnp.sum(s, axis=-1, keepdims=True)


def test_energy_mask_retain_clamps():
    rng = jax.random.PRNGKey(0)
    scores = _rand_scores(rng, nq=20, nk=20)
    mask = M.energy_mask(scores, min_retain_ratio=0.1, max_retain_ratio=0.3, force_last2=False)
    counts = np.asarray(mask.sum(axis=-1))
    nk = scores.shape[-1]
    assert counts.min() >= max(1, int(nk * 0.1))
    assert counts.max() <= max(1, int(nk * 0.3))


def test_energy_mask_keeps_top_blocks():
    # One dominant block per row -> with tight clamps it must be selected.
    nq, nk = 8, 16
    scores = jnp.full((1, 1, nq, nk), 1e-4)
    hot = jnp.arange(nq) % nk
    scores = scores.at[0, 0, jnp.arange(nq), hot].set(1.0)
    mask = M.energy_mask(scores, min_retain_ratio=1 / 16, max_retain_ratio=2 / 16,
                         force_last2=False)
    got = np.asarray(mask[0, 0, jnp.arange(nq), hot])
    assert got.all()


def test_energy_mask_force_last2():
    rng = jax.random.PRNGKey(1)
    scores = _rand_scores(rng)
    mask = M.energy_mask(scores, force_last2=True)
    assert bool(mask[..., -2:, :].all())
    assert bool(mask[..., :, -2:].all())


def test_energy_mask_per_head_ratios():
    rng = jax.random.PRNGKey(2)
    b, h, nq, nk = 2, 2, 10, 20
    scores = _rand_scores(rng, b, h, nq, nk)
    max_r = jnp.array([[0.1, 0.5], [0.5, 0.1]])
    mask = M.energy_mask(scores, min_retain_ratio=0.05, max_retain_ratio=max_r,
                         force_last2=False)
    counts = np.asarray(mask.sum(-1))
    assert counts[0, 0].max() <= int(nk * 0.1)
    assert counts[1, 1].max() <= int(nk * 0.1)


def test_multilevel_mask_bands():
    rng = jax.random.PRNGKey(3)
    scores = _rand_scores(rng, b=1, h=1, nq=8, nk=40)
    levels = M.multilevel_mask(scores, force_last2=False)
    lv = np.asarray(levels[0, 0])
    nk = 40
    for row in range(8):
        vals, counts = np.unique(lv[row], return_counts=True)
        d = dict(zip(vals.tolist(), counts.tolist()))
        assert d.get(1, 0) == int(nk * 0.05)
        assert d.get(2, 0) == int(nk * 0.15) - int(nk * 0.05)
        assert d.get(4, 0) == int(nk * 0.25) - int(nk * 0.15)
        assert d.get(8, 0) == int(nk * 0.5) - int(nk * 0.25)
        assert d.get(0, 0) == nk - int(nk * 0.5)
    # Levels must track the score ranking: the argmax block gets level 1.
    top = np.asarray(jnp.argmax(scores[0, 0], axis=-1))
    assert (lv[np.arange(8), top] == 1).all()


def test_block_lists_roundtrip():
    rng = jax.random.PRNGKey(4)
    mask = jax.random.uniform(rng, (2, 2, 6, 12)) < 0.3
    idx, counts = M.mask_to_block_lists(mask, max_blocks=12)
    mask_np = np.asarray(mask)
    for b in range(2):
        for h in range(2):
            for q in range(6):
                sel = np.where(mask_np[b, h, q])[0]
                c = int(counts[b, h, q])
                assert c == len(sel)
                np.testing.assert_array_equal(np.asarray(idx[b, h, q, :c]), sel)
                if c:  # padding repeats the last valid index
                    assert (np.asarray(idx[b, h, q, c:]) == sel[-1]).all()


def test_block_lists_max_blocks_cap():
    mask = jnp.ones((1, 1, 4, 16), dtype=bool)
    idx, counts = M.mask_to_block_lists(mask, max_blocks=8)
    assert idx.shape[-1] == 8
    assert int(counts.max()) == 8


def test_sample_block_tokens_shapes_and_membership():
    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, (2, 3, 256, 8))
    s = M.sample_block_tokens(jax.random.PRNGKey(6), x, block=128, num_keep=32)
    assert s.shape == (2, 3, 64, 8)
    # Every sampled token must exist in its source block.
    xs = np.asarray(x).reshape(2, 3, 2, 128, 8)
    ss = np.asarray(s).reshape(2, 3, 2, 32, 8)
    for b in range(2):
        for h in range(3):
            for blk in range(2):
                src = {tuple(r) for r in xs[b, h, blk]}
                for r in ss[b, h, blk]:
                    assert tuple(r) in src


def test_sample_block_tokens_matches_gather_exactly():
    # The one-hot matmul lane must reproduce take_along_axis bit-for-bit
    # (each output row is 1.0 * one input row, accumulated once).
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(
            jax.random.PRNGKey(8), (2, 3, 384, 16)).astype(dtype)
        rng = jax.random.PRNGKey(9)
        s = M.sample_block_tokens(rng, x, block=128, num_keep=16)
        scores = jax.random.uniform(rng, (2, 3, 128))
        _, offs = jax.lax.top_k(scores, 16)
        xb = x.reshape(2, 3, 3, 128, 16)
        ref = jnp.take_along_axis(
            xb, offs[:, :, None, :, None], axis=3).reshape(2, 3, 48, 16)
        assert s.dtype == x.dtype
        np.testing.assert_array_equal(np.asarray(s, np.float32),
                                      np.asarray(ref, np.float32))


def test_pooled_scores_rows_normalized_and_pick_signal():
    rng = jax.random.PRNGKey(7)
    b, h, nq, nk, tpb, d = 1, 2, 4, 4, 8, 16
    q = jax.random.normal(rng, (b, h, nq * tpb, d))
    # Make q-block i strongly attend to k-block (i+1) % nk.
    k = jnp.zeros((b, h, nk * tpb, d))
    for i in range(nq):
        tgt = (i + 1) % nk
        k = k.at[:, :, tgt * tpb:(tgt + 1) * tpb].set(
            5.0 * q[:, :, i * tpb:i * tpb + tpb]
        )
    po = M.pooled_attention_scores(q, k, tokens_per_block=tpb)
    assert po.shape == (b, h, nq, nk)
    np.testing.assert_allclose(np.asarray(po.sum(-1)), 1.0, rtol=1e-5)
    picked = np.asarray(jnp.argmax(po, axis=-1))[0]
    expect = (np.arange(nq) + 1) % nk
    assert (picked == expect).all()


def test_pad_to_block_multiple_edge():
    x = jnp.arange(10, dtype=jnp.float32).reshape(1, 5, 2)
    y = M.pad_to_block_multiple(x, 4, axis=1)
    assert y.shape == (1, 8, 2)
    np.testing.assert_array_equal(np.asarray(y[0, 5:]), np.asarray(x[0, -1:]).repeat(3, 0))


def test_pooled_predictor_kernel_matches_reference():
    from blade.kernels.pooled_predictor import pooled_scores_kernel_call

    rng = jax.random.PRNGKey(11)
    b, h, nb, tpb, d = 1, 2, 24, 32, 64
    q_s = jax.random.normal(rng, (b, h, nb * tpb, d))
    k_s = jax.random.normal(jax.random.PRNGKey(12), (b, h, nb * tpb, d))
    ref = M.pooled_attention_scores(q_s, k_s, tokens_per_block=tpb)
    got = pooled_scores_kernel_call(
        q_s, k_s, tokens_per_block=tpb, interpret=True
    )
    assert got.shape == ref.shape
    # The JAX reference casts scores to bf16 before the matmul; the kernel
    # keeps f32 accumulation, so they agree only to bf16 precision.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-3,
                               rtol=3e-2)


def test_pooled_predictor_kernel_ragged():
    from blade.kernels.pooled_predictor import pooled_scores_kernel_call

    # lengths not multiples of the kernel tiles (q 256 / k 512)
    rng = jax.random.PRNGKey(13)
    b, h, tpb, d = 1, 1, 32, 64
    q_s = jax.random.normal(rng, (b, h, 10 * tpb, d))
    k_s = jax.random.normal(jax.random.PRNGKey(14), (b, h, 7 * tpb, d))
    ref = M.pooled_attention_scores(q_s, k_s, tokens_per_block=tpb)
    got = pooled_scores_kernel_call(q_s, k_s, tokens_per_block=tpb,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-3,
                               rtol=3e-2)


def test_union_block_lists():
    rng = jax.random.PRNGKey(21)
    mask = jax.random.uniform(rng, (1, 2, 8, 16)) < 0.3
    idx, counts, bits = M.union_block_lists(mask, group=2)
    mask_np = np.asarray(mask)
    for h in range(2):
        for g in range(4):
            r0, r1 = mask_np[0, h, 2 * g], mask_np[0, h, 2 * g + 1]
            union = np.where(r0 | r1)[0]
            c = int(counts[0, h, g])
            assert c == len(union)
            got = np.asarray(idx[0, h, g, :c])
            np.testing.assert_array_equal(got, union)
            bb = np.asarray(bits[0, h, g, :c])
            np.testing.assert_array_equal(bb & 1, r0[union].astype(int))
            np.testing.assert_array_equal((bb >> 1) & 1, r1[union].astype(int))


def test_union_block_lists_bounded_lane_matches_argsort():
    """The bounded top_k lane == the argsort formulation on energy masks
    (whose clamp provides the bound), including the forced full rows."""
    rng = jax.random.PRNGKey(33)
    nk = 64
    scores = _rand_scores(rng, b=1, h=3, nq=16, nk=nk)
    mask = M.energy_mask(scores, min_retain_ratio=0.05, max_retain_ratio=0.2)
    bound = 2 * (int(nk * 0.2) + 2)
    idx_b, cnt_b, bits_b = M.union_block_lists(mask, group=2, bound=bound)
    idx_r, cnt_r, bits_r = M.union_block_lists(mask, group=2)
    np.testing.assert_array_equal(np.asarray(cnt_b), np.asarray(cnt_r))
    c = np.asarray(cnt_r)
    a, b = np.asarray(idx_b), np.asarray(idx_r)
    ab, bb = np.asarray(bits_b), np.asarray(bits_r)
    for pos in np.ndindex(*c.shape):
        n = c[pos]
        np.testing.assert_array_equal(a[pos][:n], b[pos][:n], err_msg=str(pos))
        np.testing.assert_array_equal(ab[pos][:n], bb[pos][:n])


def test_energy_mask_topk_fast_path_equals_argsort():
    """Scalar-ratio fast path must equal the argsort formulation."""
    rng = jax.random.PRNGKey(31)
    scores = _rand_scores(rng, b=2, h=3, nq=32, nk=64)
    fast = M.energy_mask(scores, min_retain_ratio=0.05, max_retain_ratio=0.2)
    # Force the argsort path by passing ratios as arrays.
    slow = M.energy_mask(
        scores,
        min_retain_ratio=jnp.full((2, 3), 0.05),
        max_retain_ratio=jnp.full((2, 3), 0.2),
    )
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))
