"""Sequence-parallel ring attention (SURVEY §7 stretch: the reference has
no SP at all): exactness vs single-device dense, sharding preservation,
and jit-compilability over an 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blade.kernels.ref_attention import dense_attention_with_lse
from blade.parallel.ring_attention import (
    make_ring_attention_fn,
    ring_flash_attention,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))


def _qkv(l=512, d=64, b=2, h=3):
    return tuple(
        jax.random.normal(jax.random.PRNGKey(i), (b, h, l, d))
        for i in range(3)
    )


def test_ring_matches_dense(mesh):
    q, k, v = _qkv()
    out, lse = ring_flash_attention(q, k, v, mesh=mesh)
    ref, rlse = dense_attention_with_lse(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse), atol=1e-5)


def test_ring_under_jit_with_sharded_inputs(mesh):
    q, k, v = _qkv(l=1024)
    spec = NamedSharding(mesh, P(None, None, "sp", None))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))
    f = jax.jit(lambda q, k, v: ring_flash_attention(q, k, v, mesh=mesh)[0])
    out = f(qs, ks, vs)
    ref, _ = dense_attention_with_lse(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # output stays sequence-sharded (no gather to one device)
    assert out.sharding.spec == P(None, None, "sp", None)


def test_ring_attention_fn_for_dit(mesh):
    """The attention_fn wrapper drops into the DiT signature."""
    fn = make_ring_attention_fn(mesh)
    q, k, v = _qkv(l=256)
    out = fn(q, k, v, rng=jax.random.PRNGKey(0), layer_index=0)
    ref, _ = dense_attention_with_lse(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_block_sparse_matches_single_device_asa_mask(mesh):
    """ASA-sparse inner composed with the ring (VERDICT r4 #5): an
    energy-mask produced exactly the way ASA builds it, sharded sp=8 at
    L=4096, each ring step running the block-sparse inner on the
    (q-shard, k-shard) mask tile — bitwise semantics vs the single-device
    masked reference on the FULL mask."""
    from blade.attention.masks import energy_mask
    from blade.kernels.ref_attention import block_masked_attention

    l, d, b, h = 4096, 64, 1, 2
    q, k, v = _qkv(l=l, d=d, b=b, h=h)
    nq = nk = l // 128
    # ASA-style block scores -> energy mask (force_last2 keeps the last
    # two key columns on for every row, the ASA serving convention)
    scores = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(7), (b, h, nq, nk)) * 2.0)
    mask = energy_mask(scores, min_retain_ratio=0.05, max_retain_ratio=0.2)
    # serving regime: retain clamp + forced last-2 rows/cols -> ~0.29
    assert 0.03 < float(mask.mean()) <= 0.35

    out, lse = ring_flash_attention(q, k, v, mesh=mesh, block_mask=mask)
    ref, rlse = block_masked_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse), atol=1e-5)


def test_ring_block_sparse_pair_empty_rows(mesh):
    """Pair-empty and globally-empty mask rows: a row whose selected
    blocks all live on ONE key shard contributes lse = -inf partials from
    the other 7 ring steps; a globally-empty row must come back as
    out = 0.  Both must merge exactly (the _merge -inf/-1e30 path)."""
    from blade.kernels.ref_attention import block_masked_attention

    l, d = 2048, 64
    q, k, v = _qkv(l=l, d=d, b=1, h=1)
    nq = nk = l // 128  # 16 rows, 2 per device at sp=8
    mask = np.zeros((1, 1, nq, nk), bool)
    mask[..., 0, 4:6] = True   # row 0: only shard 2 (cols 4-5)
    mask[..., 3, :] = True     # row 3: dense
    mask[..., 5, 15] = True    # row 5: single block on the last shard
    # rows 1, 2, 4, 6..15: globally empty
    mask = jnp.asarray(mask)

    out, lse = ring_flash_attention(q, k, v, mesh=mesh, block_mask=mask)
    ref, rlse = block_masked_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    finite = np.isfinite(np.asarray(rlse)) & (np.asarray(rlse) > -1e29)
    np.testing.assert_allclose(np.asarray(lse)[finite],
                               np.asarray(rlse)[finite], atol=1e-5)
    # empty rows: zero output on every token of the block row
    np.testing.assert_array_equal(
        np.asarray(out)[..., 128 * 6:, :], 0.0)


def test_ring_block_sparse_jit_sharded(mesh):
    """The composed program jits with sharded operands and keeps the
    sequence sharding on the output (no all-gather of q/out)."""
    l = 2048
    q, k, v = _qkv(l=l, d=64, b=1, h=2)
    nq = nk = l // 128
    mask = jax.random.uniform(jax.random.PRNGKey(3), (1, 2, nq, nk)) < 0.2
    mask = mask.at[..., -2:].set(True)
    qs = jax.device_put(q, NamedSharding(mesh, P(None, None, "sp", None)))
    ms = jax.device_put(mask, NamedSharding(mesh, P(None, None, "sp", None)))
    f = jax.jit(lambda q, k, v, m: ring_flash_attention(
        q, k, v, mesh=mesh, block_mask=m)[0])
    out = f(qs, k, v, ms)
    assert out.sharding.spec == P(None, None, "sp", None)
    from blade.kernels.ref_attention import block_masked_attention

    ref, _ = block_masked_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
