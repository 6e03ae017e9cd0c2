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
