"""Exactness and gradient tests for the fused norm+RoPE+head-split kernels
(`blade/kernels/norm_rope.py`) against the unfused XLA composition the Wan
q/k lane used before (rms*scale -> head split -> apply_rope_half)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blade.kernels.norm_rope import (
    _row_tile,
    heads_pack,
    heads_unpack,
    norm_rope_heads,
)
from blade.models.layers import apply_rope_half, rope_3d_tables

EPS = 1e-6


def _unfused(x, scale, cos, sin, num_heads):
    """The pre-fusion Wan q/k lane (wan_dit.py pre-r4: RMSNorm -> heads ->
    apply_rope_half) as the numerical anchor."""
    b, s, dim = x.shape
    d = dim // num_heads
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + EPS) * scale).astype(x.dtype)
    y = y.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    return apply_rope_half(y, cos, sin)


def _case(s_grid=(2, 4, 8), num_heads=3, d=128, b=2, dtype=jnp.float32, seed=0):
    t, h, w = s_grid
    s = t * h * w
    dim = num_heads * d
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(k1, (b, s, dim), dtype) * 2.0
    scale = jax.random.normal(k2, (dim,), jnp.float32) * 0.3 + 1.0
    cos, sin = rope_3d_tables(d, s_grid)
    return x, scale, jnp.asarray(cos), jnp.asarray(sin)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_norm_rope_heads_matches_unfused(dtype):
    x, scale, cos, sin = _case(dtype=dtype)
    want = _unfused(x, scale, cos, sin, 3)
    got = norm_rope_heads(x, scale, cos, sin, 3, eps=EPS, interpret=True)
    assert got.dtype == dtype and got.shape == want.shape
    # Same f32 products/adds; only the bf16 cast point differs (the unfused
    # lane casts after the norm, the fused kernel stays f32 through rope).
    tol = 5e-6 if dtype == jnp.float32 else 4e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol
    )


def test_norm_rope_heads_fallback_matches_unfused():
    # d=64 (cog head size) and tiny S both take the XLA fallback path.
    for s_grid, d in [((2, 4, 8), 64), ((1, 2, 3), 128)]:
        x, scale, cos, sin = _case(s_grid=s_grid, d=d)
        want = _unfused(x, scale, cos, sin, 3)
        got = norm_rope_heads(x, scale, cos, sin, 3, eps=EPS)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-6
        )


def test_norm_rope_heads_grads_match_unfused():
    x, scale, cos, sin = _case(b=1)  # S=64: fused path (custom VJP) active

    def loss_fused(x_, s_):
        o = norm_rope_heads(x_, s_, cos, sin, 3, eps=EPS, interpret=True)
        return jnp.sum(jnp.sin(o) * o)

    def loss_ref(x_, s_):
        o = _unfused(x_, s_, cos, sin, 3)
        return jnp.sum(jnp.sin(o) * o)

    gx, gs = jax.grad(loss_fused, argnums=(0, 1))(x, scale)
    wx, ws = jax.grad(loss_ref, argnums=(0, 1))(x, scale)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), atol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_heads_pack_unpack_roundtrip(dtype):
    x, *_ = _case(dtype=dtype)
    packed = heads_pack(x, 3, interpret=True)
    want = x.reshape(2, 64, 3, 128).transpose(0, 2, 1, 3)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(want))
    back = heads_unpack(packed, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_heads_pack_unpack_grads_are_transposes():
    x, *_ = _case(b=1)
    g = jax.grad(lambda x_: jnp.sum(heads_pack(x_, 3, interpret=True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * x), atol=1e-6)
    p = heads_pack(x, 3, interpret=True)
    g2 = jax.grad(lambda p_: jnp.sum(heads_unpack(p_, interpret=True) ** 2))(p)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(2 * p), atol=1e-6)


def test_row_tile_divisors():
    assert _row_tile(32760) == 504  # Wan 480p: 21*30*52
    assert _row_tile(17550) == 0  # Cog 480p S is odd*2: no 8-divisor
    assert _row_tile(64) == 64
    assert _row_tile(60) == 0  # no multiple-of-8 divisor >= 64


def test_norm_rope_heads_fused_false_takes_xla_lane():
    """ADVICE r4: tp-sharded callers opt out of the pallas_call (GSPMD
    would all-gather around it); fused=False must be exact vs the fused
    path at a fused-eligible geometry."""
    x, scale, cos, sin = _case()
    got = norm_rope_heads(x, scale, cos, sin, 3, eps=EPS, fused=False)
    want = norm_rope_heads(x, scale, cos, sin, 3, eps=EPS, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-6)


def test_rmsnorm_scale_only_requires_use_scale():
    """ADVICE r4: scale_only=True with use_scale=False returned None and
    crashed downstream with an opaque AttributeError; now asserts."""
    from blade.models.layers import RMSNorm

    m = RMSNorm(use_scale=False)
    with pytest.raises(AssertionError, match="scale_only"):
        m.init(jax.random.PRNGKey(0), jnp.ones((2, 8)),
               scale_only=True)
