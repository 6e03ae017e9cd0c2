"""Rotate-half RoPE weight-fold identities (the TPU-fast q/k lane).

The DiT q/k projections fold a static de-interleave channel permutation
into their weights so RoPE runs in the rotate-half form with no lane-minor
relayouts.  These tests pin the three identities the fold relies on:

  1. ``apply_rope_half`` on de-interleaved channels computes exactly
     ``apply_rope`` on interleaved channels (same products, same sums).
  2. ``PermutedDense`` == ``nn.Dense`` followed by the output permutation
     (shared parameter layout).
  3. Attention output is invariant to a common q/k channel permutation.

End-to-end wiring is separately guarded by the torch-reference parity
tests (tests/test_dit_torch_parity.py), which use the interleaved
convention on the torch side.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from blade.models.layers import (
    PermutedDense,
    PermutedLayerNorm,
    RMSNorm,
    apply_rope,
    apply_rope_half,
    deinterleave_perm,
    rope_3d_tables,
)


def test_rope_half_matches_interleaved():
    H, L, d = 3, 24, 64
    cos, sin = rope_3d_tables(d, (2, 3, 4))
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, H, L, d), jnp.float32)
    perm = deinterleave_perm(1, d)
    ref = apply_rope(x, cos, sin)[..., perm]
    got = apply_rope_half(x[..., perm], cos, sin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_permuted_dense_matches_dense_then_permute():
    D = 32
    perm = tuple(deinterleave_perm(2, D // 2).tolist())
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 7, D), jnp.float32)
    pd = PermutedDense(D, out_perm=perm, dtype=jnp.float32)
    params = pd.init(jax.random.PRNGKey(2), x)
    ref = nn.Dense(D, dtype=jnp.float32).apply(params, x)[..., np.asarray(perm)]
    got = pd.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_permuted_layernorm_matches_layernorm_then_permute():
    d = 16
    perm = np.asarray(deinterleave_perm(1, d))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, d), jnp.float32)
    pln = PermutedLayerNorm(feature_perm=tuple(perm.tolist()))
    params = pln.init(jax.random.PRNGKey(4), x)
    # non-trivial scale/bias so the permutation actually matters
    params = {"params": {"scale": jnp.arange(1.0, d + 1) / d,
                         "bias": jnp.arange(d, dtype=jnp.float32) / 7}}
    ref = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32).apply(
        params, x[..., perm]
    )
    # reference: normalize the PERMUTED input with PERMUTED scale/bias ==
    # PermutedLayerNorm on the permuted input with unpermuted params
    ref2 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32).apply(
        {"params": {"scale": params["params"]["scale"][perm],
                    "bias": params["params"]["bias"][perm]}},
        x[..., perm],
    )
    got = pln.apply(params, x[..., perm])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref2), atol=1e-6)
    assert np.abs(np.asarray(got - ref)).max() > 1e-3  # perm is not a no-op


def test_rms_scale_perm_matches():
    d = 16
    perm = tuple(deinterleave_perm(1, d).tolist())
    x = jax.random.normal(jax.random.PRNGKey(5), (3, d), jnp.float32)
    scale = jnp.arange(1.0, d + 1) / d
    params = {"params": {"scale": scale}}
    ref = RMSNorm().apply({"params": {"scale": scale[np.asarray(perm)]}},
                          x[..., np.asarray(perm)])
    got = RMSNorm(feature_perm=perm).apply(params, x[..., np.asarray(perm)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_attention_invariant_to_common_qk_channel_perm():
    from blade.kernels.ref_attention import dense_attention_with_lse

    B, H, L, d = 1, 2, 16, 32
    rng = jax.random.PRNGKey(6)
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i), (B, H, L, d),
                                 jnp.float32) for i in range(3))
    perm = np.asarray(deinterleave_perm(1, d))
    o1, l1 = dense_attention_with_lse(q, k, v)
    o2, l2 = dense_attention_with_lse(q[..., perm], k[..., perm], v)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=1e-5)
