"""Shared Flax building blocks for the video DiT families.

TPU-first conventions:
  * everything runs in bf16 with f32 params ("mixed" via ``dtype`` /
    ``param_dtype``) and f32 layernorm/softmax internals,
  * rotary embeddings are computed once per geometry as static cos/sin
    tables (no per-step trig inside the sampled loop),
  * attention is pluggable: a module attribute ``attention_fn`` receives
    ``(q, k, v) -> out`` over ``[B, H, L, D]`` so the same DiT runs dense
    (XLA/pallas flash) or ASA (sparse) without code changes — the TPU
    equivalent of the reference's diffusers attention-processor swapping
    (``modify_cogvideo.py`` / ``modify_wan.py``).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "RMSNorm",
    "FeedForward",
    "sinusoidal_timestep_embedding",
    "TimestepEmbedder",
    "rope_3d_tables",
    "apply_rope",
    "apply_rope_half",
    "deinterleave_perm",
    "PermutedDense",
    "PermutedLayerNorm",
    "modulate",
    "AttentionFn",
    "dense_attention_fn",
]

AttentionFn = Callable[..., jnp.ndarray]  # (q, k, v, **kw) -> out [B,H,L,D]


class RMSNorm(nn.Module):
    """RMS norm over the last axis; f32 internals, optional learned scale.

    ``feature_perm`` (static) permutes the learned scale at trace time so the
    module can consume inputs whose channels were permuted upstream (see
    ``PermutedDense``) while keeping the checkpoint layout unpermuted — the
    RMS statistic itself is permutation-invariant.
    """

    eps: float = 1e-6
    use_scale: bool = True
    param_dtype: Any = jnp.float32
    feature_perm: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x, *, scale_only: bool = False):
        scale = None
        if self.use_scale:
            scale = self.param(
                "scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype
            )
            if self.feature_perm is not None:
                scale = scale[np.asarray(self.feature_perm)]
        if scale_only:
            # Param-only access for callers that fuse the normalization into
            # a Pallas kernel (kernels/norm_rope.py) but must keep the
            # checkpoint path (<name>/scale) unchanged.
            assert self.use_scale, (
                "scale_only=True requires use_scale=True: callers fuse the "
                "norm elsewhere and multiply by the returned scale")
            return scale
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            y = y * scale
        return y.astype(dtype)


class FeedForward(nn.Module):
    """GELU MLP (tanh approximation, matching the torch reference models)."""

    inner_dim: int
    out_dim: Optional[int] = None
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        h = nn.Dense(self.inner_dim, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(out_dim, dtype=self.dtype, param_dtype=self.param_dtype)(h)


def sinusoidal_timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0, flip_sin_to_cos: bool = True
) -> jnp.ndarray:
    """[B] -> [B, dim] sinusoidal features (f32)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedder(nn.Module):
    """sinusoidal -> MLP time embedding."""

    hidden_dim: int
    freq_dim: int = 256
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t):
        x = sinusoidal_timestep_embedding(t, self.freq_dim)
        x = nn.Dense(self.hidden_dim, dtype=jnp.float32, param_dtype=self.param_dtype)(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_dim, dtype=jnp.float32, param_dtype=self.param_dtype)(x)
        return x  # keep f32: feeds modulation parameters


def rope_3d_tables(
    head_dim: int,
    grid_thw: Tuple[int, int, int],
    *,
    dims_thw: Optional[Tuple[int, int, int]] = None,
    theta: float = 10000.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Static 3-D rotary cos/sin tables for a (T, H, W) token grid.

    Splits the per-head rotary dim across (t, h, w) axes.  Default split
    follows the Wan convention: half-dims ``c = head_dim/2`` divided as
    ``(c - 2*(c//3), c//3, c//3)``.  Token order is t-major, then h, then w
    (matching ``b c f h w -> b (f h w) c`` patchification).

    Returns ``(cos, sin)`` of shape ``[T*H*W, head_dim/2]`` (f32).
    """
    t_len, h_len, w_len = grid_thw
    c = head_dim // 2
    if dims_thw is None:
        ch = cw = c // 3
        ct = c - 2 * ch
    else:
        dt, dh, dw = dims_thw
        assert dt + dh + dw == head_dim
        ct, ch, cw = dt // 2, dh // 2, dw // 2

    def axis_freqs(n, cdim):
        inv = 1.0 / (theta ** (np.arange(cdim, dtype=np.float64) / cdim))
        return np.outer(np.arange(n, dtype=np.float64), inv)  # [n, cdim]

    ft = axis_freqs(t_len, ct)
    fh = axis_freqs(h_len, ch)
    fw = axis_freqs(w_len, cw)
    # Broadcast to the full grid, t-major ordering.
    angles = np.concatenate(
        [
            np.broadcast_to(ft[:, None, None, :], (t_len, h_len, w_len, ct)),
            np.broadcast_to(fh[None, :, None, :], (t_len, h_len, w_len, ch)),
            np.broadcast_to(fw[None, None, :, :], (t_len, h_len, w_len, cw)),
        ],
        axis=-1,
    ).reshape(t_len * h_len * w_len, c)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x [..., L, D]`` by per-position tables ``[L, D/2]``.

    Interleaved-pair convention (matches complex multiplication on
    ``x.view(complex)``, the Wan fp64 path ``modify_wan.py:110-116`` — done
    here in f32: TPU has no fp64 fast path and the tables are exact to f32).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_pairs = xf.reshape(*xf.shape[:-1], xf.shape[-1] // 2, 2)
    x_re, x_im = x_pairs[..., 0], x_pairs[..., 1]
    out_re = x_re * cos - x_im * sin
    out_im = x_re * sin + x_im * cos
    out = jnp.stack([out_re, out_im], axis=-1).reshape(xf.shape)
    return out.astype(dtype)


def deinterleave_perm(num_heads: int, head_dim: int) -> np.ndarray:
    """Static channel permutation mapping interleaved rotary pairs
    ``(0,1),(2,3),...`` to split halves ``(0..d/2-1 | d/2..d-1)`` within each
    head's channel slot of a packed ``[*, num_heads*head_dim]`` projection.

    Folding this permutation into the q/k projection weights (and the q/k
    norm scales) lets RoPE run in the rotate-half form (``apply_rope_half``)
    with no per-token pair interleaving.  Attention output is invariant: a
    common channel permutation of q and k leaves every q·k score unchanged
    (same set of products), and v is untouched — so no inverse permutation
    is needed anywhere downstream (the pooled ASA predictor pools over
    tokens, not channels, and is invariant for the same reason).
    """
    d = head_dim
    deint = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    return (np.arange(num_heads)[:, None] * d + deint[None, :]).reshape(-1)


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half RoPE on de-interleaved channels ``x [..., L, D]``.

    Numerically identical (same per-element products/sums) to ``apply_rope``
    on interleaved channels, provided ``x``'s channels were permuted by
    ``deinterleave_perm`` — pair ``(2i, 2i+1)`` becomes ``(i, i+D/2)`` and
    rotates by the same table angle ``i``.  The split-half form avoids the
    two lane-minor relayouts (``reshape -> [..., D/2, 2]`` and the stack
    back) that make the interleaved form ~5x the bandwidth bound on TPU —
    measured 7.3 -> 1.5 ms per Wan layer (q+k) on v5e.
    """
    dtype = x.dtype
    half = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    re, im = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([re * cos - im * sin, re * sin + im * cos], axis=-1)
    return out.astype(dtype)


class PermutedDense(nn.Module):
    """``nn.Dense`` with a static output-channel permutation folded into the
    kernel/bias at trace time.

    Parameter names, shapes, dtypes, and initializers match ``nn.Dense``
    exactly, so checkpoints and converters are layout-compatible — the
    permutation is purely an execution detail.  The fold costs one
    ``[in, out]`` weight gather per step (~9 MB for Wan-1.3B q/k: free)
    instead of a per-token activation gather.
    """

    features: int
    out_perm: Any  # static numpy index array (hash by id is fine: module-local)
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        perm = np.asarray(self.out_perm)
        y = x @ kernel[:, perm].astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias[perm].astype(self.dtype)
        return y


class PermutedLayerNorm(nn.Module):
    """LayerNorm over the last axis with statically permuted scale/bias
    (parameter layout matches ``nn.LayerNorm``); f32 internals.  Mean and
    variance are permutation-invariant, so this normalizes permuted inputs
    exactly as ``nn.LayerNorm`` normalizes unpermuted ones."""

    epsilon: float = 1e-6
    feature_perm: Any = None  # static numpy index array
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        n = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (n,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (n,), self.param_dtype)
        if self.feature_perm is not None:
            perm = np.asarray(self.feature_perm)
            scale, bias = scale[perm], bias[perm]
        return y * scale + bias


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """AdaLN modulation: x * (1 + scale) + shift (broadcast over tokens)."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def dense_attention_fn(q, k, v, **_):
    """Default attention: Pallas flash on TPU, reference math elsewhere."""
    from blade.kernels.block_sparse_attn import flash_attention
    from blade.kernels.ref_attention import dense_attention_with_lse

    if jax.default_backend() == "tpu":
        out, _ = flash_attention(q, k, v)
    else:
        out, _ = dense_attention_with_lse(q, k, v)
    return out
