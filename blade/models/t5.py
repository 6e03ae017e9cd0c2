"""T5 / UMT5 text encoder (Flax) — the prompt-embedding models.

The reference uses HF ``T5EncoderModel`` (t5-v1_1-xxl for CogVideoX) and
UMT5-xxl (Wan) to precompute prompt embeddings offline
(``utils/process_prompts_cogvideox.py``); at 4.7B params the encoder runs
on-device in bf16 here so the whole text-to-video path stays in HBM
(BASELINE north star).

Covers both variants: T5 v1.1 (relative-position bias owned by the first
layer and shared) and UMT5 (per-layer bias tables) — gated-GELU FFN,
RMSNorm pre-norm, unscaled attention logits (T5 folds the 1/sqrt(d) into
initialization).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from blade.models.layers import RMSNorm

__all__ = ["T5Config", "T5Encoder", "T5_XXL", "UMT5_XXL", "T5_TINY"]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_buckets: int = 32
    relative_max_distance: int = 128
    per_layer_bias: bool = False  # True for UMT5
    eps: float = 1e-6


T5_XXL = T5Config()
UMT5_XXL = T5Config(vocab_size=256384, per_layer_bias=True)
T5_TINY = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4)


def relative_position_bucket(
    relative_position: jnp.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> jnp.ndarray:
    """Bidirectional T5 bucketing of (key_pos - query_pos)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_bias: bool
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask, pos_bias):
        c = self.cfg
        b, l, _ = x.shape
        inner = c.num_heads * c.d_kv
        dense = lambda name: nn.Dense(
            inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        q = dense("q")(x).reshape(b, l, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        k = dense("k")(x).reshape(b, l, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        v = dense("v")(x).reshape(b, l, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)

        if self.has_bias:
            table = self.param(
                "rel_bias", nn.initializers.normal(1.0),
                (c.relative_buckets, c.num_heads), jnp.float32,
            )
            pos = jnp.arange(l)
            buckets = relative_position_bucket(
                pos[None, :] - pos[:, None], c.relative_buckets,
                c.relative_max_distance,
            )
            pos_bias = table[buckets].transpose(2, 0, 1)[None]  # [1, H, L, L]

        # T5 attention is unscaled (scale folded into init).
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        )
        if pos_bias is not None:
            s = s + pos_bias
        if mask is not None:
            s = jnp.where(mask[:, None, None, :], s, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        out = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="o")(out)
        return out, pos_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_bias: bool
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask, pos_bias):
        c = self.cfg
        h = RMSNorm(eps=c.eps, name="norm_attn")(x)
        attn, pos_bias = T5Attention(c, self.has_bias, self.dtype, name="attn")(
            h, mask, pos_bias
        )
        x = x + attn
        h = RMSNorm(eps=c.eps, name="norm_ff")(x)
        wi0 = nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="wi_0")(h)
        wi1 = nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="wi_1")(h)
        ff = nn.gelu(wi0, approximate=True) * wi1
        ff = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="wo")(ff)
        return x + ff, pos_bias


class T5Encoder(nn.Module):
    cfg: T5Config
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        """[B, L] int tokens -> [B, L, d_model] features."""
        c = self.cfg
        emb = nn.Embed(c.vocab_size, c.d_model, dtype=self.dtype,
                       param_dtype=jnp.float32, name="embed")(input_ids)
        mask = attention_mask.astype(bool) if attention_mask is not None else None
        x = emb
        pos_bias = None
        for i in range(c.num_layers):
            has_bias = c.per_layer_bias or i == 0
            x, pos_bias = T5Block(c, has_bias, self.dtype, name=f"block_{i}")(
                x, mask, pos_bias
            )
            if c.per_layer_bias:
                pos_bias = None  # each layer recomputes its own table
        x = RMSNorm(eps=c.eps, name="final_norm")(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x
