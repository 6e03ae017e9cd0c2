"""CogVideoX diffusion transformer (Flax).

Architecture parity with ``diffusers.CogVideoXTransformer3DModel``
(CogVideoX-5B: 42 blocks, dim 3072, 48 heads x 64, joint text+video
self-attention, LayerNormZero AdaLN, QK layer-norm, 3-D RoPE on the video
segment only) as consumed by the reference
(``cogvideox/train/modify_cogvideo.py``, ``train_cogvideo_tdm.py``).

Latent layout follows the reference trainer: ``[B, T, C, H, W]`` (frames
first, ``train_cogvideo_tdm.py:1605``).  The model is a v-prediction net.

Joint attention token order is ``[text, video]`` (diffusers convention);
the pluggable ``attention_fn`` receives the concatenated sequence, matching
the reference processor (``SageAttnCogVideoXAttnProcessor.__call__``), and
the ASA wrapper internally moves text behind video for block alignment.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from blade.models.layers import (
    FeedForward,
    PermutedDense,
    PermutedLayerNorm,
    TimestepEmbedder,
    apply_rope_half,
    deinterleave_perm,
    dense_attention_fn,
    rope_3d_tables,
    sinusoidal_timestep_embedding,
)

__all__ = ["CogVideoXConfig", "CogVideoXModel", "COGVIDEOX_5B", "COGVIDEOX_2B",
           "COGVIDEOX_TINY"]


@dataclasses.dataclass(frozen=True)
class CogVideoXConfig:
    dim: int = 3072
    num_heads: int = 48
    num_layers: int = 42
    in_channels: int = 16
    out_channels: int = 16
    text_embed_dim: int = 4096
    time_embed_dim: int = 512
    patch_size: int = 2
    ffn_mult: int = 4
    eps: float = 1e-5
    rope_dims: Tuple[int, int, int] = (16, 24, 24)  # (t, h, w) of head_dim 64

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


COGVIDEOX_5B = CogVideoXConfig()
COGVIDEOX_2B = CogVideoXConfig(dim=1920, num_heads=30, num_layers=30)
COGVIDEOX_TINY = CogVideoXConfig(
    dim=128, num_heads=2, num_layers=2, text_embed_dim=64, time_embed_dim=64,
    rope_dims=(16, 24, 24),
)


class LayerNormZero(nn.Module):
    """CogVideoX AdaLN: one affine LayerNorm shared by text and video, with
    6-way (shift/scale/gate x {video, text}) modulation from the time emb."""

    dim: int
    eps: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden, enc, temb):
        mod = nn.Dense(6 * self.dim, dtype=jnp.float32, param_dtype=jnp.float32,
                       name="linear")(nn.silu(temb.astype(jnp.float32)))
        shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(mod, 6, axis=-1)
        norm = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32, name="norm")
        h = norm(hidden) * (1 + scale[:, None]) + shift[:, None]
        e = norm(enc) * (1 + e_scale[:, None]) + e_shift[:, None]
        return (
            h.astype(self.dtype),
            e.astype(self.dtype),
            gate[:, None],
            e_gate[:, None],
        )


class CogJointAttention(nn.Module):
    """Joint [text, video] self-attention with QK layer-norm and video RoPE.

    ``text_last=True`` concatenates ``[video, text]`` instead — used with
    model-level gilbert arrangement so the ASA path sees 128-block-aligned
    video tokens first without a per-call text move (the reference moves
    text behind video inside every attention call)."""

    cfg: CogVideoXConfig
    dtype: Any = jnp.bfloat16
    attention_fn: Callable = dense_attention_fn
    text_last: bool = False

    @nn.compact
    def __call__(self, hidden, enc, rope_cos, rope_sin, attn_kwargs):
        c = self.cfg
        text_len = enc.shape[1]
        if self.text_last:
            x = jnp.concatenate([hidden, enc], axis=1)
            vid = slice(0, hidden.shape[1])
        else:
            x = jnp.concatenate([enc, hidden], axis=1)
            vid = slice(text_len, None)
        b, l, _ = x.shape
        dense = lambda name: nn.Dense(
            c.dim, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        # q/k channels are de-interleaved via a trace-time weight fold so
        # video RoPE runs in the relayout-free rotate-half form; the per-head
        # LayerNorm scale/bias are permuted to match.  Attention (and the
        # pooled ASA predictor) is invariant to the common q/k channel
        # permutation — see layers.deinterleave_perm.
        perm = tuple(deinterleave_perm(c.num_heads, c.head_dim).tolist())
        hperm = tuple(deinterleave_perm(1, c.head_dim).tolist())
        pdense = lambda name: PermutedDense(
            c.dim, out_perm=perm, dtype=self.dtype, name=name
        )
        q, k, v = pdense("to_q")(x), pdense("to_k")(x), dense("to_v")(x)

        def heads(t):
            return t.reshape(b, l, c.num_heads, c.head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        qk_norm = lambda name: PermutedLayerNorm(
            epsilon=1e-6, feature_perm=hperm, name=name
        )
        q = qk_norm("norm_q")(q).astype(v.dtype)
        k = qk_norm("norm_k")(k).astype(v.dtype)
        # RoPE on the video segment only (reference modify_cogvideo.py:59-64).
        def rope_segment(t):
            t_vid = apply_rope_half(t[:, :, vid], rope_cos, rope_sin)
            if self.text_last:
                return jnp.concatenate([t_vid, t[:, :, hidden.shape[1]:]],
                                       axis=2)
            return jnp.concatenate([t[:, :, :text_len], t_vid], axis=2)

        q, k = rope_segment(q), rope_segment(k)

        out = self.attention_fn(q, k, v, **attn_kwargs)
        if isinstance(out, tuple):
            out, aux = out
            self.sow("intermediates", "attn_aux", aux)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, c.dim).astype(self.dtype)
        out = dense("to_out")(out)
        if self.text_last:
            return out[:, :hidden.shape[1]], out[:, hidden.shape[1]:]
        return out[:, text_len:], out[:, :text_len]


class CogVideoXBlock(nn.Module):
    cfg: CogVideoXConfig
    dtype: Any = jnp.bfloat16
    attention_fn: Callable = dense_attention_fn
    text_last: bool = False

    @nn.compact
    def __call__(self, carry, layer_idx, temb, rope_cos, rope_sin, attn_kwargs):
        hidden, enc = carry
        attn_kwargs = dict(attn_kwargs, layer_index=layer_idx)
        c = self.cfg
        text_len = enc.shape[1]
        n_h, n_e, gate, e_gate = LayerNormZero(c.dim, c.eps, self.dtype,
                                               name="norm1")(hidden, enc, temb)
        attn_h, attn_e = CogJointAttention(c, self.dtype, self.attention_fn,
                                           self.text_last, name="attn1")(
            n_h, n_e, rope_cos, rope_sin, attn_kwargs
        )
        hidden = hidden + (gate * attn_h.astype(jnp.float32)).astype(hidden.dtype)
        enc = enc + (e_gate * attn_e.astype(jnp.float32)).astype(enc.dtype)

        n_h, n_e, gate, e_gate = LayerNormZero(c.dim, c.eps, self.dtype,
                                               name="norm2")(hidden, enc, temb)
        ff = FeedForward(c.ffn_mult * c.dim, dtype=self.dtype, name="ff")(
            jnp.concatenate([n_e, n_h], axis=1)
        )
        hidden = hidden + (gate * ff[:, text_len:].astype(jnp.float32)).astype(
            hidden.dtype
        )
        enc = enc + (e_gate * ff[:, :text_len].astype(jnp.float32)).astype(enc.dtype)
        return (hidden, enc), None


class CogVideoXModel(nn.Module):
    """CogVideoX DiT: ``[B, T, C, H, W]`` latents + T5 text -> v-prediction."""

    cfg: CogVideoXConfig
    dtype: Any = jnp.bfloat16
    attention_fn: Callable = dense_attention_fn
    scan_layers: bool = True
    remat: bool = False
    # (perm, inv) over the video token grid: permute once after patchify
    # instead of 4x per attention call (pairs with ASAConfig.pre_arranged;
    # implies text_last — ASA sees [video_gilbert, text] directly).
    token_perm: Optional[Tuple[Any, Any]] = None

    @nn.compact
    def __call__(self, latents, timestep, text_embeds, attn_kwargs=None):
        c = self.cfg
        attn_kwargs = attn_kwargs or {}
        b, t, ch, h, w = latents.shape
        p = c.patch_size
        gh, gw = h // p, w // p

        # Per-frame 2D conv patchify (CogVideoXPatchEmbed).
        x = latents.reshape(b * t, ch, h, w).transpose(0, 2, 3, 1)
        x = nn.Conv(
            c.dim, kernel_size=(p, p), strides=(p, p), use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed",
        )(x.astype(self.dtype))
        x = x.reshape(b, t * gh * gw, c.dim)

        enc = nn.Dense(c.dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="text_proj")(text_embeds.astype(self.dtype))

        # Time embedding: sinusoidal(dim) -> MLP(time_embed_dim).
        temb = sinusoidal_timestep_embedding(timestep, c.dim)
        temb = nn.Dense(c.time_embed_dim, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="time_embed_1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(c.time_embed_dim, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="time_embed_2")(temb)

        cos, sin = rope_3d_tables(c.head_dim, (t, gh, gw), dims_thw=c.rope_dims)
        text_last = self.token_perm is not None
        if text_last:
            perm, _inv = self.token_perm
            x = jnp.take(x, jnp.asarray(perm), axis=1)
            cos, sin = cos[perm], sin[perm]  # static numpy permute (free)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)

        block_cls = CogVideoXBlock
        if self.remat:
            block_cls = nn.remat(block_cls, prevent_cse=False)
        layer_ids = jnp.arange(c.num_layers)
        if self.scan_layers:
            scan_blocks = nn.scan(
                block_cls,
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True},
                in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast,
                         nn.broadcast),
                length=c.num_layers,
            )
            (hidden, enc), _ = scan_blocks(
                c, self.dtype, self.attention_fn, text_last, name="blocks"
            )((x, enc), layer_ids, temb, cos, sin, attn_kwargs)
        else:
            hidden = x
            for i in range(c.num_layers):
                (hidden, enc), _ = block_cls(
                    c, self.dtype, self.attention_fn, text_last,
                    name=f"blocks_{i}",
                )((hidden, enc), layer_ids[i], temb, cos, sin, attn_kwargs)

        # Final: joint LayerNorm over [text, video], then AdaLN + projection.
        joint = jnp.concatenate([enc, hidden], axis=1)
        joint = nn.LayerNorm(epsilon=c.eps, dtype=jnp.float32, name="norm_final")(joint)
        hidden = joint[:, enc.shape[1]:]

        mod = nn.Dense(2 * c.dim, dtype=jnp.float32, param_dtype=jnp.float32,
                       name="norm_out_linear")(nn.silu(temb))
        shift, scale = jnp.split(mod, 2, axis=-1)
        hidden = nn.LayerNorm(epsilon=c.eps, dtype=jnp.float32, name="norm_out")(
            hidden
        ) * (1 + scale[:, None]) + shift[:, None]
        out = nn.Dense(p * p * c.out_channels, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="proj_out")(
            hidden.astype(self.dtype)
        )
        if text_last:
            # Un-permute on the small head output (p*p*C features << dim).
            out = jnp.take(out, jnp.asarray(self.token_perm[1]), axis=1)

        # Unpatchify to [B, T, C, H, W].  diffusers orders proj_out features
        # channel-major: reshape (..., C, p, p) — NOT (..., p, p, C) — so the
        # converter stays a pure transpose (transformer_cogvideox.forward's
        # `.reshape(b, t, h//p, w//p, -1, p, p).permute(0,1,4,2,5,3,6)`).
        out = out.reshape(b, t, gh, gw, c.out_channels, p, p)
        out = jnp.einsum("bthwcpq->btchpwq", out).reshape(b, t, c.out_channels, h, w)
        return out
