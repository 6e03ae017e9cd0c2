"""Wan2.1 text-to-video diffusion transformer (Flax).

Architecture parity with ``diffusers.WanTransformer3DModel`` /
Wan2.1-T2V-1.3B as consumed by the reference (``wanx/train/modify_wan.py``,
``wanx/train/train_wanx_tdm.py``): patchify (1,2,2) conv, per-block
(modulation-table + time-projection) AdaLN with 6 params, video-only
self-attention with 3-D RoPE and RMS QK-norm, text cross-attention
(UMT5 features), GELU FFN, modulated head.

TPU-first details:
  * blocks run under ``nn.scan`` by default (``scan_layers=True``): the
    transformer compiles ONE block regardless of depth — the 30-layer
    unrolled graph otherwise takes tens of minutes of XLA compile time —
    with per-layer parameters stacked on a leading axis;
  * ``remat=True`` wraps the scanned block in ``nn.remat`` (activation
    rematerialization, the ``jax.checkpoint`` memory/compute trade);
  * the self-attention function is pluggable (``attention_fn``) so the same
    module runs dense or ASA block-sparse — the TPU equivalent of the
    reference's processor swap (``set_adaptive_block_sparse_attn_wanx``,
    ``modify_wan.py:150-168``).

Flow matching: the model output is the velocity.
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
    RMSNorm,
    TimestepEmbedder,
    apply_rope_half,  # noqa: F401 — re-exported for tests/adapters
    deinterleave_perm,
    dense_attention_fn,
    rope_3d_tables,
)
from blade.kernels.norm_rope import norm_rope_heads

__all__ = ["WanConfig", "WanModel", "WAN_1_3B", "WAN_14B", "WAN_TINY"]


@dataclasses.dataclass(frozen=True)
class WanConfig:
    dim: int = 1536
    ffn_dim: int = 8960
    num_layers: int = 30
    num_heads: int = 12
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    eps: float = 1e-6
    cross_attn_norm: bool = True
    # I2V variant: CLIP image-context features of this dim are projected
    # and prepended to the text context; cross-attention runs a separate
    # image branch through added K/V projections (reference
    # modify_wan.py:88-91,118-135; diffusers Wan I2V `added_kv_proj_dim`).
    # None = T2V (no image branch).
    image_dim: Optional[int] = None
    image_context_tokens: int = 257
    # Fused Pallas norm+RoPE pass (kernels/norm_rope.py).  Set False for
    # tp-sharded deployments: GSPMD cannot partition the pallas_call, so
    # with to_q/to_k outputs sharded on the feature dim it would all-gather
    # q/k and replicate the norm+rope work per tp shard (ADVICE r4); the
    # XLA composition shards cleanly.  Single-chip serving keeps it on.
    fused_norm_rope: bool = True

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


WAN_1_3B = WanConfig()
WAN_14B = WanConfig(dim=5120, ffn_dim=13824, num_layers=40, num_heads=40)
# CPU-testable toy config
WAN_TINY = WanConfig(dim=128, ffn_dim=256, num_layers=2, num_heads=2, text_dim=64,
                     freq_dim=32)


class WanSelfAttention(nn.Module):
    cfg: WanConfig
    dtype: Any = jnp.bfloat16
    attention_fn: Callable = dense_attention_fn

    @nn.compact
    def __call__(self, x, rope_cos, rope_sin, attn_kwargs):
        c = self.cfg
        dense = lambda name: nn.Dense(
            c.dim, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        # q/k run with a de-interleave channel permutation folded into the
        # projection weights + norm scales (trace-time; checkpoint layout
        # unchanged) so RoPE takes the relayout-free rotate-half form.
        # Attention is invariant to a common q/k channel permutation, so
        # nothing downstream unpermutes (see layers.deinterleave_perm).
        perm = tuple(deinterleave_perm(c.num_heads, c.head_dim).tolist())
        pdense = lambda name: PermutedDense(
            c.dim, out_perm=perm, dtype=self.dtype, name=name
        )
        qp = pdense("to_q")(x)
        kp = pdense("to_k")(x)
        # Norm + head split + RoPE run as ONE Pallas bandwidth pass
        # (kernels/norm_rope.py): the unfused lane costs 4.5 ms/layer of
        # relayout/elementwise traffic at 480p on top of the 1.5 ms
        # projections.  The RMSNorm modules only contribute their scale
        # param here (checkpoint path unchanged).
        sq = RMSNorm(eps=c.eps, feature_perm=perm, name="norm_q")(
            qp, scale_only=True
        )
        sk = RMSNorm(eps=c.eps, feature_perm=perm, name="norm_k")(
            kp, scale_only=True
        )
        q = norm_rope_heads(qp, sq, rope_cos, rope_sin, c.num_heads,
                            eps=c.eps, fused=c.fused_norm_rope)
        k = norm_rope_heads(kp, sk, rope_cos, rope_sin, c.num_heads,
                            eps=c.eps, fused=c.fused_norm_rope)
        # v's head transpose (and the output inverse below) stay in XLA: they
        # sit adjacent to matmuls, which absorb pure relayouts for free —
        # dedicated Pallas copies measured ~2x SLOWER (scripts/
        # profile_qk_lane.py: pack 0.45 XLA vs 0.87, unpack 0.55 vs 1.16 ms).
        b, l, _ = x.shape
        v = (
            dense("to_v")(x)
            .reshape(b, l, c.num_heads, c.head_dim)
            .transpose(0, 2, 1, 3)
        )
        out = self.attention_fn(q, k, v, **attn_kwargs)
        if isinstance(out, tuple):
            # attention_fn collected an aux (e.g. the ASA mask for
            # cross-step reuse): expose it via the intermediates collection
            # (stacked over layers by nn.scan).
            out, aux = out
            self.sow("intermediates", "attn_aux", aux)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, c.dim).astype(self.dtype)
        return dense("to_out")(out)


class WanCrossAttention(nn.Module):
    """Text cross-attention; with ``cfg.image_dim`` set, ``context`` is
    ``[B, image_context_tokens + Lt, dim]`` (image features first) and a
    separate image branch runs through added K/V projections, summed with
    the text branch before the output projection — the reference I2V
    semantics (modify_wan.py:88-91 split, :118-135 image branch + add)."""

    cfg: WanConfig
    dtype: Any = jnp.bfloat16

    def _mha(self, q, k, v, b, l):
        c = self.cfg
        # Context length is tiny (<=512 text / 257 image): plain fused
        # attention is MXU-optimal.
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) / jnp.sqrt(jnp.float32(c.head_dim))
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        return out.transpose(0, 2, 1, 3).reshape(b, l, c.dim).astype(self.dtype)

    @nn.compact
    def __call__(self, x, context):
        c = self.cfg
        b, l, _ = x.shape
        dense = lambda name: nn.Dense(
            c.dim, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )

        def heads(t):
            return t.reshape(b, t.shape[1], c.num_heads, c.head_dim
                             ).transpose(0, 2, 1, 3)

        img = None
        if c.image_dim is not None:
            img = context[:, : c.image_context_tokens]
            context = context[:, c.image_context_tokens:]

        q = heads(RMSNorm(eps=c.eps, name="norm_q")(dense("to_q")(x)))
        k = heads(RMSNorm(eps=c.eps, name="norm_k")(dense("to_k")(context)))
        v = heads(dense("to_v")(context))
        out = self._mha(q, k, v, b, l)
        if img is not None:
            k_img = heads(RMSNorm(eps=c.eps, name="norm_added_k")(
                dense("add_k_proj")(img)))
            v_img = heads(dense("add_v_proj")(img))
            out = out + self._mha(q, k_img, v_img, b, l)
        return dense("to_out")(out)


class WanBlock(nn.Module):
    cfg: WanConfig
    dtype: Any = jnp.bfloat16
    attention_fn: Callable = dense_attention_fn

    @nn.compact
    def __call__(self, x, layer_idx, context, temb6, rope_cos, rope_sin,
                 attn_kwargs):
        c = self.cfg
        attn_kwargs = dict(attn_kwargs, layer_index=layer_idx)
        # Per-block learned modulation table added to the shared time
        # projection (Wan's `modulation` parameter).
        table = self.param(
            "modulation", nn.initializers.normal(0.02), (1, 6, c.dim), jnp.float32
        )
        e = (table + temb6).astype(jnp.float32)  # [B, 6, dim]
        shift1, scale1, gate1, shift2, scale2, gate2 = [
            e[:, i][:, None, :] for i in range(6)
        ]

        ln = lambda name=None: nn.LayerNorm(
            epsilon=c.eps, use_bias=False, use_scale=False, dtype=jnp.float32,
            name=name,
        )
        h = ln()(x).astype(jnp.float32) * (1 + scale1) + shift1
        attn = WanSelfAttention(c, self.dtype, self.attention_fn, name="attn1")(
            h.astype(self.dtype), rope_cos, rope_sin, attn_kwargs
        )
        x = x + (gate1 * attn.astype(jnp.float32)).astype(x.dtype)

        norm_x = (
            nn.LayerNorm(epsilon=c.eps, use_bias=True, use_scale=True,
                         dtype=jnp.float32, name="norm3")(x)
            if c.cross_attn_norm
            else x
        )
        attn2 = WanCrossAttention(c, self.dtype, name="attn2")(
            norm_x.astype(self.dtype), context
        )
        x = x + attn2.astype(x.dtype)

        h = ln()(x).astype(jnp.float32) * (1 + scale2) + shift2
        ffn = FeedForward(c.ffn_dim, dtype=self.dtype, name="ffn")(h.astype(self.dtype))
        x = x + (gate2 * ffn.astype(jnp.float32)).astype(x.dtype)
        return x, None


class WanModel(nn.Module):
    """Wan DiT over latent video ``[B, C, T, H, W]`` -> velocity prediction.

    ``attention_fn(q, k, v, **attn_kwargs) -> out`` is called for every
    block's self-attention with ``[B, H, L, D]`` tensors in token order
    ``(t, h, w)`` flattened t-major (w fastest — the Gilbert permutation in
    ``blade.attention`` uses the same convention).
    """

    cfg: WanConfig
    dtype: Any = jnp.bfloat16
    attention_fn: Callable = dense_attention_fn
    scan_layers: bool = True
    remat: bool = False
    # (perm, inv) numpy index arrays over the token grid: tokens are
    # permuted ONCE after patchify (and un-permuted once before the head,
    # on the small proj_out features) instead of 4x per attention call —
    # RoPE tables are permuted statically for free.  Pair with
    # ``ASAConfig.pre_arranged``; every other Wan component (LayerNorm,
    # FFN, modulation broadcast, cross-attention queries) is token-order
    # agnostic, so this is exact.
    token_perm: Optional[Tuple[Any, Any]] = None

    @nn.compact
    def __call__(self, latents, timestep, text_embeds, attn_kwargs=None,
                 image_embeds=None):
        c = self.cfg
        attn_kwargs = attn_kwargs or {}
        if (image_embeds is None) != (c.image_dim is None):
            raise ValueError(
                "image_embeds must be provided iff cfg.image_dim is set "
                f"(got image_embeds={image_embeds is not None}, "
                f"image_dim={c.image_dim})")
        b, ch, t, h, w = latents.shape
        pt, ph, pw = c.patch_size
        gt, gh, gw = t // pt, h // ph, w // pw

        # Patchify: Conv3D k=s=(1,2,2)  -> tokens (t, h, w) flattened t-major.
        x = jnp.transpose(latents, (0, 2, 3, 4, 1))  # [B, T, H, W, C]
        x = nn.Conv(
            c.dim, kernel_size=c.patch_size, strides=c.patch_size,
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embedding",
        )(x.astype(self.dtype))
        x = x.reshape(b, gt * gh * gw, c.dim)

        # Text projection (UMT5 features -> dim).
        ctx = nn.Dense(c.dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="text_proj_1")(text_embeds.astype(self.dtype))
        ctx = nn.gelu(ctx, approximate=True)
        ctx = nn.Dense(c.dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="text_proj_2")(ctx)
        if image_embeds is not None:
            # WanImageEmbedding (diffusers condition_embedder.image_embedder):
            # LayerNorm(in) -> Linear(in,in) -> exact GELU -> Linear(in,dim)
            # -> LayerNorm(dim), all f32; projected image tokens are
            # PREPENDED to the text context (modify_wan.py:89 takes
            # context[:, :257] as the image part).
            ie = image_embeds.astype(jnp.float32)
            ie = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="img_norm1")(ie)
            ie = nn.Dense(c.image_dim, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="img_ff_1")(ie)
            ie = nn.gelu(ie, approximate=False)
            ie = nn.Dense(c.dim, dtype=jnp.float32, param_dtype=jnp.float32,
                          name="img_ff_2")(ie)
            ie = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              name="img_norm2")(ie)
            ctx = jnp.concatenate([ie.astype(self.dtype), ctx], axis=1)

        # Time embedding + shared 6-way projection.
        temb = TimestepEmbedder(c.dim, freq_dim=c.freq_dim, name="time_embed")(
            timestep
        )  # [B, dim] f32
        temb6 = nn.Dense(6 * c.dim, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="time_projection")(nn.silu(temb))
        temb6 = temb6.reshape(b, 6, c.dim)

        cos, sin = rope_3d_tables(c.head_dim, (gt, gh, gw))
        if self.token_perm is not None:
            perm, _inv = self.token_perm
            x = jnp.take(x, jnp.asarray(perm), axis=1)
            cos, sin = cos[perm], sin[perm]  # static numpy permute (free)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)

        block_cls = WanBlock
        if self.remat:
            block_cls = nn.remat(block_cls, prevent_cse=False)
        layer_ids = jnp.arange(c.num_layers)
        if self.scan_layers:
            scan_blocks = nn.scan(
                block_cls,
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True},
                in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast,
                         nn.broadcast, nn.broadcast),
                length=c.num_layers,
            )
            x, _ = scan_blocks(c, self.dtype, self.attention_fn, name="blocks")(
                x, layer_ids, ctx, temb6, cos, sin, attn_kwargs
            )
        else:
            for i in range(c.num_layers):
                x, _ = block_cls(c, self.dtype, self.attention_fn,
                                 name=f"blocks_{i}")(
                    x, layer_ids[i], ctx, temb6, cos, sin, attn_kwargs
                )

        # Head: 2-way modulation from temb, then projection to patches.
        head_table = self.param(
            "head_modulation", nn.initializers.normal(0.02), (1, 2, c.dim),
            jnp.float32,
        )
        e = (head_table + temb[:, None, :]).astype(jnp.float32)
        shift, scale = e[:, 0][:, None, :], e[:, 1][:, None, :]
        xh = nn.LayerNorm(epsilon=c.eps, use_bias=False, use_scale=False,
                          dtype=jnp.float32, name="norm_out")(x)
        xh = xh * (1 + scale) + shift
        out = nn.Dense(
            pt * ph * pw * c.out_channels, dtype=jnp.float32,
            param_dtype=jnp.float32, name="proj_out",
        )(xh.astype(self.dtype))
        if self.token_perm is not None:
            # Un-permute on the head output: 24x fewer features than dim.
            out = jnp.take(out, jnp.asarray(self.token_perm[1]), axis=1)

        # Unpatchify back to [B, C, T, H, W].
        out = out.reshape(b, gt, gh, gw, pt, ph, pw, c.out_channels)
        out = jnp.einsum("bthwpqrc->bctphqwr", out).reshape(b, c.out_channels, t, h, w)
        return out
