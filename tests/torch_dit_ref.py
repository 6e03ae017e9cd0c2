"""Tiny torch reimplementations of the diffusers DiT module layouts
(WanTransformer3DModel / CogVideoXTransformer3DModel) used as converter
oracles: their ``state_dict()`` carries the exact key layout the
``blade.convert.dit_convert`` mappers expect, and their forward mirrors
the diffusers math, so ``flax(convert(sd)) == torch(sd)`` validates every
transpose / QK-norm / RoPE / AdaLN ordering numerically without network
access (diffusers itself is not installable here; torch is).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from blade.models.layers import rope_3d_tables


def sinusoidal(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
    )
    args = t.double()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1).float()


def apply_rope_torch(x, cos, sin):
    """Interleaved-pair rotation; x [B, H, L, D], tables [L, D/2]."""
    xf = x.float().view(*x.shape[:-1], x.shape[-1] // 2, 2)
    re, im = xf[..., 0], xf[..., 1]
    out_re = re * cos - im * sin
    out_im = re * sin + im * cos
    return torch.stack([out_re, out_im], dim=-1).view(x.shape)


def attention(q, k, v):
    s = torch.einsum("bhqd,bhkd->bhqk", q.float(), k.float())
    s = s / math.sqrt(q.shape[-1])
    p = torch.softmax(s, dim=-1)
    return torch.einsum("bhqk,bhkd->bhqd", p, v.float())


class _RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return x.float() * torch.rsqrt(var + self.eps) * self.weight


class _WanAttention(nn.Module):
    def __init__(self, dim, heads, img_tokens=0):
        super().__init__()
        self.heads, self.dim = heads, dim
        self.img_tokens = img_tokens
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.norm_q = _RMSNorm(dim)
        self.norm_k = _RMSNorm(dim)
        if img_tokens:
            # reference I2V branch (modify_wan.py:88-91,118-135)
            self.add_k_proj = nn.Linear(dim, dim)
            self.add_v_proj = nn.Linear(dim, dim)
            self.norm_added_k = _RMSNorm(dim)
        else:
            self.add_k_proj = None

    def _heads(self, t):
        b, l, _ = t.shape
        return t.view(b, l, self.heads, -1).transpose(1, 2)

    def forward(self, x, context=None, rope=None):
        ctx = x if context is None else context
        ctx_img = None
        if context is not None and self.add_k_proj is not None:
            ctx_img = ctx[:, : self.img_tokens]
            ctx = ctx[:, self.img_tokens:]
        q = self.norm_q(self.to_q(x))
        k = self.norm_k(self.to_k(ctx))
        v = self.to_v(ctx)
        q, k, v = self._heads(q), self._heads(k), self._heads(v)
        if rope is not None:
            cos, sin = rope
            q = apply_rope_torch(q, cos, sin)
            k = apply_rope_torch(k, cos, sin)
        out = attention(q, k, v)
        if ctx_img is not None:
            k_img = self._heads(self.norm_added_k(self.add_k_proj(ctx_img)))
            v_img = self._heads(self.add_v_proj(ctx_img))
            out = out + attention(q, k_img, v_img)
        b, h, l, d = out.shape
        out = out.transpose(1, 2).reshape(b, l, h * d)
        return self.to_out[0](out)


class _WanBlock(nn.Module):
    def __init__(self, dim, ffn_dim, heads, eps=1e-6, img_tokens=0):
        super().__init__()
        self.scale_shift_table = nn.Parameter(torch.randn(1, 6, dim) * 0.02)
        self.attn1 = _WanAttention(dim, heads)
        self.attn2 = _WanAttention(dim, heads, img_tokens=img_tokens)
        self.norm2 = nn.LayerNorm(dim, eps=eps, elementwise_affine=True)
        self.ffn = nn.Module()
        self.ffn.net = nn.ModuleList()
        proj = nn.Module()
        proj.proj = nn.Linear(dim, ffn_dim)
        self.ffn.net.append(proj)
        self.ffn.net.append(nn.Identity())
        self.ffn.net.append(nn.Linear(ffn_dim, dim))
        self.eps = eps

    def forward(self, x, context, temb6, rope):
        e = (self.scale_shift_table + temb6).chunk(6, dim=1)
        shift1, scale1, gate1, shift2, scale2, gate2 = e
        ln = lambda t: F.layer_norm(t.float(), t.shape[-1:], eps=self.eps)
        h = ln(x) * (1 + scale1) + shift1
        x = x + gate1 * self.attn1(h, rope=rope)
        x = x + self.attn2(self.norm2(x.float()), context=context)
        h = ln(x) * (1 + scale2) + shift2
        h = self.ffn.net[2](F.gelu(self.ffn.net[0].proj(h), approximate="tanh"))
        return x + gate2 * h


class TorchWanRef(nn.Module):
    """diffusers WanTransformer3DModel layout, tiny."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        d = cfg.dim
        self.patch_embedding = nn.Conv3d(
            cfg.in_channels, d, kernel_size=cfg.patch_size,
            stride=cfg.patch_size,
        )
        ce = nn.Module()
        ce.text_embedder = nn.Module()
        ce.text_embedder.linear_1 = nn.Linear(cfg.text_dim, d)
        ce.text_embedder.linear_2 = nn.Linear(d, d)
        ce.time_embedder = nn.Module()
        ce.time_embedder.linear_1 = nn.Linear(cfg.freq_dim, d)
        ce.time_embedder.linear_2 = nn.Linear(d, d)
        ce.time_proj = nn.Linear(d, 6 * d)
        img_tokens = 0
        if getattr(cfg, "image_dim", None):
            # diffusers WanImageEmbedding: LN(in) -> Linear(in,in) -> GELU
            # -> Linear(in,dim) -> LN(dim)
            im = nn.Module()
            im.norm1 = nn.LayerNorm(cfg.image_dim, eps=1e-5)
            ff = nn.Module()
            proj = nn.Module()
            proj.proj = nn.Linear(cfg.image_dim, cfg.image_dim)
            ff.net = nn.ModuleList([proj, nn.GELU(), nn.Linear(cfg.image_dim, d)])
            im.ff = ff
            im.norm2 = nn.LayerNorm(d, eps=1e-5)
            ce.image_embedder = im
            img_tokens = cfg.image_context_tokens
        self.condition_embedder = ce
        self.blocks = nn.ModuleList([
            _WanBlock(d, cfg.ffn_dim, cfg.num_heads, cfg.eps,
                      img_tokens=img_tokens)
            for _ in range(cfg.num_layers)
        ])
        self.scale_shift_table = nn.Parameter(torch.randn(1, 2, d) * 0.02)
        self.proj_out = nn.Linear(
            d, int(np.prod(cfg.patch_size)) * cfg.out_channels
        )

    def forward(self, latents, timestep, text, image_embeds=None):
        c = self.cfg
        b, _, t, h, w = latents.shape
        pt, ph, pw = c.patch_size
        gt, gh, gw = t // pt, h // ph, w // pw
        x = self.patch_embedding(latents)  # [B, d, gt, gh, gw]
        x = x.flatten(2).transpose(1, 2)  # [B, L, d], t-major
        ce = self.condition_embedder
        ctx = ce.text_embedder.linear_2(
            F.gelu(ce.text_embedder.linear_1(text), approximate="tanh"))
        if image_embeds is not None:
            im = ce.image_embedder
            ie = im.norm1(image_embeds.float())
            ie = im.ff.net[2](F.gelu(im.ff.net[0].proj(ie)))
            ie = im.norm2(ie)
            ctx = torch.cat([ie, ctx], dim=1)
        temb = ce.time_embedder.linear_2(
            F.silu(ce.time_embedder.linear_1(sinusoidal(timestep, c.freq_dim))))
        temb6 = ce.time_proj(F.silu(temb)).view(b, 6, c.dim)
        cos, sin = rope_3d_tables(c.head_dim, (gt, gh, gw))
        rope = (torch.from_numpy(cos), torch.from_numpy(sin))
        for blk in self.blocks:
            x = blk(x, ctx, temb6, rope)
        e = (self.scale_shift_table + temb.unsqueeze(1)).chunk(2, dim=1)
        shift, scale = e
        x = F.layer_norm(x.float(), x.shape[-1:], eps=c.eps)
        x = x * (1 + scale) + shift
        x = self.proj_out(x)
        x = x.reshape(b, gt, gh, gw, pt, ph, pw, c.out_channels)
        x = x.permute(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(b, c.out_channels, t, h, w)


class _CogLayerNormZero(nn.Module):
    def __init__(self, time_dim, dim, eps):
        super().__init__()
        self.linear = nn.Linear(time_dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, eps=eps, elementwise_affine=True)

    def forward(self, hidden, enc, temb):
        mod = self.linear(F.silu(temb))
        shift, scale, gate, e_shift, e_scale, e_gate = mod.chunk(6, dim=1)
        h = self.norm(hidden) * (1 + scale[:, None]) + shift[:, None]
        e = self.norm(enc) * (1 + e_scale[:, None]) + e_shift[:, None]
        return h, e, gate[:, None], e_gate[:, None]


class _CogAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        hd = dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.norm_q = nn.LayerNorm(hd, eps=1e-6)
        self.norm_k = nn.LayerNorm(hd, eps=1e-6)

    def forward(self, hidden, enc, rope):
        x = torch.cat([enc, hidden], dim=1)
        text_len = enc.shape[1]
        b, l, _ = x.shape
        hds = lambda t: t.view(b, l, self.heads, -1).transpose(1, 2)
        q = self.norm_q(hds(self.to_q(x)).float())
        k = self.norm_k(hds(self.to_k(x)).float())
        v = hds(self.to_v(x))
        cos, sin = rope
        q = torch.cat(
            [q[:, :, :text_len], apply_rope_torch(q[:, :, text_len:], cos, sin)],
            dim=2)
        k = torch.cat(
            [k[:, :, :text_len], apply_rope_torch(k[:, :, text_len:], cos, sin)],
            dim=2)
        out = attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, l, -1)
        out = self.to_out[0](out)
        return out[:, text_len:], out[:, :text_len]


class _CogBlock(nn.Module):
    def __init__(self, dim, time_dim, heads, ffn_mult, eps):
        super().__init__()
        self.norm1 = _CogLayerNormZero(time_dim, dim, eps)
        self.norm2 = _CogLayerNormZero(time_dim, dim, eps)
        self.attn1 = _CogAttention(dim, heads)
        self.ff = nn.Module()
        self.ff.net = nn.ModuleList()
        proj = nn.Module()
        proj.proj = nn.Linear(dim, ffn_mult * dim)
        self.ff.net.append(proj)
        self.ff.net.append(nn.Identity())
        self.ff.net.append(nn.Linear(ffn_mult * dim, dim))

    def forward(self, hidden, enc, temb, rope):
        text_len = enc.shape[1]
        nh, ne, gate, e_gate = self.norm1(hidden, enc, temb)
        ah, ae = self.attn1(nh, ne, rope)
        hidden = hidden + gate * ah
        enc = enc + e_gate * ae
        nh, ne, gate, e_gate = self.norm2(hidden, enc, temb)
        joint = torch.cat([ne, nh], dim=1)
        ff = self.ff.net[2](
            F.gelu(self.ff.net[0].proj(joint), approximate="tanh"))
        hidden = hidden + gate * ff[:, text_len:]
        enc = enc + e_gate * ff[:, :text_len]
        return hidden, enc


class TorchCogRef(nn.Module):
    """diffusers CogVideoXTransformer3DModel layout, tiny."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        d = cfg.dim
        pe = nn.Module()
        pe.proj = nn.Conv2d(cfg.in_channels, d, kernel_size=cfg.patch_size,
                            stride=cfg.patch_size)
        pe.text_proj = nn.Linear(cfg.text_embed_dim, d)
        self.patch_embed = pe
        te = nn.Module()
        te.linear_1 = nn.Linear(d, cfg.time_embed_dim)
        te.linear_2 = nn.Linear(cfg.time_embed_dim, cfg.time_embed_dim)
        self.time_embedding = te
        self.transformer_blocks = nn.ModuleList([
            _CogBlock(d, cfg.time_embed_dim, cfg.num_heads, cfg.ffn_mult,
                      cfg.eps)
            for _ in range(cfg.num_layers)
        ])
        self.norm_final = nn.LayerNorm(d, eps=cfg.eps)
        no = nn.Module()
        no.linear = nn.Linear(cfg.time_embed_dim, 2 * d)
        no.norm = nn.LayerNorm(d, eps=cfg.eps)
        self.norm_out = no
        self.proj_out = nn.Linear(d, cfg.patch_size ** 2 * cfg.out_channels)

    def forward(self, latents, timestep, text):
        c = self.cfg
        b, t, ch, h, w = latents.shape
        p = c.patch_size
        gh, gw = h // p, w // p
        x = self.patch_embed.proj(latents.reshape(b * t, ch, h, w))
        x = x.flatten(2).transpose(1, 2).reshape(b, t * gh * gw, c.dim)
        enc = self.patch_embed.text_proj(text)
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(sinusoidal(timestep, c.dim))))
        cos, sin = rope_3d_tables(c.head_dim, (t, gh, gw),
                                  dims_thw=c.rope_dims)
        rope = (torch.from_numpy(cos), torch.from_numpy(sin))
        hidden = x
        for blk in self.transformer_blocks:
            hidden, enc = blk(hidden, enc, temb, rope)
        joint = self.norm_final(torch.cat([enc, hidden], dim=1))
        hidden = joint[:, enc.shape[1]:]
        mod = self.norm_out.linear(F.silu(temb))
        shift, scale = mod.chunk(2, dim=1)
        hidden = self.norm_out.norm(hidden) * (1 + scale[:, None]) \
            + shift[:, None]
        out = self.proj_out(hidden)
        # diffusers: channel-major feature order (..., C, p, p)
        out = out.reshape(b, t, gh, gw, c.out_channels, p, p)
        out = out.permute(0, 1, 4, 2, 5, 3, 6)
        return out.reshape(b, t, c.out_channels, h, w)
