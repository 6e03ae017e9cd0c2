"""Wan2.1 causal video VAE — checkpoint-parity rebuild of diffusers'
``AutoencoderKLWan`` (the reference loads it in fp32:
``wanx/train/inference.py:33-38``; the trainer de-normalizes latents with
``vae.config.latents_mean/latents_std`` before decode:
``wanx/train/train_wanx_tdm.py:1822-1829``).

Module graph, parameter shapes, and math mirror the diffusers/Wan source
(RMS channel norms, zero-padded causal temporal convs, channel-halving
upsample convs, learned 2x temporal up/down convs with first-frame-special
handling) so ``blade/convert/vae_convert.py`` can map the HF state dict
1:1.  Layout is TPU-friendly ``[B, T, H, W, C]`` (features last).

Streaming: every temporal conv takes/returns an explicit cache of its last
``k_t - 1`` input frames, so ``decode`` can run latent-frame-by-frame with
bounded memory and *exact* equality to the whole-clip decode (the
``feat_cache`` mechanism of the original, as a pure function).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["WanVAEConfig", "WanVAE", "WAN21_VAE", "WAN21_VAE_TINY"]

# Published Wan2.1 per-channel latent statistics (vae/config.json of
# Wan-AI/Wan2.1-T2V-1.3B-Diffusers; applied as z * std + mean before decode).
WAN21_LATENTS_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
)
WAN21_LATENTS_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    in_channels: int = 3
    scaling_factor: float = 1.0
    latents_mean: Optional[Tuple[float, ...]] = WAN21_LATENTS_MEAN
    latents_std: Optional[Tuple[float, ...]] = WAN21_LATENTS_STD

    @property
    def latent_channels(self) -> int:
        return self.z_dim

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)

    @property
    def temporal_factor(self) -> int:
        return 2 ** sum(self.temporal_downsample)

    @property
    def encoder_dims(self) -> Tuple[int, ...]:
        return tuple(self.base_dim * m for m in (1,) + tuple(self.dim_mult))

    @property
    def decoder_dims(self) -> Tuple[int, ...]:
        mult = tuple(self.dim_mult)
        return tuple(self.base_dim * m for m in (mult[-1],) + mult[::-1])


WAN21_VAE = WanVAEConfig()
# Tiny variant for CPU tests (same topology, 2 stages, 1 temporal down).
WAN21_VAE_TINY = WanVAEConfig(
    base_dim=8, dim_mult=(1, 2), num_res_blocks=1,
    temporal_downsample=(True,), latents_mean=None, latents_std=None,
)


class WanRMSNorm(nn.Module):
    """channel RMS norm: ``F.normalize(x, dim=C) * sqrt(C) * gamma``."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        y = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(y * y, axis=-1, keepdims=True))
        y = y / jnp.maximum(norm, 1e-12) * np.sqrt(self.dim) * gamma
        return y.astype(x.dtype)


class WanCausalConv3d(nn.Module):
    """Causal 3-D conv: ``k_t - 1`` zero frames (or the cache) in front.

    Returns ``(y, new_cache)`` where new_cache holds the last ``k_t - 1``
    padded-input frames for exact streaming continuation.
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    pad_time: Optional[int] = None  # front zeros; default k_t - 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, tcache=None):
        kt, kh, kw = self.kernel
        pt = (kt - 1) if self.pad_time is None else self.pad_time
        if tcache is not None:
            x = jnp.concatenate([tcache.astype(x.dtype), x], axis=1)
        elif pt:
            b, _, h, w, c = x.shape
            x = jnp.concatenate(
                [jnp.zeros((b, pt, h, w, c), x.dtype), x], axis=1
            )
        new_cache = x[:, x.shape[1] - pt:] if pt else None
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)))
        y = nn.Conv(
            self.features, kernel_size=self.kernel, strides=self.strides,
            padding="VALID", dtype=self.dtype, param_dtype=jnp.float32,
            name="conv",
        )(x)
        return y, new_cache


class WanResidualBlock(nn.Module):
    in_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        cache = cache or {}
        out = {}
        h = WanRMSNorm(self.in_dim, name="norm1")(x)
        h, out["conv1"] = WanCausalConv3d(
            self.out_dim, dtype=self.dtype, name="conv1"
        )(nn.silu(h), cache.get("conv1"))
        h = WanRMSNorm(self.out_dim, name="norm2")(h)
        h, out["conv2"] = WanCausalConv3d(
            self.out_dim, dtype=self.dtype, name="conv2"
        )(nn.silu(h), cache.get("conv2"))
        if self.in_dim != self.out_dim:
            x, _ = WanCausalConv3d(
                self.out_dim, (1, 1, 1), dtype=self.dtype,
                name="conv_shortcut",
            )(x)
        return x + h, out


class WanAttentionBlock(nn.Module):
    """Single-head per-frame spatial self-attention (1x1-conv qkv/proj)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = WanRMSNorm(self.dim, name="norm")(x)
        y = y.reshape(b * t, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        s = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / np.sqrt(c)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bqk,bkc->bqc", p, v)
        o = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj")(o)
        return x + o.reshape(b, t, h, w, c)


def _upsample2x_spatial(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


class WanResample(nn.Module):
    """up/downsample stage; ``mode`` in {upsample2d, upsample3d,
    downsample2d, downsample3d}.

    upsample3d: learned time conv (C -> 2C, interleaved to 2x frames; the
    very first frame bypasses it — 'Rep' semantics of the original), then
    nearest 2x spatial + channel-halving conv.  downsample3d: zero-pad
    right/bottom + stride-2 spatial conv, then stride-2 time conv whose
    window starts at the first frame (frame 0 also passes through as-is).
    """

    dim: int
    mode: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        cache = cache or {}
        out = {}
        b = x.shape[0]

        if self.mode == "upsample3d":
            tc = WanCausalConv3d(
                self.dim * 2, (3, 1, 1), pad_time=2, dtype=self.dtype,
                name="time_conv",
            )

            def interleave(y):
                bb, tt, hh, ww, cc2 = y.shape
                y = y.reshape(bb, tt, hh, ww, 2, cc2 // 2)
                y = y.transpose(0, 1, 4, 2, 3, 5)
                return y.reshape(bb, 2 * tt, hh, ww, cc2 // 2)

            if "time_conv" not in cache:
                # Fresh stream: frame 0 is emitted once, untouched by the
                # time conv; later frames see zero (not frame-0) context.
                first, rest = x[:, :1], x[:, 1:]
                if rest.shape[1]:
                    y, out["time_conv"] = tc(rest, None)
                    x = jnp.concatenate([first, interleave(y)], axis=1)
                else:
                    x = first
                    _, out["time_conv"] = tc(
                        jnp.zeros_like(first), None
                    )  # materialize params + a zero cache
            else:
                y, out["time_conv"] = tc(x, cache.get("time_conv"))
                x = interleave(y)

        t = x.shape[1]
        if self.mode in ("upsample2d", "upsample3d"):
            x = _upsample2x_spatial(x)
            bt, tt, hh, ww, cc = x.shape
            y = nn.Conv(self.dim // 2, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name="resample_1")(
                x.reshape(b * t, hh, ww, cc)
            )
            x = y.reshape(b, t, hh, ww, self.dim // 2)
        elif self.mode in ("downsample2d", "downsample3d"):
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            bt, tt, hh, ww, cc = x.shape
            y = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding="VALID",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="resample_1")(x.reshape(b * t, hh, ww, cc))
            x = y.reshape(b, t, y.shape[1], y.shape[2], cc)

        if self.mode == "downsample3d":
            tc = WanCausalConv3d(
                self.dim, (3, 1, 1), strides=(2, 1, 1), pad_time=0,
                dtype=self.dtype, name="time_conv",
            )
            if "time_conv" not in cache:
                # Whole-clip / fresh: stride-2 windows start at frame 0;
                # frame 0 itself also passes through unsampled.
                first = x[:, :1]
                if x.shape[1] >= 3:
                    y, _ = tc(x, None)
                else:
                    _, _ = tc(jnp.zeros(
                        (b, 3) + x.shape[2:], x.dtype), None)
                    y = x[:, :0]
                out["time_conv"] = x[:, -1:]
                x = jnp.concatenate([first, y], axis=1)
            else:
                ctx = cache["time_conv"].astype(x.dtype)
                y, _ = tc(jnp.concatenate([ctx, x], axis=1), None)
                out["time_conv"] = x[:, -1:]
                x = y
        return x, out


class WanMidBlock(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        cache = cache or {}
        out = {}
        x, out["resnets_0"] = WanResidualBlock(
            self.dim, self.dim, self.dtype, name="resnets_0"
        )(x, cache.get("resnets_0"))
        x = WanAttentionBlock(self.dim, self.dtype, name="attentions_0")(x)
        x, out["resnets_1"] = WanResidualBlock(
            self.dim, self.dim, self.dtype, name="resnets_1"
        )(x, cache.get("resnets_1"))
        return x, out


class WanEncoder3d(nn.Module):
    cfg: WanVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        cache = cache or {}
        out = {}
        c = self.cfg
        dims = c.encoder_dims
        x, out["conv_in"] = WanCausalConv3d(
            dims[0], dtype=self.dtype, name="conv_in"
        )(x, cache.get("conv_in"))
        idx = 0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            d = in_dim
            for _ in range(c.num_res_blocks):
                key = f"down_blocks_{idx}"
                x, out[key] = WanResidualBlock(
                    d, out_dim, self.dtype, name=key
                )(x, cache.get(key))
                d = out_dim
                idx += 1
            if i != len(c.dim_mult) - 1:
                key = f"down_blocks_{idx}"
                mode = ("downsample3d" if c.temporal_downsample[i]
                        else "downsample2d")
                x, out[key] = WanResample(
                    out_dim, mode, self.dtype, name=key
                )(x, cache.get(key))
                idx += 1
        x, out["mid_block"] = WanMidBlock(
            dims[-1], self.dtype, name="mid_block"
        )(x, cache.get("mid_block"))
        x = WanRMSNorm(dims[-1], name="norm_out")(x)
        x, out["conv_out"] = WanCausalConv3d(
            2 * c.z_dim, dtype=self.dtype, name="conv_out"
        )(nn.silu(x), cache.get("conv_out"))
        return x, out


class WanUpBlock(nn.Module):
    in_dim: int
    out_dim: int
    num_res: int
    upsample_mode: Optional[str]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        cache = cache or {}
        out = {}
        d = self.in_dim
        for j in range(self.num_res):
            key = f"resnets_{j}"
            x, out[key] = WanResidualBlock(
                d, self.out_dim, self.dtype, name=key
            )(x, cache.get(key))
            d = self.out_dim
        if self.upsample_mode is not None:
            x, out["upsamplers_0"] = WanResample(
                self.out_dim, self.upsample_mode, self.dtype,
                name="upsamplers_0",
            )(x, cache.get("upsamplers_0"))
        return x, out


class WanDecoder3d(nn.Module):
    cfg: WanVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, cache=None):
        cache = cache or {}
        out = {}
        c = self.cfg
        dims = c.decoder_dims
        temporal_up = c.temporal_downsample[::-1]
        x, out["conv_in"] = WanCausalConv3d(
            dims[0], dtype=self.dtype, name="conv_in"
        )(z, cache.get("conv_in"))
        x, out["mid_block"] = WanMidBlock(
            dims[0], self.dtype, name="mid_block"
        )(x, cache.get("mid_block"))
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            if i > 0:
                in_dim = in_dim // 2  # the preceding upsample halved C
            mode = None
            if i != len(c.dim_mult) - 1:
                mode = "upsample3d" if temporal_up[i] else "upsample2d"
            key = f"up_blocks_{i}"
            x, out[key] = WanUpBlock(
                in_dim, out_dim, c.num_res_blocks + 1, mode, self.dtype,
                name=key,
            )(x, cache.get(key))
        x = WanRMSNorm(x.shape[-1], name="norm_out")(x)
        x, out["conv_out"] = WanCausalConv3d(
            c.in_channels, dtype=self.dtype, name="conv_out"
        )(nn.silu(x), cache.get("conv_out"))
        return x, out


class WanVAE(nn.Module):
    """AutoencoderKLWan parity module (encode/decode + streaming decode)."""

    cfg: WanVAEConfig = WAN21_VAE
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = WanEncoder3d(c, self.dtype)
        self.decoder = WanDecoder3d(c, self.dtype)
        self.quant_conv = WanCausalConv3d(
            2 * c.z_dim, (1, 1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = WanCausalConv3d(
            c.z_dim, (1, 1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def moments(self, video):
        """[B, T, H, W, 3] -> (mean, logvar) each [B, T', H', W', z]."""
        h, _ = self.encoder(video)
        m, _ = self.quant_conv(h)
        return jnp.split(m, 2, axis=-1)

    def encode(self, video, rng=None):
        mean, logvar = self.moments(video)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * jnp.clip(logvar, -30, 20))
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z):
        """[B, T', H', W', z] -> [B, T, H, W, 3] (raw; caller clips)."""
        z, _ = self.post_quant_conv(z)
        x, _ = self.decoder(z)
        return x

    def decode_with_cache(self, z, cache=None):
        """Streaming decode: latent chunk + carried conv caches -> frames.

        Exactly equals whole-clip ``decode`` when chunks are concatenated
        (frame 0 must be in the first chunk; pass ``cache=None`` there).
        """
        cache = cache or {}
        out = {}
        z, _ = self.post_quant_conv(z)
        x, out["decoder"] = self.decoder(z, cache.get("decoder"))
        return x, out

    def __call__(self, video, rng=None):
        return self.decode(self.encode(video, rng))


@functools.lru_cache(maxsize=16)
def _chunk_decoder(cfg: WanVAEConfig, dtype, chunk: int):
    """Process-cached jitted chunk decoder.

    Keyed on the (hashable, frozen) config rather than the module instance:
    a fresh ``jax.jit`` wrapper per ``streaming_decode`` call re-traces and
    re-compiles every chunk program on every decode — the e2e bench's warm
    'decode' measured 97.5 s of compiles around 6 s of actual compute.
    The chunk is sliced from the full latents INSIDE the program (static
    size, dynamic start) so the host loop dispatches no eager slice ops."""
    vae = WanVAE(cfg, dtype)

    def run(p, z, start, c):
        zz = jax.lax.dynamic_slice_in_dim(z, start, chunk, axis=1)
        return vae.apply(p, zz, c, method=vae.decode_with_cache)

    return jax.jit(run)


def streaming_decode(vae: WanVAE, params, z, *, chunk_latents: int = 1):
    """Memory-bounded decode: python loop over latent-frame chunks with
    exact conv-state carry (the original's ``feat_cache`` decode loop).

    The per-chunk decode is jitted (compiled once for the first chunk's
    cache=None variant, once for the steady-state variant) — 21 chunks of a
    480p clip reuse two programs instead of dispatching the conv stack
    op-by-op through the relay."""
    t = z.shape[1]
    cache = None
    pieces = []
    start = 0
    while start < t:
        end = min(start + chunk_latents, t)
        decode1 = _chunk_decoder(vae.cfg, vae.dtype, end - start)
        piece, cache = decode1(params, z, start, cache)
        pieces.append(piece)
        start = end
    return jnp.concatenate(pieces, axis=1)
