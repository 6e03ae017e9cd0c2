"""CogVideoX causal video VAE — checkpoint-parity rebuild of diffusers'
``AutoencoderKLCogVideoX`` (consumed by the reference at
``cogvideox/train/inference.py:48,54-55`` with slicing/tiling enabled).

Module graph and math mirror the diffusers source: repeat-first-frame
causal temporal convs, GroupNorm (full time-mixing within a chunk, as in
torch 5-D GroupNorm), decoder resnets normalized by ``SpatialNorm3D``
(GroupNorm modulated by the resized latent ``zq``), avg-pool temporal
downsample and nearest-repeat temporal upsample with odd-length
first-frame special-casing, and a plain (non-causal) 1x1x1 shortcut conv.
Layout is TPU-friendly ``[B, T, H, W, C]``.

Streaming: temporal convs take/return caches of their last ``k_t - 1``
input frames, so decode can run in 2-latent-frame chunks exactly like the
diffusers ``num_latent_frames_batch_size=2`` conv-cache decode (GroupNorm
statistics are then per-chunk, matching the reference pipeline's actual
numerics).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["CogVideoXVAEConfig", "CogVideoXVAE", "COGVIDEOX_VAE_FULL"]


@dataclasses.dataclass(frozen=True)
class CogVideoXVAEConfig:
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    latent_channels: int = 16
    norm_groups: int = 32
    temporal_compress_level: int = 2  # log2(temporal_compression_ratio)
    in_channels: int = 3
    scaling_factor: float = 1.15258426
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @property
    def temporal_factor(self) -> int:
        return 2 ** self.temporal_compress_level


COGVIDEOX_VAE_FULL = CogVideoXVAEConfig()
COGVIDEOX_VAE_TINY = CogVideoXVAEConfig(
    block_out_channels=(8, 16), layers_per_block=1, norm_groups=4,
    temporal_compress_level=1,
)


class CogGroupNorm(nn.Module):
    """torch 5-D GroupNorm semantics: stats over (C/g, T, H, W)."""

    groups: int
    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        b, t, h, w, c = x.shape
        g = self.groups
        y = x.astype(jnp.float32).reshape(b, t * h * w, g, c // g)
        mean = y.mean(axis=(1, 3), keepdims=True)
        var = y.var(axis=(1, 3), keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + 1e-6)
        y = y.reshape(b, t, h, w, c) * scale + bias
        return y.astype(x.dtype)


class CogCausalConv3d(nn.Module):
    """Causal 3-D conv; fresh streams pad time by repeating frame 0
    (diffusers ``fake_context_parallel_forward``).  Returns (y, cache)."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, tcache=None):
        kt, kh, kw = self.kernel
        pt = kt - 1
        if pt:
            if tcache is not None:
                x = jnp.concatenate([tcache.astype(x.dtype), x], axis=1)
            else:
                front = jnp.repeat(x[:, :1], pt, axis=1)
                x = jnp.concatenate([front, x], axis=1)
        new_cache = x[:, x.shape[1] - pt:] if pt else None
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)))
        y = nn.Conv(
            self.features, kernel_size=self.kernel, padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)
        return y, new_cache


def _repeat_resize(x, tshape):
    """Nearest interpolation for exact integer upscale factors (the only
    case the decoder needs), implemented as repeats."""
    for axis, target in zip((1, 2, 3), tshape):
        cur = x.shape[axis]
        assert target % cur == 0, (x.shape, tshape)
        if target != cur:
            x = jnp.repeat(x, target // cur, axis=axis)
    return x


class CogSpatialNorm3D(nn.Module):
    """GroupNorm modulated by the latent: norm(f) * conv_y(zq) + conv_b(zq),
    with zq nearest-resized to f (first frame resized separately when the
    temporal length is odd)."""

    f_channels: int
    zq_channels: int
    groups: int

    @nn.compact
    def __call__(self, f, zq):
        t = f.shape[1]
        if t > 1 and t % 2 == 1:
            zf = _repeat_resize(zq[:, :1], (1, f.shape[2], f.shape[3]))
            zr = _repeat_resize(zq[:, 1:], (t - 1, f.shape[2], f.shape[3]))
            zq = jnp.concatenate([zf, zr], axis=1)
        else:
            zq = _repeat_resize(zq, (t, f.shape[2], f.shape[3]))
        y, _ = CogCausalConv3d(self.f_channels, (1, 1, 1), name="conv_y")(zq)
        b_, _ = CogCausalConv3d(self.f_channels, (1, 1, 1), name="conv_b")(zq)
        normed = CogGroupNorm(self.groups, self.f_channels,
                              name="norm_layer")(f)
        return normed * y + b_


class CogResnetBlock3D(nn.Module):
    in_dim: int
    out_dim: int
    groups: int
    spatial_norm_dim: Optional[int] = None  # decoder: zq channels
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None, cache=None):
        cache = cache or {}
        out = {}

        def norm(name, feat, h):
            if self.spatial_norm_dim is None:
                return CogGroupNorm(self.groups, feat, name=name)(h)
            return CogSpatialNorm3D(
                feat, self.spatial_norm_dim, self.groups, name=name
            )(h, zq)

        h = norm("norm1", self.in_dim, x)
        h, out["conv1"] = CogCausalConv3d(
            self.out_dim, dtype=self.dtype, name="conv1"
        )(nn.silu(h), cache.get("conv1"))
        h = norm("norm2", self.out_dim, h)
        h, out["conv2"] = CogCausalConv3d(
            self.out_dim, dtype=self.dtype, name="conv2"
        )(nn.silu(h), cache.get("conv2"))
        if self.in_dim != self.out_dim:
            # plain (non-causal) 1x1x1 SafeConv3d in diffusers
            x = nn.Conv(self.out_dim, (1, 1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_shortcut")(x)
        return x + h, out


class CogDownsample3D(nn.Module):
    """Optional pairwise temporal avg-pool (first frame kept when odd),
    then right/bottom zero-pad + stride-2 spatial conv."""

    dim: int
    compress_time: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.compress_time:
            t = x.shape[1]
            if t % 2 == 1:
                first, rest = x[:, :1], x[:, 1:]
                if rest.shape[1]:
                    b, tr, h, w, c = rest.shape
                    rest = rest.reshape(b, tr // 2, 2, h, w, c).mean(axis=2)
                x = jnp.concatenate([first, rest], axis=1)
            else:
                b, tt, h, w, c = x.shape
                x = x.reshape(b, tt // 2, 2, h, w, c).mean(axis=2)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        b, t, h, w, c = x.shape
        y = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(
            x.reshape(b * t, h, w, c)
        )
        return y.reshape(b, t, y.shape[1], y.shape[2], self.dim)


class CogUpsample3D(nn.Module):
    """Nearest 2x upsample (time+space for later frames when compressing
    time; odd first frame upsampled spatially only), then 3x3 conv."""

    dim: int
    compress_time: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = x.shape[1]
        if self.compress_time:
            if t > 1 and t % 2 == 1:
                first, rest = x[:, :1], x[:, 1:]
                first = _upsample2x_spatial(first)
                rest = jnp.repeat(_upsample2x_spatial(rest), 2, axis=1)
                x = jnp.concatenate([first, rest], axis=1)
            elif t > 1:
                x = jnp.repeat(_upsample2x_spatial(x), 2, axis=1)
            else:
                x = _upsample2x_spatial(x)
        else:
            x = _upsample2x_spatial(x)
        b, tt, h, w, c = x.shape
        y = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(
            x.reshape(b * tt, h, w, c)
        )
        return y.reshape(b, tt, h, w, self.dim)


def _upsample2x_spatial(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


class CogDownBlock3D(nn.Module):
    in_dim: int
    out_dim: int
    num_layers: int
    groups: int
    add_downsample: bool
    compress_time: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        cache = cache or {}
        out = {}
        d = self.in_dim
        for j in range(self.num_layers):
            key = f"resnets_{j}"
            x, out[key] = CogResnetBlock3D(
                d, self.out_dim, self.groups, dtype=self.dtype, name=key
            )(x, cache=cache.get(key))
            d = self.out_dim
        if self.add_downsample:
            x = CogDownsample3D(self.out_dim, self.compress_time,
                                self.dtype, name="downsamplers_0")(x)
        return x, out


class CogUpBlock3D(nn.Module):
    in_dim: int
    out_dim: int
    num_layers: int
    groups: int
    spatial_norm_dim: int
    add_upsample: bool
    compress_time: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, zq, cache=None):
        cache = cache or {}
        out = {}
        d = self.in_dim
        for j in range(self.num_layers):
            key = f"resnets_{j}"
            x, out[key] = CogResnetBlock3D(
                d, self.out_dim, self.groups, self.spatial_norm_dim,
                self.dtype, name=key,
            )(x, zq=zq, cache=cache.get(key))
            d = self.out_dim
        if self.add_upsample:
            x = CogUpsample3D(self.out_dim, self.compress_time, self.dtype,
                              name="upsamplers_0")(x)
        return x, out


class CogMidBlock3D(nn.Module):
    dim: int
    groups: int
    spatial_norm_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None, cache=None):
        cache = cache or {}
        out = {}
        for j in range(2):
            key = f"resnets_{j}"
            x, out[key] = CogResnetBlock3D(
                self.dim, self.dim, self.groups, self.spatial_norm_dim,
                self.dtype, name=key,
            )(x, zq=zq, cache=cache.get(key))
        return x, out


class CogEncoder3D(nn.Module):
    cfg: CogVideoXVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        cache = cache or {}
        out = {}
        c = self.cfg
        chans = c.block_out_channels
        x, out["conv_in"] = CogCausalConv3d(
            chans[0], dtype=self.dtype, name="conv_in"
        )(x, cache.get("conv_in"))
        d = chans[0]
        for i, ch in enumerate(chans):
            key = f"down_blocks_{i}"
            x, out[key] = CogDownBlock3D(
                d, ch, c.layers_per_block, c.norm_groups,
                add_downsample=i < len(chans) - 1,
                compress_time=i < c.temporal_compress_level,
                dtype=self.dtype, name=key,
            )(x, cache.get(key))
            d = ch
        x, out["mid_block"] = CogMidBlock3D(
            chans[-1], c.norm_groups, dtype=self.dtype, name="mid_block"
        )(x, cache=cache.get("mid_block"))
        x = CogGroupNorm(c.norm_groups, chans[-1], name="norm_out")(x)
        x, out["conv_out"] = CogCausalConv3d(
            2 * c.latent_channels, dtype=self.dtype, name="conv_out"
        )(nn.silu(x), cache.get("conv_out"))
        return x, out


class CogDecoder3D(nn.Module):
    cfg: CogVideoXVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, cache=None):
        cache = cache or {}
        out = {}
        c = self.cfg
        rev = tuple(reversed(c.block_out_channels))
        x, out["conv_in"] = CogCausalConv3d(
            rev[0], dtype=self.dtype, name="conv_in"
        )(z, cache.get("conv_in"))
        x, out["mid_block"] = CogMidBlock3D(
            rev[0], c.norm_groups, c.latent_channels, self.dtype,
            name="mid_block",
        )(x, zq=z, cache=cache.get("mid_block"))
        d = rev[0]
        for i, ch in enumerate(rev):
            key = f"up_blocks_{i}"
            x, out[key] = CogUpBlock3D(
                d, ch, c.layers_per_block + 1, c.norm_groups,
                c.latent_channels,
                add_upsample=i < len(rev) - 1,
                compress_time=i < c.temporal_compress_level,
                dtype=self.dtype, name=key,
            )(x, z, cache.get(key))
            d = ch
        x = CogSpatialNorm3D(
            rev[-1], c.latent_channels, c.norm_groups, name="norm_out"
        )(x, z)
        x, out["conv_out"] = CogCausalConv3d(
            c.in_channels, dtype=self.dtype, name="conv_out"
        )(nn.silu(x), cache.get("conv_out"))
        return x, out


class CogVideoXVAE(nn.Module):
    """AutoencoderKLCogVideoX parity module (no quant convs in this family)."""

    cfg: CogVideoXVAEConfig = COGVIDEOX_VAE_FULL
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = CogEncoder3D(self.cfg, self.dtype)
        self.decoder = CogDecoder3D(self.cfg, self.dtype)

    def moments(self, video):
        h, _ = self.encoder(video)
        return jnp.split(h, 2, axis=-1)

    def encode(self, video, rng=None):
        mean, logvar = self.moments(video)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * jnp.clip(logvar, -30, 20))
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z):
        x, _ = self.decoder(z)
        return x

    def decode_with_cache(self, z, cache=None):
        cache = cache or {}
        x, dec = self.decoder(z, cache.get("decoder"))
        return x, {"decoder": dec}

    def __call__(self, video, rng=None):
        return self.decode(self.encode(video, rng))


@functools.lru_cache(maxsize=16)
def _chunk_decoder(cfg: CogVideoXVAEConfig, dtype, chunk: int):
    """Process-cached jitted chunk decoder (see vae_wan._chunk_decoder:
    a fresh jit wrapper per call re-traces/compiles every chunk program;
    the chunk is sliced inside the program — no eager slice dispatches)."""
    vae = CogVideoXVAE(cfg, dtype)

    def run(p, z, start, c):
        zz = jax.lax.dynamic_slice_in_dim(z, start, chunk, axis=1)
        return vae.apply(p, zz, c, method=vae.decode_with_cache)

    return jax.jit(run)


def chunked_decode(vae: CogVideoXVAE, params, z, *, frame_batch: int = 2):
    """diffusers-parity chunked decode: first chunk takes the remainder
    (so chunk 0 is odd and carries the image-coded first frame), later
    chunks are ``frame_batch`` latent frames with conv caches carried."""
    t = z.shape[1]
    rem = t % frame_batch
    bounds = [0, frame_batch + rem] if t > frame_batch else [0, t]
    while bounds[-1] < t:
        bounds.append(min(bounds[-1] + frame_batch, t))
    cache = None
    pieces = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        decode1 = _chunk_decoder(vae.cfg, vae.dtype, e - s)
        piece, cache = decode1(params, z, s, cache)
        pieces.append(piece)
    return jnp.concatenate(pieces, axis=1)
