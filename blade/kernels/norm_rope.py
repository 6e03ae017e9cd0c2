"""Fused RMS-norm + rotate-half RoPE + head-split Pallas kernels.

The Wan self-attention q/k lane after the projection matmul is three
bandwidth passes in XLA — RMS norm (f32 round trip), the
``[B, S, H*d] -> [B, H, S, d]`` head transpose, and rotate-half RoPE —
measured 4.5 ms/layer on top of the 1.5 ms projections at Wan-1.3B 480p
geometry (S=32760, D=1536; ``scripts/profile_qk_lane.py``: proj 1.48,
+norm 0.90, +transpose 2.01, +rope 1.59 ms).  The pure-bandwidth bound for
all three combined is ONE read + ONE write of the tensor (~0.5 ms for q+k),
so this module fuses them into a single Pallas pass:

  ``norm_rope_heads``  x [B, S, D] -> [B, H, S, d]   (rms*scale, rope, pack)

measured 6.02 -> 2.45 ms/layer (q+k, incl. the 1.06 ms projections) on v5e.

``heads_pack`` / ``heads_unpack`` are the same-single-pass treatment for the
PURE relayouts (v's head split, the attention output's inverse) — and they
LOSE in-model: XLA absorbs a relayout adjacent to a matmul into the matmul's
epilogue/operand handling for free (pack 0.45 ms XLA vs 0.87 fused, unpack
0.55 vs 1.16; ``scripts/profile_qk_lane.py``), so ``wan_dit.py`` keeps those
in XLA.  They are kept here, tested, as the reproducible half of that A/B —
only reach for them when a relayout has no adjacent matmul to hide in.

RoPE runs in the full-width roll form: with channels de-interleave-permuted
upstream (``layers.deinterleave_perm``) and full-width tables
``cos_f = [cos|cos]``, ``sin_f = [-sin|sin]``, the rotation is
``y * cos_f + roll(y, d/2) * sin_f`` — one ``pltpu.roll`` per head instead
of any lane-minor relayout.  Parity: the reference's interleaved-pair RoPE
(``modify_wan.py:110-116``) equals this under the folded permutation
(pinned by ``tests/test_layers_rope.py``).

Gradients: ``heads_pack``/``heads_unpack`` are linear with each other as
exact transposes, so each one's VJP is the other kernel.  The norm makes
``norm_rope_heads`` nonlinear; its VJP recomputes through the XLA reference
composition (one extra fwd at training time — inference pays nothing).

Fused path requires ``head_dim % 128 == 0`` (lane-aligned per-head slices)
and a sublane-friendly row tile dividing S; anything else falls back to the
exact XLA composition, so callers never need to gate.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blade.kernels.block_sparse_attn import _interpret_default

__all__ = ["norm_rope_heads", "heads_pack", "heads_unpack", "rope_full_tables"]


def rope_full_tables(cos: jnp.ndarray, sin: jnp.ndarray):
    """Half-width rope tables ``[L, d/2]`` -> full-width roll-form tables
    ``cos_f = [cos|cos]``, ``sin_f = [-sin|sin]`` (both ``[L, d]``, f32)."""
    return (
        jnp.concatenate([cos, cos], axis=-1),
        jnp.concatenate([-sin, sin], axis=-1),
    )


def _row_tile(s: int, cap: int = 512) -> int:
    """Largest multiple-of-8 divisor of ``s`` in ``[64, cap]`` (0 if none).

    Divisor tiles keep every grid block full — no boundary masking and no
    padded-row traffic.  The 512 cap keeps the f32 working set comfortably
    inside scoped VMEM with double-buffered in/out blocks; the 64 floor
    sends shorter rows (8 <= s < 64, tiny/test shapes) to the XLA fallback
    where a sub-64-row grid step would waste the kernel's dispatch cost
    (behavior pinned in tests/test_norm_rope.py).
    """
    for bs in range(min(cap, s) - min(cap, s) % 8, 63, -8):
        if s % bs == 0:
            return bs
    return 0


# ---------------------------------------------------------------------------
# norm_rope_heads


def _rms_scale(xf, scale_row, eps):
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * scale_row


def _norm_rope_reference(x, scale, cos, sin, num_heads, eps):
    """Exact XLA composition: rms*scale -> head split -> roll-form rope."""
    b, s, dim = x.shape
    d = dim // num_heads
    y = _rms_scale(x.astype(jnp.float32), scale[None, None, :], eps)
    y = y.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    cos_f, sin_f = rope_full_tables(cos, sin)
    rolled = jnp.roll(y, d // 2, axis=-1)
    return (y * cos_f + rolled * sin_f).astype(x.dtype)


def _norm_rope_kernel(x_ref, scale_ref, cos_ref, sin_ref, o_ref, *, eps, d):
    xf = x_ref[0].astype(jnp.float32)  # [BS, D]
    y = _rms_scale(xf, scale_ref[...], eps)
    cos_f = cos_ref[...]  # [BS, d]
    sin_f = sin_ref[...]
    for h in range(o_ref.shape[1]):
        yh = y[:, h * d : (h + 1) * d]
        rolled = pltpu.roll(yh, d // 2, axis=1)
        o_ref[0, h] = (yh * cos_f + rolled * sin_f).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _norm_rope_fused(x, scale, cos, sin, num_heads, eps, bs, interpret):
    b, s, dim = x.shape
    d = dim // num_heads
    cos_f, sin_f = rope_full_tables(cos, sin)
    return pl.pallas_call(
        functools.partial(_norm_rope_kernel, eps=eps, d=d),
        grid=(b, s // bs),
        in_specs=[
            pl.BlockSpec((1, bs, dim), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, dim), lambda bi, i: (0, 0)),
            pl.BlockSpec((bs, d), lambda bi, i: (i, 0)),
            pl.BlockSpec((bs, d), lambda bi, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, num_heads, bs, d), lambda bi, i: (bi, 0, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, s, d), x.dtype),
        interpret=interpret,
    )(x, scale[None, :], cos_f, sin_f)


def _norm_rope_fwd(x, scale, cos, sin, num_heads, eps, bs, interpret):
    out = _norm_rope_fused(x, scale, cos, sin, num_heads, eps, bs, interpret)
    return out, (x, scale, cos, sin)


def _norm_rope_bwd(num_heads, eps, bs, interpret, res, g):
    x, scale, cos, sin = res
    _, vjp = jax.vjp(
        lambda x_, s_: _norm_rope_reference(x_, s_, cos, sin, num_heads, eps),
        x,
        scale,
    )
    dx, dscale = vjp(g)
    return dx, dscale, None, None


_norm_rope_fused.defvjp(_norm_rope_fwd, _norm_rope_bwd)


def norm_rope_heads(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    num_heads: int,
    *,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
    fused: bool = True,
) -> jnp.ndarray:
    """``rms(x)*scale`` -> ``[B, H, S, d]`` head split -> rotate-half RoPE,
    in one Pallas bandwidth pass.

    ``x [B, S, D]`` is the q/k projection output with channels
    de-interleave-permuted (``layers.deinterleave_perm``); ``scale [D]`` is
    the (already permuted) RMS-norm scale; ``cos``/``sin`` are the standard
    half-width tables ``[S, d/2]`` (f32).  Falls back to the exact XLA
    composition when the geometry doesn't fit the fused path, or when the
    caller passes ``fused=False`` (tp-sharded inputs: GSPMD can shard the
    XLA composition but must all-gather around a pallas_call).
    """
    b, s, dim = x.shape
    d = dim // num_heads
    bs = _row_tile(s)
    if not fused or d % 128 != 0 or bs == 0:
        return _norm_rope_reference(x, scale, cos, sin, num_heads, eps)
    if interpret is None:
        interpret = _interpret_default()
    return _norm_rope_fused(
        x, scale.astype(jnp.float32), cos, sin, num_heads, eps, bs, interpret
    )


# ---------------------------------------------------------------------------
# heads_pack / heads_unpack (pure relayouts; exact transposes of each other)


def _pack_kernel(x_ref, o_ref, *, d):
    xb = x_ref[0]  # [BS, D]
    for h in range(o_ref.shape[1]):
        o_ref[0, h] = xb[:, h * d : (h + 1) * d]


def _unpack_kernel(x_ref, o_ref, *, d):
    for h in range(x_ref.shape[1]):
        o_ref[0, :, h * d : (h + 1) * d] = x_ref[0, h]


def _pack_impl(x, num_heads, bs, interpret):
    b, s, dim = x.shape
    d = dim // num_heads
    return pl.pallas_call(
        functools.partial(_pack_kernel, d=d),
        grid=(b, s // bs),
        in_specs=[pl.BlockSpec((1, bs, dim), lambda bi, i: (bi, i, 0))],
        out_specs=pl.BlockSpec(
            (1, num_heads, bs, d), lambda bi, i: (bi, 0, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, s, d), x.dtype),
        interpret=interpret,
    )(x)


def _unpack_impl(x, bs, interpret):
    b, h, s, d = x.shape
    return pl.pallas_call(
        functools.partial(_unpack_kernel, d=d),
        grid=(b, s // bs),
        in_specs=[pl.BlockSpec((1, h, bs, d), lambda bi, i: (bi, 0, i, 0))],
        out_specs=pl.BlockSpec((1, bs, h * d), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, h * d), x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _pack_vjp(x, num_heads, bs, interpret):
    return _pack_impl(x, num_heads, bs, interpret)


_pack_vjp.defvjp(
    lambda x, nh, bs, it: (_pack_impl(x, nh, bs, it), None),
    lambda nh, bs, it, _, g: (_unpack_impl(g, bs, it),),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _unpack_vjp(x, bs, interpret):
    return _unpack_impl(x, bs, interpret)


_unpack_vjp.defvjp(
    lambda x, bs, it: (_unpack_impl(x, bs, it), (x.shape[1],)),
    lambda bs, it, res, g: (_pack_impl(g, res[0], bs, it),),
)


def heads_pack(
    x: jnp.ndarray, num_heads: int, *, interpret: Optional[bool] = None
) -> jnp.ndarray:
    """``[B, S, H*d] -> [B, H, S, d]`` relayout as one Pallas copy pass.

    NOTE: measured SLOWER than XLA when the input comes from (or output
    feeds) a matmul — see module docstring.  Not used by the models."""
    b, s, dim = x.shape
    d = dim // num_heads
    bs = _row_tile(s)
    if d % 128 != 0 or bs == 0:
        return x.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    if interpret is None:
        interpret = _interpret_default()
    return _pack_vjp(x, num_heads, bs, interpret)


def heads_unpack(x: jnp.ndarray, *, interpret: Optional[bool] = None) -> jnp.ndarray:
    """``[B, H, S, d] -> [B, S, H*d]`` relayout (inverse of ``heads_pack``)."""
    b, h, s, d = x.shape
    bs = _row_tile(s)
    if d % 128 != 0 or bs == 0:
        return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    if interpret is None:
        interpret = _interpret_default()
    return _unpack_vjp(x, bs, interpret)
