"""Pallas kernel for the ASA mask predictor (pooled attention estimate).

Computes ``Po[bh, i, j] = max over (m in q-block i, n in k-block j) of
softmax_row(q_s k_s^T * scale)[m, n]`` over the *subsampled* sequences —
the reference's ``attn_pooling_kernel.py`` (Triton), which tracks per-block
row maxima ``R`` alongside the flash (m, l) statistics and reduces them to
a block score grid at the end.

TPU mechanics: Mosaic cannot split the lane dimension ((256, 512) ->
(256, 16, 32)), so the per-32-lane group max is computed with a
log2(32)-step roll-max tree and extracted with a one-hot matmul (exact for
max values); raw per-(row, k-block) maxima stream to HBM per K-tile and the
cheap normalization/row-group reduction epilogue runs in XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blade.kernels.block_sparse_attn import NEG_INF, _interpret_default

__all__ = ["pooled_scores_kernel_call"]

Q_TILE = 256  # sampled rows per grid step
K_TILE = 512  # sampled cols per grid step


def _group_max_32(s):
    """Per-32-lane-group max of ``s [rows, cols]`` -> ``[rows, cols // 32]``.

    Roll-max tree: after max-combining rolls by 1, 2, 4, 8, 16, lane ``i``
    holds the max of lanes ``[i, i+31]`` (cyclic); group starts ``32*u`` only
    cover in-row windows, and the one-hot matmul extracts exactly those.
    """
    return _group_max_generic(s, 32)


def _kernel(
    q_ref,  # [1, Q_TILE, D]
    k_ref,  # [1, K_TILE, D]
    rbm_ref,  # out [1, 1, Q_TILE, K_TILE // tpb] raw row-block maxima
    ml_ref,  # out [1, 8, Q_TILE] rows 0/1 = m / l
    m_scr,  # [Q_TILE, 128] f32
    l_scr,  # [Q_TILE, 128] f32
    *,
    scale: float,
    tpb: int,
    valid_len: int,
    pad_len: int,
):
    j = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if valid_len < pad_len:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j * K_TILE + col < valid_len, s, NEG_INF)

    # Raw per-(row, k-block) maxima for this K tile -> HBM (normalized later).
    rbm_ref[0, 0] = _group_max_32(s) if tpb == 32 else _group_max_generic(s, tpb)

    # Online softmax statistics.
    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    l_new = l_prev * jnp.exp(m_prev - m_new) + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == n_j - 1)
    def _finalize():
        m_row = jnp.transpose(m_scr[:, 0:1], (1, 0))
        l_row = jnp.transpose(l_scr[:, 0:1], (1, 0))
        out = jnp.concatenate(
            [m_row, l_row] + [m_row] * 6, axis=0
        )  # 8 sublanes for tiling
        ml_ref[0] = out


def _group_max_generic(s, tpb):
    """Group max via a roll-max tree + one-hot matmul extraction.

    The selection matrix is generated from iota inside the kernel (pallas
    kernels cannot capture array constants).
    """
    rows, cols = s.shape
    m = s
    shift = 1
    while shift < tpb:
        m = jnp.maximum(m, pltpu.roll(m, cols - shift, 1))
        shift *= 2
    n_g = cols // tpb
    src_row = jax.lax.broadcasted_iota(jnp.int32, (cols, n_g), 0)
    dst_col = jax.lax.broadcasted_iota(jnp.int32, (cols, n_g), 1)
    sel = jnp.where(src_row == dst_col * tpb, 1.0, 0.0)
    return jax.lax.dot_general(
        m, sel, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def pooled_scores_kernel_call(
    q_s: jnp.ndarray,  # [B, H, Ls, D] sampled queries (Ls % tpb == 0)
    k_s: jnp.ndarray,
    *,
    tokens_per_block: int,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """Po [B, H, n_qb, n_kb], rows normalized to sum to 1."""
    b, h, ls, d = q_s.shape
    lks = k_s.shape[2]
    tpb = tokens_per_block
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    if interpret is None:
        interpret = _interpret_default()
    assert Q_TILE % tpb == 0 and K_TILE % tpb == 0

    bh = b * h
    q = q_s.reshape(bh, ls, d)
    k = k_s.reshape(bh, lks, d)
    lq_pad = -(-ls // Q_TILE) * Q_TILE
    lk_pad = -(-lks // K_TILE) * K_TILE
    if lq_pad != ls:
        q = jnp.pad(q, ((0, 0), (0, lq_pad - ls), (0, 0)))
    if lk_pad != lks:
        k = jnp.pad(k, ((0, 0), (0, lk_pad - lks), (0, 0)))
    n_qt = lq_pad // Q_TILE
    n_jt = lk_pad // K_TILE
    kb_per_tile = K_TILE // tpb
    n_kb = lks // tpb

    rbm, ml = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, tpb=tpb, valid_len=lks, pad_len=lk_pad
        ),
        grid=(bh, n_qt, n_jt),
        in_specs=[
            pl.BlockSpec((1, Q_TILE, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, K_TILE, d), lambda b_, i, j: (b_, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, Q_TILE, kb_per_tile), lambda b_, i, j: (b_, j, i, 0)
            ),
            pl.BlockSpec((1, 8, Q_TILE), lambda b_, i, j: (b_, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_jt, lq_pad, kb_per_tile), jnp.float32),
            jax.ShapeDtypeStruct((bh, 8, lq_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q_TILE, 128), jnp.float32),
            pltpu.VMEM((Q_TILE, 128), jnp.float32),
        ],
        interpret=interpret,
    )(q, k)

    # Epilogue (XLA, O(Ls * n_kb)): normalize rows, reduce 32-row groups.
    m = ml[:, 0, :ls][..., None]  # [bh, Ls, 1]
    l = jnp.maximum(ml[:, 1, :ls], 1e-30)[..., None]
    rbm = jnp.transpose(rbm, (0, 2, 1, 3)).reshape(bh, lq_pad, n_jt * kb_per_tile)
    rbm = rbm[:, :ls, :n_kb]
    per_row = jnp.exp(rbm - m) / l
    po = per_row.reshape(bh, ls // tpb, tpb, n_kb).max(axis=2)
    po = po.reshape(b, h, ls // tpb, n_kb)
    return po / jnp.sum(po, axis=-1, keepdims=True)
