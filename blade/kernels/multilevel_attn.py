"""Multi-level pooled block-sparse attention (inference path of ASA).

Each 128x128 attention block is attended at one of five levels
(reference semantics: ``cogvideo_newattn.py`` + the 1.6k-line multi-level
Triton kernel ``block_sparse_attn_kernel_with_backward_9_10.py``):

  * 0 — skipped entirely,
  * 1 — full attention,
  * L in {2, 4, 8} — the block's K/V are L-times mean-pooled and scores get
    a ``+log(L)`` bias so each pooled key carries the softmax mass of L keys.

TPU realization: instead of one mega-kernel dispatching five inner loops per
block (the Triton design), each level is an independent *grouped block-gather
flash pass* over that level's K/V pyramid — level L gathers L sub-segments of
``128/L`` pooled rows into one 128-wide MXU tile per iteration — and the
per-level ``(out, lse)`` results are LSE-merged exactly (softmax is
associative over disjoint key sets).  Level 1 reuses the binary sparse
kernel.  This turns 1.6k lines of handwritten Triton into one parameterized
kernel + composition, and every level pass runs dense 128-wide matmuls on
the MXU.

Fully differentiable: each level pass carries a custom VJP running the
grouped-gather dQ/dK/dV kernels in pooled coordinates, and the pyramid
pooling / LSE merge differentiate through XLA (the reference dedicates
~800 Triton lines to this backward).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blade.attention.masks import mask_to_block_lists, pad_to_block_multiple
from blade.kernels.block_sparse_attn import (
    KV_BLOCK,
    NBUF,
    NEG_INF,
    _interpret_default,
    _sparse_fwd_kernel,
    _tile_lists,
    block_sparse_attention,
    gather_backward,
)
from blade.kernels.ref_attention import mean_pool_kv, merge_attention

__all__ = ["multilevel_attention", "pooled_level_attention"]

# Pooled pyramids at or below this size stay VMEM-resident per (batch, head)
# (gathers become register copies); above it they are DMA-gathered.
VMEM_PYRAMID_BUDGET = 6 * 1024 * 1024


def _vmem_level_kernel(
    cnt_ref,  # [BH, nQt] int32 (SMEM prefetch)
    idx_hbm,  # [BH, nQt, 8, maxK] int32 (HBM)
    q_ref,  # [1, q_block, D]
    kv_ref,  # [1, nB * 2*seg_rows, D] VMEM (whole pooled pyramid, per bh)
    o_ref,
    lse_ref,
    idxbuf,  # SMEM (2, 8, maxK)
    idx_sem,
    *, scale, bias, pooled_valid_len, q_block, seg_rows, segs,
):
    """Pooled-level pass with the entire per-(batch,head) K/V pyramid
    resident in VMEM: segment gathers become register copies instead of
    DMAs (levels 4 and 8 fit comfortably; level 2 does not)."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    n_qt = pl.num_programs(1)
    count = cnt_ref[bh, qi]
    iters = pl.cdiv(count, segs)
    flat = bh * n_qt + qi
    par = jax.lax.rem(flat, 2)
    nxt_par = jax.lax.rem(flat + 1, 2)

    def idx_copy(buf_par, b_i, q_i):
        return pltpu.make_async_copy(
            idx_hbm.at[b_i, q_i], idxbuf.at[buf_par], idx_sem.at[buf_par]
        )

    @pl.when(flat == 0)
    def _first():
        idx_copy(par, bh, qi).start()
    idx_copy(par, bh, qi).wait()
    nxt_qi = jax.lax.rem(qi + 1, n_qt)
    nxt_bh = bh + jnp.where(qi + 1 == n_qt, 1, 0)

    @pl.when(nxt_bh < pl.num_programs(0))
    def _next():
        idx_copy(nxt_par, nxt_bh, nxt_qi).start()

    q = q_ref[0]
    d = q_ref.shape[-1]
    width = segs * seg_rows
    col = jax.lax.broadcasted_iota(jnp.int32, (q_block, width), 1)
    lane = col % seg_rows
    grp = col // seg_rows

    def body(t, carry):
        m, l, acc = carry
        parts = []
        rec = 2 * seg_rows
        for u in range(segs):
            blk = idxbuf[par, 0, segs * t + u]
            parts.append(kv_ref[0, pl.ds(blk * rec, rec), :])  # vector load
        kv = jnp.stack(parts)  # [segs, 2*seg_rows, D]
        kb = kv[:, :seg_rows, :].reshape(width, d)
        vb = kv[:, seg_rows:, :].reshape(width, d)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + bias
        ok = (segs * t + grp) < count
        src_col = jnp.zeros((q_block, width), jnp.int32)
        for u in range(segs):
            blk_u = idxbuf[par, 0, segs * t + u]
            src_col = jnp.where(grp == u, blk_u * seg_rows + lane, src_col)
        ok = ok & (src_col < pooled_valid_len)
        s = jnp.where(ok, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return m_new, l, acc

    m0 = jnp.full((q_block, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((q_block, 1), jnp.float32)
    acc0 = jnp.zeros((q_block, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, iters, body, (m0, l0, acc0))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse = jnp.where(l == 0.0, NEG_INF, m + jnp.log(l_safe))
    lse_ref[0] = jnp.broadcast_to(jnp.transpose(lse, (1, 0)), lse_ref.shape[1:])


def pooled_level_attention(
    q: jnp.ndarray,  # [BH, Lq_pad, D] (Lq_pad % q_block == 0)
    k_pool: jnp.ndarray,  # [BH, Lp, D] level-pooled keys
    v_pool: jnp.ndarray,
    block_mask: jnp.ndarray,  # [BH, nQt, nK] bool (original block coords)
    *,
    level: int,
    scale: float,
    pooled_valid_len: int,
    q_block: int = 128,
    tile_width: int = 512,
    interpret: Optional[bool] = None,
):
    """One level's pooled gather pass; returns ``(out, lse)`` ([BH, Lq]).

    Reuses the grouped block-gather flash kernel: an original 128-block at
    level L corresponds to a ``128/L``-row segment of the pooled K/V; each
    iteration gathers ``tile_width/ (128/L)`` selected segments (packed K+V,
    one DMA each) into a ``tile_width``-wide MXU tile with a ``+log(L)``
    score bias.  Differentiable: the backward runs the grouped-gather dQ and
    dK/dV passes in pooled coordinates (the reference ships a handwritten
    Triton backward for this; here it is the same parameterized kernel).
    """
    if interpret is None:
        interpret = _interpret_default()
    return _pooled_level_core(
        q, k_pool, v_pool, block_mask, level, scale, pooled_valid_len,
        q_block, tile_width, interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _pooled_level_core(q, k_pool, v_pool, block_mask, level, scale,
                       pooled_valid_len, q_block, tile_width, interpret):
    out, lse = _pooled_level_fwd_only(
        q, k_pool, v_pool, block_mask, level, scale, pooled_valid_len,
        q_block, tile_width, interpret,
    )
    return out, lse


def _pooled_level_core_fwd(q, k_pool, v_pool, block_mask, level, scale,
                           pooled_valid_len, q_block, tile_width, interpret):
    out, lse = _pooled_level_fwd_only(
        q, k_pool, v_pool, block_mask, level, scale, pooled_valid_len,
        q_block, tile_width, interpret,
    )
    return (out, lse), (q, k_pool, v_pool, block_mask, out, lse)


def _pooled_level_core_bwd(level, scale, pooled_valid_len, q_block, tile_width,
                           interpret, res, g):
    q, k_pool, v_pool, block_mask, out, lse = res
    g_out, g_lse = g
    seg_rows = KV_BLOCK // level
    lists = _tile_lists(*mask_to_block_lists(block_mask))
    t_lists = _tile_lists(
        *mask_to_block_lists(jnp.swapaxes(block_mask, -1, -2))
    )
    dq, dk, dv = gather_backward(
        q, k_pool, v_pool, out, lse, g_out, g_lse, lists, t_lists,
        scale=scale, bias=float(math.log(level)),
        kv_valid_len=pooled_valid_len, q_block=q_block, seg_rows=seg_rows,
        interpret=interpret,
    )
    dmask = np.zeros(block_mask.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask


_pooled_level_core.defvjp(_pooled_level_core_fwd, _pooled_level_core_bwd)


def _pooled_level_fwd_only(q, k_pool, v_pool, block_mask, level, scale,
                           pooled_valid_len, q_block, tile_width, interpret):
    bh, lq, d = q.shape
    lq_orig = lq
    n_qt = lq // q_block
    seg_rows = KV_BLOCK // level
    segs = max(tile_width // seg_rows, 1)
    lp = k_pool.shape[1]
    n_blocks = lp // seg_rows
    idx, cnt = mask_to_block_lists(block_mask)
    idx4, cnt = _tile_lists(idx, cnt)
    max_k = idx4.shape[-1]
    # Pad list length so segs * iters never reads past the tile.
    if max_k % segs:
        pad = segs - max_k % segs
        idx4 = jnp.pad(idx4, ((0, 0), (0, 0), (0, 0), (0, pad)), mode="edge")
        max_k += pad

    kv_packed = jnp.concatenate(
        [
            k_pool.reshape(bh, n_blocks, seg_rows, d),
            v_pool.reshape(bh, n_blocks, seg_rows, d),
        ],
        axis=2,
    ).reshape(bh, n_blocks * 2 * seg_rows, d)

    pyramid_bytes = kv_packed.shape[1] * d * kv_packed.dtype.itemsize
    use_vmem = pyramid_bytes <= VMEM_PYRAMID_BUDGET

    if use_vmem:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, n_qt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((1, q_block, d), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec(
                    (1, kv_packed.shape[1], d),
                    lambda b, i, *_: (b, 0, 0),
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, q_block, d), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, 8, q_block), lambda b, i, *_: (b, 0, i)),
            ],
            scratch_shapes=[
                pltpu.SMEM((2, 8, max_k), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = functools.partial(
            _vmem_level_kernel,
            scale=scale,
            bias=float(math.log(level)),
            pooled_valid_len=pooled_valid_len,
            q_block=q_block,
            seg_rows=seg_rows,
            segs=segs,
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, n_qt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((1, q_block, d), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, q_block, d), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, 8, q_block), lambda b, i, *_: (b, 0, i)),
            ],
            scratch_shapes=[
                pltpu.SMEM((2, 8, max_k), jnp.int32),
                pltpu.VMEM((NBUF, segs, 2 * seg_rows, d), k_pool.dtype),
                pltpu.SemaphoreType.DMA((NBUF, segs)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = functools.partial(
            _sparse_fwd_kernel,
            scale=scale,
            bias=float(math.log(level)),
            kv_valid_len=pooled_valid_len,
            kv_pad_len=lp + 1,  # force tail masking (pooled tails)
            q_block=q_block,
            seg_rows=seg_rows,
            segs=segs,
        )
    out, lse8 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, lq), jnp.float32),
        ],
        interpret=interpret,
    )(cnt, idx4, q, kv_packed)
    return out[:, :lq_orig], lse8[:, 0, :lq_orig]


def multilevel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    levels: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """Multi-level pooled sparse attention over ``[B, H, L, D]``.

    ``levels``: int ``[B, H, n_q, n_k]`` in {0, 1, 2, 4, 8} (see
    ``blade.attention.masks.multilevel_mask``).  Returns ``(out, lse)``;
    differentiable in q/k/v.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    if interpret is None:
        interpret = _interpret_default()

    # Level-1 pass: exact per-block attention via the binary sparse kernel
    # at the ORIGINAL head dim (it lane-packs d=64 internally; pre-padding
    # to 128 here would double its work).
    d_orig = d
    out1, lse1 = block_sparse_attention(
        q, k, v, levels == 1, scale=scale, interpret=interpret
    )
    outs = [out1.astype(jnp.float32)]
    lses = [lse1]

    # Pooled passes need lane-complete (128-wide) DMA records: pool the
    # pyramids at the original head dim first (half the pooling traffic at
    # d=64), then zero-pad the head dim.
    if d < 128:
        pad_d = 128 - d
        dpad = lambda t: jnp.pad(t, ((0, 0),) * (t.ndim - 1) + ((0, pad_d),))
    else:
        pad_d = 0
        dpad = lambda t: t

    lq_pad = -(-lq // 128) * 128
    kp_full = pad_to_block_multiple(k, 128, axis=2)
    vp_full = pad_to_block_multiple(v, 128, axis=2)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0))) if lq_pad != lq else q
    qp = dpad(qp).reshape(b * h, lq_pad, d + pad_d)

    for level in (2, 4, 8):
        kp = dpad(mean_pool_kv(kp_full, level)).reshape(b * h, -1, d + pad_d)
        vp = dpad(mean_pool_kv(vp_full, level)).reshape(b * h, -1, d + pad_d)
        mask_l = (levels == level).reshape(b * h, levels.shape[-2], levels.shape[-1])
        out_l, lse_l = pooled_level_attention(
            qp, kp, vp, mask_l,
            level=level, scale=scale,
            pooled_valid_len=-(-lk // level),
            interpret=interpret,
        )
        # Drop the head-dim padding BEFORE the f32 merge (halves its traffic)
        out_l = out_l.reshape(b, h, lq_pad, d + pad_d)[:, :, :lq, :d_orig]
        lse_l = lse_l.reshape(b, h, lq_pad)[:, :, :lq]
        outs.append(out_l.astype(jnp.float32))
        lses.append(lse_l)

    out, lse = merge_attention(outs, lses)
    return out.astype(q.dtype), lse
