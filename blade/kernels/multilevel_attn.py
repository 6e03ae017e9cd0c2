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
    GROUP,
    KV_BLOCK,
    LOG2E,
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
        ok = (segs * t + grp) < count
        src_col = jnp.zeros((q_block, width), jnp.int32)
        for u in range(segs):
            blk_u = idxbuf[par, 0, segs * t + u]
            src_col = jnp.where(grp == u, blk_u * seg_rows + lane, src_col)
        ok = ok & (src_col < pooled_valid_len)
        s = jnp.where(ok, s, NEG_INF)
        c = scale * LOG2E  # base-2 carry; bias -> final LSE
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True) * c)
        alpha = jnp.exp2(m - m_new)
        p = jnp.exp2(s * c - m_new)
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
    lse = jnp.where(l == 0.0, NEG_INF,
                    m * (1.0 / LOG2E) + bias + jnp.log(l_safe))
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


def fused_supported(d: int, lk: int, itemsize: int = 2) -> bool:
    """Whether the fused single-pass kernel covers this geometry.

    Small pyramids (CogVideoX d=64): all three pooled pyramids stay
    VMEM-resident.  Large pyramids (Wan d=128, 14.7 MB): levels 4+8 stay
    resident (6.3 MB) and level-2 records are DMA-gathered from HBM with
    the level-1 pipeline pattern (sync register gathers only win for the
    small resident segments; from HBM, pipelined DMA is the proven form).
    """
    n_kt = -(-lk // KV_BLOCK)
    if n_kt > 256 or d not in (64, 128):
        return False
    pyr_bytes = n_kt * (64 + 32 + 16) * 2 * d * itemsize
    if pyr_bytes <= FUSED_PYR_BUDGET:
        return True
    res_bytes = n_kt * (32 + 16) * 2 * d * itemsize
    return res_bytes <= FUSED_RES_BUDGET


def multilevel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    levels: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    fused: Optional[bool] = None,
    lists=None,
    q_rows: int = 128,
    pooled_tiles: Optional[Tuple[int, int, int]] = None,
    pooled_single_shot: bool = False,
    dma_level2: Optional[bool] = None,
):
    """Multi-level pooled sparse attention over ``[B, H, L, D]``.

    ``levels``: int ``[B, H, n_q, n_k]`` in {0, 1, 2, 4, 8} (see
    ``blade.attention.masks.multilevel_mask``).  Returns ``(out, lse)``;
    differentiable in q/k/v.

    ``fused=None`` auto-selects the single-pass fused kernel (all four
    levels in one launch with a shared online-softmax carry) when the
    geometry supports it — ``d`` in {64, 128} (lane-packed K|V records)
    with ``n_kt <= 256``; oversized level-2 pyramids fall back to HBM DMA
    gathers (``dma_level2``, auto).  ``fused=False`` forces the per-level
    pass + exact LSE merge composition.

    ``lists``: optional precomputed per-level ascending block lists
    ``(idx [B,H,nQ,4,cap], counts [B,H,nQ,4])`` from
    ``blade.attention.masks.multilevel_lists`` — skips building and
    re-sorting the level mask; ``levels`` may then be ``None``.  Fused
    path only.

    ``q_rows``: query rows per mask row (fused path only; 256 halves the
    kernel's per-row overhead at coarser mask granularity — equivalent to
    a 128-row mask with each row duplicated).

    ``pooled_tiles``: optional static MXU tile widths for the pooled
    levels ``(t2, t4, t8)`` (fused path only).  When the caller knows the
    per-level band widths are static (``multilevel_lists`` rank bands),
    sizing each tile to its band eliminates the wasted tail columns of
    the default widths (level 8's default 1024-wide tile wastes ~45% of
    its exp+matmul at the standard 25% band); exactness is unaffected
    (tail columns are masked either way).

    ``pooled_single_shot``: fused path only.  The caller GUARANTEES that
    every row's per-level count fits its pooled tile (count <= tile //
    (128 // level), true for ``multilevel_lists`` static rank bands with
    band-sized ``pooled_tiles``); the kernel then folds level-1's first
    gather group and ALL pooled levels into ONE merged MXU tile per mask
    row — one matmul + one softmax pass with a penalty-row bias, and
    every gather list position a trace-time constant (no per-iteration
    scalar address math).  Exact under the guarantee; counts exceeding a
    tile would be silently truncated.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    if interpret is None:
        interpret = _interpret_default()

    if fused is None:
        fused = fused_supported(d, lk, q.dtype.itemsize)
    if lists is not None and not fused:
        raise ValueError("precomputed lists require the fused path")
    if q_rows != 128 and not fused:
        raise ValueError("q_rows != 128 requires the fused path")
    if fused:
        return _multilevel_fused(q, k, v, levels, scale, interpret,
                                 lists=lists, q_rows=q_rows,
                                 pooled_tiles=pooled_tiles,
                                 single_shot=pooled_single_shot,
                                 dma_level2=dma_level2)

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


# ---------------------------------------------------------------------------
# Fused single-pass multilevel kernel (levels 1 + 2 + 4 + 8 in one launch)
# ---------------------------------------------------------------------------
#
# The per-level pass design pays the per-grid-step pipeline overhead
# (~1.6 us on v5e) four times per mask row plus an external 4-way f32 LSE
# merge; at CogVideoX geometry (48 heads x 139 rows) that floor alone is
# ~40 ms.  Online softmax is associative over disjoint key sets, so all four
# levels can share ONE (m, l, acc) carry inside one grid step:
#
#   * level 1 blocks are DMA-gathered from the original K/V (lane-packed
#     K|V records for d == 64), with the DMA pipeline flattened across the
#     FUSED_ROWS mask rows of the step;
#   * levels 2/4/8 read a single concatenated lane-packed pooled pyramid
#     kept VMEM-resident per (batch, head) — gathers are register copies;
#   * all four per-row index lists ride ONE prefetched idx DMA, packed into
#     the 8-sublane axis of the [nQt, 8, 128] list layout (sub_s sublanes
#     of 128 entries per level).
#
# The kernel writes the merged (out, lse) directly — no external merge
# traffic.  Exactness: each key block still contributes exp(s - lse) with
# its level's +log(L) bias, identical to the per-pass + merge formulation.

FUSED_ROWS = 8  # mask rows per grid step (shared level-1 DMA pipeline)
FUSED_PYR_BUDGET = 5 * 1024 * 1024  # lane-packed pooled pyramid VMEM cap
# Resident budget for the levels-4+8 pyramids when level 2 overflows to
# HBM DMA gathers (d=128 Wan geometry: 4 MB + 2 MB resident, level-2 at
# 8 MB gathered).  Total VMEM audit at wan-480p: kvbuf 2 MB + kv2buf 2 MB
# + resident 6.3 MB + q/o tiles ~1.5 MB ~= 12 MB of the 16 MB scope.
FUSED_RES_BUDGET = 7 * 1024 * 1024
# Per-level MXU tile width of the pooled inner loops, sized so the default
# eval bands (10%/10%/25% of <=160 key blocks) complete in ONE iteration —
# the ~1 us/iteration loop overhead dominates the wasted tail columns.
POOLED_TILE = {2: 1024, 4: 512, 8: 1024}
SEG2_GROUP = 16  # level-2 records per DMA slot (16 x 64 rows = 1024-wide)
NBUF2 = 4  # level-2 gather pipeline depth


def _tail_limit(count, last_entry, seg_rows, segs, boundary_block,
                boundary_rows, width):
    """(t_last, column_limit) for final-iteration tail masking.

    Index lists are ascending, so the only partially-valid (padded-tail)
    block — id ``boundary_block`` with ``boundary_rows`` valid rows — can
    only be the LAST entry.  Returns the iteration index of that entry and
    the tile-column limit to apply there (= full width when the last entry
    is not the boundary block)."""
    j_last = jnp.maximum(count - 1, 0)
    t_last = j_last // segs
    u_last = jax.lax.rem(j_last, segs)
    lim = jnp.where(last_entry == boundary_block,
                    u_last * seg_rows + boundary_rows, jnp.int32(width))
    return t_last, lim


def _fused_ml_kernel(
    cnt_ref,  # [BH, nQt*4] int32 (SMEM scalar prefetch; row-major levels
    #           1,2,4,8 per mask row — 2-D: SMEM pads the last dim to 128)
    idx_hbm,  # [BH, nQt, 8, 128] int32 (HBM; level li at sublanes [li*S,(li+1)*S))
    q_ref,  # [1, R*q_block, d]
    kv1_ref,  # ANY: [BH, n_kt*KV_BLOCK, 2d] lane-packed original K|V
    pyr2_ref,  # ANY: [BH, n_kt*64, 2d] 2x-pooled records (HBM)
    pyr4_ref,  # ANY: [BH, n_kt*32, 2d]
    pyr8_ref,  # ANY: [BH, n_kt*16, 2d]
    o_ref,  # [1, R*q_block, d]
    lse_ref,  # [1, 8, R*q_block]
    *scratch,  # see unpack below (layout depends on dma_level2)
    scale, kv_valid_len, kv_pad_len, n_kt, sub_s, q_block, pooled_tiles,
    single_shot=False, dma_level2=False,
):
    if dma_level2:
        # Level-2 pyramid too big for VMEM residency: its records are
        # DMA-gathered from HBM (pipeline below); levels 4+8 stay resident.
        (idxbuf, kvbuf, kv2buf, pyr4_buf, pyr8_buf,
         sem, idx_sem, pyr_sem, sem2) = scratch
        resident = ((pyr4_ref, pyr4_buf), (pyr8_ref, pyr8_buf))
    else:
        # idxbuf: SMEM (2, R, 8, 128); kvbuf: VMEM (NBUF, GROUP, KV_BLOCK,
        # 2d); pyrL_buf: whole pooled pyramid, copied once per (batch,
        # head) — a (1, r, c)-blocked in_spec alternative re-fetches the
        # whole pyramid EVERY grid step (~4 MB x 35 steps/bh at cog).
        (idxbuf, kvbuf, pyr2_buf, pyr4_buf, pyr8_buf,
         sem, idx_sem, pyr_sem) = scratch
        resident = ((pyr2_ref, pyr2_buf), (pyr4_ref, pyr4_buf),
                    (pyr8_ref, pyr8_buf))
    r_rows = FUSED_ROWS
    bh = pl.program_id(0)
    step = pl.program_id(1)
    n_steps = pl.num_programs(1)
    par = jax.lax.rem(step + bh * n_steps, 2)
    nxt_par = jax.lax.rem(step + bh * n_steps + 1, 2)

    pyr_copies = [
        pltpu.make_async_copy(src.at[bh], dst, pyr_sem.at[i])
        for i, (src, dst) in enumerate(resident)
    ]

    @pl.when(step == 0)
    def _pyramid_in():
        for c in pyr_copies:
            c.start()

    def idx_copy(buf_par, b_i, s_i):
        return pltpu.make_async_copy(
            idx_hbm.at[b_i, pl.ds(s_i * r_rows, r_rows)],
            idxbuf.at[buf_par], idx_sem.at[buf_par],
        )

    @pl.when(step + bh == 0)
    def _first_list():
        idx_copy(par, bh, step).start()
    idx_copy(par, bh, step).wait()
    nxt_s = jax.lax.rem(step + 1, n_steps)
    nxt_bh = bh + jnp.where(step + 1 == n_steps, 1, 0)

    @pl.when(nxt_bh < pl.num_programs(0))
    def _next_list():
        idx_copy(nxt_par, nxt_bh, nxt_s).start()

    def list_entry(r_idx, li, j):
        # Level li's list entry j (sublane-packed: sub_s sublanes of 128).
        return idxbuf[par, r_idx, li * sub_s + j // 128, jax.lax.rem(j, 128)]

    # ---- level-1 DMA pipeline, flattened over the step's rows ----
    counts1 = [cnt_ref[bh, (step * r_rows + r) * 4] for r in range(r_rows)]
    iters1 = [pl.cdiv(c, GROUP) for c in counts1]
    base = [jnp.int32(0)]
    for r in range(r_rows - 1):
        base.append(base[-1] + iters1[r])
    total = base[-1] + iters1[-1]

    def row_of(g):
        r_g = jnp.int32(0)
        for r in range(1, r_rows):
            r_g = jnp.where(g >= base[r], jnp.int32(r), r_g)
        return r_g

    def kv_copy(slot, g, u):
        r_g = row_of(g)
        local = g - base[0]
        for r in range(1, r_rows):
            local = jnp.where(r_g == r, g - base[r], local)
        j = GROUP * local + u
        blk = list_entry(r_g, 0, j)
        return pltpu.make_async_copy(
            kv1_ref.at[bh, pl.ds(blk * KV_BLOCK, KV_BLOCK), :],
            kvbuf.at[slot, u], sem.at[slot, u],
        )

    def prefetch(g):
        @pl.when(g < total)
        def _():
            slot = jax.lax.rem(g, NBUF)
            for u in range(GROUP):
                kv_copy(slot, g, u).start()

    for g0 in range(NBUF):
        prefetch(jnp.int32(g0))

    # ---- level-2 HBM gather pipeline (dma_level2 only), flattened over the
    # step's rows exactly like level 1: SEG2_GROUP 64-row pooled records per
    # slot (one 1024-wide MXU tile), NBUF2-deep.
    if dma_level2:
        seg2 = KV_BLOCK // 2
        counts2 = [cnt_ref[bh, (step * r_rows + r) * 4 + 1]
                   for r in range(r_rows)]
        iters2 = [pl.cdiv(c, SEG2_GROUP) for c in counts2]
        base2 = [jnp.int32(0)]
        for r in range(r_rows - 1):
            base2.append(base2[-1] + iters2[r])
        total2 = base2[-1] + iters2[-1]

        def row_of2(g):
            r_g = jnp.int32(0)
            for r in range(1, r_rows):
                r_g = jnp.where(g >= base2[r], jnp.int32(r), r_g)
            return r_g

        def kv2_copy(slot, g, u):
            r_g = row_of2(g)
            local = g - base2[0]
            for r in range(1, r_rows):
                local = jnp.where(r_g == r, g - base2[r], local)
            j = SEG2_GROUP * local + u
            blk = list_entry(r_g, 1, j)
            return pltpu.make_async_copy(
                pyr2_ref.at[bh, pl.ds(blk * seg2, seg2), :],
                kv2buf.at[slot, u], sem2.at[slot, u],
            )

        def prefetch2(g):
            @pl.when(g < total2)
            def _():
                slot = jax.lax.rem(g, NBUF2)
                for u in range(SEG2_GROUP):
                    kv2_copy(slot, g, u).start()

        for g0 in range(NBUF2):
            prefetch2(jnp.int32(g0))

    d = q_ref.shape[-1]
    width1 = GROUP * KV_BLOCK
    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, width1), 1)
    grp1 = col1 // KV_BLOCK

    @pl.when(step == 0)
    def _pyramid_wait():
        for c in pyr_copies:
            c.wait()

    pyr_refs = {4: pyr4_buf, 8: pyr8_buf}
    if not dma_level2:
        pyr_refs[2] = pyr2_buf

    # Static pooled-level geometry: (level, list index, seg rows, MXU tile,
    # segments per tile).  Shared by the per-level loops and the merged
    # single-shot tile.
    lv_geo = []
    for li, level in enumerate((2, 4, 8), start=1):
        seg_rows = KV_BLOCK // level
        tile = max(128, min(pooled_tiles[level], seg_rows * n_kt))
        lv_geo.append((level, li, seg_rows, tile, tile // seg_rows))

    def l1_pen(t, count1, t_last1, lim1):
        # [1, width1] penalty row: 0 on valid columns, NEG_INF on the count
        # mask / padded-tail limit — ONE broadcast add into the score tile
        # replaces the former [q_block, width1] compare+select passes.
        ok = (GROUP * t + grp1) < count1
        if kv_valid_len < kv_pad_len:
            limit = jnp.where(t == t_last1, lim1, jnp.int32(width1))
            ok = ok & (col1 < limit)
        return jnp.where(ok, jnp.float32(0.0), jnp.float32(NEG_INF))

    for r in range(r_rows):
        q = q_ref[0, r * q_block:(r + 1) * q_block, :]
        c = scale * LOG2E

        # Ascending lists put the (only possibly partial) boundary block
        # last, so padded-tail masking reduces to ONE column limit applied
        # on the final gather iteration — not a per-segment where-chain
        # (32 [128,512] selects per iteration dominated the VPU budget).
        count1 = counts1[r]
        t_last1, lim1 = _tail_limit(
            count1, list_entry(r, 0, jnp.maximum(count1 - 1, 0)),
            KV_BLOCK, GROUP, n_kt - 1,
            kv_valid_len - (n_kt - 1) * KV_BLOCK, width1)

        if single_shot:
            # ---- merged tile: level-1 group 0 + ALL pooled levels in ONE
            # matmul + ONE softmax pass (callers guarantee every pooled
            # level's count fits its tile — static rank bands).  Gather
            # list positions are trace-time constants, so the per-segment
            # scalar address math collapses to one SMEM read + one
            # multiply per segment.
            g0 = base[r]
            slot0 = jax.lax.rem(g0, NBUF)

            # Rows with an empty level-1 list own NO gather group (the
            # pipeline issues exactly sum(iters1) group fetches); waiting
            # here would consume another row's semaphore signals.  The
            # stale kvbuf data read below is fully masked by the penalty
            # row (count1 == 0 => all level-1 columns NEG_INF).
            @pl.when(count1 > 0)
            def _consume_l1_group0():
                for u in range(GROUP):
                    kv_copy(slot0, g0, u).wait()

            # Rows with an empty level-1 list own NO gather group, so the
            # whole slot is stale bytes — possibly NaN patterns that a
            # penalty ADD or a `* 0.0` validity factor cannot mask (NaN
            # propagates through the p@V matmul).  A scalar-predicate
            # select zeroes the tile; rows with count1 > 0 are fully real
            # (list padding gathers block 0).
            kv1t = jnp.where(count1 > 0, kvbuf[slot0],
                             jnp.zeros((), kvbuf.dtype))  # [GROUP, KV_BLOCK, 2d]
            parts = []
            pens = [l1_pen(0, count1, t_last1, lim1)]
            total_cnt = count1
            for level, li, seg_rows, tile, segs in lv_geo:
                pyr_ref = pyr_refs[level]
                for u in range(segs):
                    blk = list_entry(r, li, u)
                    parts.append(pyr_ref[pl.ds(blk * seg_rows, seg_rows), :])
                countp = cnt_ref[bh, (step * r_rows + r) * 4 + li]
                total_cnt = total_cnt + countp
                pooled_valid = -(-kv_valid_len // level)
                t_lastp, limp = _tail_limit(
                    countp, list_entry(r, li, jnp.maximum(countp - 1, 0)),
                    seg_rows, segs, n_kt - 1,
                    pooled_valid - (n_kt - 1) * seg_rows, tile)
                colp = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
                okp = (colp // seg_rows) < countp
                if kv_valid_len < kv_pad_len:
                    limitp = jnp.where(t_lastp == 0, limp, jnp.int32(tile))
                    okp = okp & (colp < limitp)
                pens.append(jnp.where(
                    okp, jnp.float32(math.log(level) * LOG2E),
                    jnp.float32(NEG_INF)))
            kvp = jnp.concatenate(parts, axis=0)  # [W, 2d]
            kb = jnp.concatenate(
                [kv1t[:, :, :d].reshape(width1, d), kvp[:, :d]], axis=0)
            vb = jnp.concatenate(
                [kv1t[:, :, d:].reshape(width1, d), kvp[:, d:]], axis=0)
            s = jax.lax.dot_general(
                q, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s2 = s * c + jnp.concatenate(pens, axis=1)
            m = jnp.max(s2, axis=-1, keepdims=True)
            p = jnp.exp2(s2 - m)
            # All-empty rows (possible only without last-2 forcing) would
            # see exp2(0) == 1 on every masked column; a scalar validity
            # factor keeps (l, acc) exactly zero there.
            valid = (total_cnt > 0).astype(jnp.float32)
            l = jnp.sum(p, axis=-1, keepdims=True) * valid
            acc = jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * valid

            # Refill AFTER the kb/vb reads: g0 + NBUF lands in slot0.
            @pl.when(count1 > 0)
            def _refill_l1_group0():
                prefetch(g0 + NBUF)

            t_start = 1
        else:
            m = jnp.full((q_block, 1), NEG_INF, jnp.float32)
            l = jnp.zeros((q_block, 1), jnp.float32)
            acc = jnp.zeros((q_block, d), jnp.float32)
            t_start = 0

        def body1(t, carry, r=r, count=count1, t_last1=t_last1, lim1=lim1):
            m, l, acc = carry
            g = base[r] + t
            slot = jax.lax.rem(g, NBUF)
            for u in range(GROUP):
                kv_copy(slot, g, u).wait()
            kv = kvbuf[slot]  # [GROUP, KV_BLOCK, 2d] lane-packed
            kb = kv[:, :, :d].reshape(width1, d)
            vb = kv[:, :, d:].reshape(width1, d)
            s = jax.lax.dot_general(
                q, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # Raw scores; the carry (m, l) lives in BASE-2 logit units
            # (z = (s*scale + log(level)) * log2(e)) so every level's bias
            # and the softmax exp collapse into one broadcast-fma + exp2
            # pass per element (level 1: bias 0).
            s2 = s * c + l1_pen(t, count, t_last1, lim1)
            m_new = jnp.maximum(m, jnp.max(s2, axis=-1, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s2 - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha + pv
            prefetch(g + NBUF)
            return m_new, l, acc

        m, l, acc = jax.lax.fori_loop(t_start, iters1[r], body1, (m, l, acc))

        # ---- pooled levels: register gathers from the resident pyramid ----
        # (single-shot already folded every pooled level into the merged
        # tile above — running these loops again would double-count.)
        for li, level in enumerate((2, 4, 8), start=1) if not single_shot \
                else ():
            countp = cnt_ref[bh, (step * r_rows + r) * 4 + li]
            if level == 2 and dma_level2:
                # DMA-gathered level 2: consume the flattened pipeline set
                # up above (1024-wide tiles of SEG2_GROUP 64-row records),
                # penalty-row masking in base-2 logit units like level 1.
                tile2 = SEG2_GROUP * seg2
                col2 = jax.lax.broadcasted_iota(jnp.int32, (1, tile2), 1)
                grp2 = col2 // seg2
                pooled_valid2 = -(-kv_valid_len // 2)
                t_last2, lim2 = _tail_limit(
                    countp, list_entry(r, 1, jnp.maximum(countp - 1, 0)),
                    seg2, SEG2_GROUP, n_kt - 1,
                    pooled_valid2 - (n_kt - 1) * seg2, tile2)
                b2 = float(math.log(2)) * LOG2E

                def body2(t, carry, r=r, countp=countp, t_last2=t_last2,
                          lim2=lim2, col2=col2, grp2=grp2, tile2=tile2,
                          b2=b2):
                    m, l, acc = carry
                    g = base2[r] + t
                    slot = jax.lax.rem(g, NBUF2)
                    for u in range(SEG2_GROUP):
                        kv2_copy(slot, g, u).wait()
                    kv = kv2buf[slot]  # [SEG2_GROUP, seg2, 2d]
                    kb = kv[:, :, :d].reshape(tile2, d)
                    vb = kv[:, :, d:].reshape(tile2, d)
                    s = jax.lax.dot_general(
                        q, kb, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    ok = (SEG2_GROUP * t + grp2) < countp
                    if kv_valid_len < kv_pad_len:
                        limit = jnp.where(t == t_last2, lim2,
                                          jnp.int32(tile2))
                        ok = ok & (col2 < limit)
                    pen = jnp.where(ok, jnp.float32(b2),
                                    jnp.float32(NEG_INF))
                    s2 = s * c + pen
                    m_new = jnp.maximum(m, jnp.max(s2, axis=-1,
                                                   keepdims=True))
                    alpha = jnp.exp2(m - m_new)
                    p = jnp.exp2(s2 - m_new)
                    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                    pv = jax.lax.dot_general(
                        p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = acc * alpha + pv
                    prefetch2(g + NBUF2)
                    return m_new, l, acc

                m, l, acc = jax.lax.fori_loop(
                    0, iters2[r], body2, (m, l, acc))
                continue
            seg_rows = KV_BLOCK // level
            # No point tiling wider than the whole pooled pyramid (small
            # geometries/tests): clamp to n_kt blocks, 128-lane minimum.
            tile = max(128, min(pooled_tiles[level], seg_rows * n_kt))
            segs = tile // seg_rows
            colp = jax.lax.broadcasted_iota(jnp.int32, (q_block, tile), 1)
            grpp = colp // seg_rows
            pyr_ref = pyr_refs[level]
            pooled_valid = -(-kv_valid_len // level)
            bias = float(math.log(level))
            t_lastp, limp = _tail_limit(
                countp, list_entry(r, li, jnp.maximum(countp - 1, 0)),
                seg_rows, segs, n_kt - 1,
                pooled_valid - (n_kt - 1) * seg_rows, tile)

            def bodyp(t, carry, r=r, li=li, seg_rows=seg_rows, segs=segs,
                      tile=tile, colp=colp,
                      pyr_ref=pyr_ref, countp=countp, bias=bias,
                      t_lastp=t_lastp, limp=limp, grpp=grpp):
                m, l, acc = carry
                parts = []
                for u in range(segs):
                    blk = list_entry(r, li, segs * t + u)
                    parts.append(pyr_ref[pl.ds(blk * seg_rows, seg_rows), :])
                kv = jnp.stack(parts)  # [segs, seg_rows, 2d]
                kb = kv[:, :, :d].reshape(tile, d)
                vb = kv[:, :, d:].reshape(tile, d)
                s = jax.lax.dot_general(
                    q, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ok = (segs * t + grpp) < countp
                if kv_valid_len < kv_pad_len:
                    limit = jnp.where(t == t_lastp, limp, jnp.int32(tile))
                    ok = ok & (colp < limit)
                s = jnp.where(ok, s, NEG_INF)
                c = scale * LOG2E
                b2 = bias * LOG2E  # log2(level)
                m_new = jnp.maximum(
                    m, jnp.max(s, axis=-1, keepdims=True) * c + b2)
                alpha = jnp.exp2(m - m_new)
                p = jnp.exp2(s * c + (b2 - m_new))
                l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc * alpha + pv
                return m_new, l, acc

            m, l, acc = jax.lax.fori_loop(
                0, pl.cdiv(countp, segs), bodyp, (m, l, acc))

        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, r * q_block:(r + 1) * q_block, :] = (
            acc / l_safe).astype(o_ref.dtype)
        # m is in base-2 logit units; LSE output stays natural-log.
        lse = jnp.where(l == 0.0, NEG_INF,
                        m * (1.0 / LOG2E) + jnp.log(l_safe))
        lse_ref[0, :, r * q_block:(r + 1) * q_block] = jnp.broadcast_to(
            jnp.transpose(lse, (1, 0)), (8, q_block))


def _pack_lists(idx, cnt, sub_s):
    """Pack per-level lists into the kernel's prefetch layout.

    ``idx``: int32 ``[BH, nQ, 4, sub_s*128]`` (levels 1,2,4,8, ascending);
    ``cnt``: int32 ``[BH, nQ, 4]``.  Pads the row axis to a FUSED_ROWS
    multiple (zero counts) and the sublane axis to 8.  Returns
    ``(idx_all [BH, nQt, 8, 128], cnt_all [BH, nQt*4])``.
    """
    bh, n_qt = idx.shape[0], idx.shape[1]
    if n_qt % FUSED_ROWS:
        pad_rows = FUSED_ROWS - n_qt % FUSED_ROWS
        idx = jnp.pad(idx, ((0, 0), (0, pad_rows), (0, 0), (0, 0)))
        cnt = jnp.pad(cnt, ((0, 0), (0, pad_rows), (0, 0)))
        n_qt += pad_rows
    idx_all = idx.reshape(bh, n_qt, 4 * sub_s, 128)
    if idx_all.shape[2] < 8:
        idx_all = jnp.pad(
            idx_all, ((0, 0), (0, 0), (0, 8 - idx_all.shape[2]), (0, 0)))
    cnt_all = cnt.astype(jnp.int32).reshape(bh, n_qt * 4)
    return idx_all, cnt_all


def _lists_from_levels(levels, sub_s):
    """Kernel-layout lists from an int level mask (slow generic path)."""
    bh, n_qt = levels.shape[0], levels.shape[1]
    cap = sub_s * 128
    idx_subs, cnts = [], []
    for level in (1, 2, 4, 8):
        idx_l, cnt_l = mask_to_block_lists(levels == level)
        if cap != idx_l.shape[-1]:
            idx_l = jnp.pad(
                idx_l, ((0, 0), (0, 0), (0, cap - idx_l.shape[-1])),
                mode="edge")
        idx_subs.append(idx_l)
        cnts.append(cnt_l)
    return _pack_lists(
        jnp.stack(idx_subs, axis=2), jnp.stack(cnts, axis=-1), sub_s)


def _masks_from_lists(idx_all, cnt_all, n_qt, n_kt, sub_s):
    """Reconstruct the four per-level boolean masks (backward pass only).

    Exact inverse of the list packing: scatter-max of validity flags onto
    block columns (duplicate-safe — tail padding repeats valid entries)."""
    bh = idx_all.shape[0]
    n_qt_pad = idx_all.shape[1]
    cnt = cnt_all.reshape(bh, n_qt_pad, 4)
    bi = jnp.arange(bh)[:, None, None]
    ri = jnp.arange(n_qt_pad)[None, :, None]
    pos = jnp.arange(sub_s * 128)
    masks = []
    for li in range(4):
        idx_l = idx_all[:, :, li * sub_s:(li + 1) * sub_s, :].reshape(
            bh, n_qt_pad, sub_s * 128)
        valid = pos < cnt[..., li:li + 1]
        m = jnp.zeros((bh, n_qt_pad, n_kt), bool)
        m = m.at[bi, ri, idx_l].max(valid)
        masks.append(m[:, :n_qt])
    return masks


def _fused_fwd_only(q, k, v, idx_all, cnt_all, scale, lk, interpret,
                    q_rows=128, pooled_tiles=None, single_shot=False,
                    dma_level2=None):
    """Fused forward.  q: [BH, Lq_pad, d]; k/v: [BH, Lk_pad, d] (edge-padded
    originals); idx_all/cnt_all: packed per-level lists (see _pack_lists).

    ``dma_level2=None`` auto-selects HBM DMA gathers for the level-2
    pyramid when the full pyramid exceeds the VMEM residency budget (Wan
    d=128 geometry); pass True/False to force (tests/bench)."""
    bh, lq_pad, d = q.shape
    lk_pad = k.shape[1]
    n_kt = lk_pad // KV_BLOCK
    q_block = q_rows
    r_rows = FUSED_ROWS
    lq_out = lq_pad
    n_qt = idx_all.shape[1]
    assert n_qt % r_rows == 0 and n_qt * q_block >= lq_pad
    if n_qt * q_block != lq_pad:
        q = jnp.pad(q, ((0, 0), (0, n_qt * q_block - lq_pad), (0, 0)))
    lq_padded = n_qt * q_block

    sub_s = -(-n_kt // 128)
    assert 4 * sub_s <= 8, "fused path requires n_kt <= 256"

    from blade.kernels.pack import pack_kv

    kv1, pyr2, pyr4, pyr8 = pack_kv(
        k, v, lane_pack=True, pyramid=True, interpret=interpret)

    if dma_level2 is None:
        pyr_bytes = (pyr2.shape[1] + pyr4.shape[1] + pyr8.shape[1]) \
            * 2 * d * k.dtype.itemsize
        dma_level2 = pyr_bytes > FUSED_PYR_BUDGET
    assert not (single_shot and dma_level2), (
        "single-shot merged tile needs all pooled pyramids VMEM-resident")

    if dma_level2:
        kv2_scratch = [
            pltpu.VMEM((NBUF2, SEG2_GROUP, KV_BLOCK // 2, 2 * d), k.dtype)]
        pyr_scratch = []
        sem_tail = [pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((NBUF2, SEG2_GROUP))]
    else:
        kv2_scratch = []
        pyr_scratch = [pltpu.VMEM((pyr2.shape[1], 2 * d), k.dtype)]
        sem_tail = [pltpu.SemaphoreType.DMA((3,))]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_qt // r_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, r_rows * q_block, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, r_rows * q_block, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, 8, r_rows * q_block), lambda b, i, *_: (b, 0, i)),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, r_rows, 8, 128), jnp.int32),
            pltpu.VMEM((NBUF, GROUP, KV_BLOCK, 2 * d), k.dtype),
            *kv2_scratch,
            *pyr_scratch,
            pltpu.VMEM((pyr4.shape[1], 2 * d), k.dtype),
            pltpu.VMEM((pyr8.shape[1], 2 * d), k.dtype),
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
            pltpu.SemaphoreType.DMA((2,)),
            *sem_tail,
        ],
    )
    kernel = functools.partial(
        _fused_ml_kernel,
        scale=scale,
        kv_valid_len=lk,
        kv_pad_len=lk_pad,
        n_kt=n_kt,
        sub_s=sub_s,
        q_block=q_block,
        pooled_tiles=POOLED_TILE if pooled_tiles is None
        else dict(zip((2, 4, 8), pooled_tiles)),
        single_shot=single_shot,
        dma_level2=dma_level2,
    )
    out, lse8 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq_padded, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, lq_padded), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq_padded * n_kt * KV_BLOCK * d // 4,
            bytes_accessed=q.size * q.dtype.itemsize
            + kv1.size * k.dtype.itemsize // 4,
            transcendentals=bh * lq_padded * n_kt * KV_BLOCK // 4,
        ),
    )(cnt_all, idx_all, q, kv1, pyr2, pyr4, pyr8)
    return out[:, :lq_out], lse8[:, 0, :lq_out]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(11, 12, 13, 14, 15, 16, 17))
def _fused_ml_core(q, k, v, kp2, vp2, kp4, vp4, kp8, vp8, idx_all, cnt_all,
                   scale, lk, interpret, q_rows, pooled_tiles=None,
                   single_shot=False, dma_level2=None):
    return _fused_fwd_only(q, k, v, idx_all, cnt_all, scale, lk, interpret,
                           q_rows, pooled_tiles, single_shot, dma_level2)


def _fused_ml_core_fwd(q, k, v, kp2, vp2, kp4, vp4, kp8, vp8, idx_all,
                       cnt_all, scale, lk, interpret, q_rows,
                       pooled_tiles=None, single_shot=False,
                       dma_level2=None):
    out, lse = _fused_fwd_only(q, k, v, idx_all, cnt_all, scale, lk,
                               interpret, q_rows, pooled_tiles, single_shot,
                               dma_level2)
    return (out, lse), (q, k, v, kp2, vp2, kp4, vp4, kp8, vp8, idx_all,
                        cnt_all, out, lse)


def _fused_ml_core_bwd(scale, lk, interpret, q_rows, pooled_tiles,
                       single_shot, dma_level2, res, g):
    """Direct multi-level backward: each level's grouped-gather dQ/dK/dV
    pass runs against the GLOBAL merged (out, lse) — p_ij = exp(s_ij - lse_i)
    already includes the cross-level softmax weights, so per-level passes
    sum to the exact gradient (no merge-chain backprop needed)."""
    q, k, v, kp2, vp2, kp4, vp4, kp8, vp8, idx_all, cnt_all, out, lse = res
    g_out, g_lse = g
    d = q.shape[-1]
    if d < 128:
        pad_d = 128 - d
        dpad = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, pad_d)))
    else:
        dpad = lambda t: t
    qp = dpad(q)
    outp = dpad(out)
    g_outp = dpad(g_out)

    n_kt = k.shape[1] // KV_BLOCK
    sub_s = -(-n_kt // 128)
    level_masks = _masks_from_lists(
        idx_all, cnt_all, q.shape[1] // q_rows, n_kt, sub_s)
    if q_rows != 128:
        # Masks are at q_rows granularity; the gather backward works on
        # 128-row tiles — duplicate each mask row onto its 128-row tiles.
        level_masks = [
            jnp.repeat(m, q_rows // 128, axis=1) for m in level_masks]

    dq = jnp.zeros_like(qp, dtype=jnp.float32)
    grads = []
    for (level, kl, vl), mask_l in zip(
            ((1, k, v), (2, kp2, vp2), (4, kp4, vp4), (8, kp8, vp8)),
            level_masks):
        lists = _tile_lists(*mask_to_block_lists(mask_l))
        t_lists = _tile_lists(
            *mask_to_block_lists(jnp.swapaxes(mask_l, -1, -2)))
        dql, dkl, dvl = gather_backward(
            qp, dpad(kl), dpad(vl), outp, lse, g_outp, g_lse, lists, t_lists,
            scale=scale, bias=float(math.log(level)) if level > 1 else 0.0,
            kv_valid_len=-(-lk // level), q_block=128,
            seg_rows=KV_BLOCK // level, interpret=interpret,
        )
        dq = dq + dql.astype(jnp.float32)
        grads.extend([dkl[..., :d], dvl[..., :d]])
    didx = np.zeros(idx_all.shape, dtype=jax.dtypes.float0)
    dcnt = np.zeros(cnt_all.shape, dtype=jax.dtypes.float0)
    return (dq[..., :d].astype(q.dtype), *grads, didx, dcnt)


_fused_ml_core.defvjp(_fused_ml_core_fwd, _fused_ml_core_bwd)


def _multilevel_fused(q, k, v, levels, scale, interpret, lists=None,
                      q_rows=128, pooled_tiles=None, single_shot=False,
                      dma_level2=None):
    """Build pads + pooled pyramids and invoke the fused single-pass core.

    Pooling stays OUTSIDE the custom-VJP boundary so XLA autodiff handles
    the un-pooling (repeat / level) of pooled K/V gradients, exactly as in
    the per-level composition.  ``lists``: optional precomputed
    ``(idx [B,H,nQ,4,sub_s*128], counts [B,H,nQ,4])`` per-level ascending
    lists (``blade.attention.masks.multilevel_lists``) — skips the
    level-mask round-trip entirely.  ``q_rows``: query rows per mask row
    (128 or 256; coarser rows halve the kernel's per-row overhead at the
    cost of mask granularity).
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    lq_pad = -(-lq // q_rows) * q_rows
    kp_full = pad_to_block_multiple(k, 128, axis=2)
    vp_full = pad_to_block_multiple(v, 128, axis=2)
    qp = (
        jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0)))
        if lq_pad != lq else q
    )
    bh = b * h
    lk_pad = kp_full.shape[2]
    sub_s = -(-(lk_pad // KV_BLOCK) // 128)

    def flat(t):
        return t.reshape(bh, t.shape[2], d)

    pooled = []
    for level in (2, 4, 8):
        pooled.append(flat(mean_pool_kv(kp_full, level)))
        pooled.append(flat(mean_pool_kv(vp_full, level)))
    if lists is not None:
        idx, cnt = lists
        assert idx.shape[-1] == sub_s * 128, (
            f"list cap {idx.shape[-1]} != kernel cap {sub_s * 128}")
        idx_all, cnt_all = _pack_lists(
            idx.reshape(bh, *idx.shape[-3:]), cnt.reshape(bh, *cnt.shape[-2:]),
            sub_s)
    else:
        levels_bh = levels.reshape(bh, levels.shape[-2], levels.shape[-1])
        idx_all, cnt_all = _lists_from_levels(levels_bh, sub_s)
    out, lse = _fused_ml_core(
        flat(qp), flat(kp_full), flat(vp_full), *pooled, idx_all, cnt_all,
        scale, lk, interpret, q_rows, pooled_tiles, single_shot, dma_level2,
    )
    out = out.reshape(b, h, lq_pad, d)[:, :, :lq]
    lse = lse.reshape(b, h, lq_pad)[:, :, :lq]
    return out.astype(q.dtype), lse
