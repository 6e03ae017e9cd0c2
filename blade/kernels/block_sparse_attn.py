"""Pallas TPU flash attention: dense + block-gather sparse (the ASA engine).

One kernel family replaces all three GPU kernels of the reference:

  * the external CUDA binary block-sparse flash attention
    (``block_sparse_attn_func``, mit-han-lab extension) — via a boolean block
    mask converted to per-row key-block index lists,
  * dense attention with LSE (``standard_attn``) — a classic BlockSpec
    pipelined flash kernel,
  * the pooled low-res branch and the multi-level inference kernel — via a
    scalar score ``bias`` (= ``log(level)``) per call plus exact LSE merging
    of per-level calls (see ``blade.kernels.ref_attention.merge_attention``).

Design (TPU-first, not a Triton translation):

  * Dense: grid ``(B*H, n_q, n_k)``; q/K/V/output tiles pipelined through
    VMEM by BlockSpecs; online-softmax state lives in VMEM scratch that
    persists across the sequential TPU grid.
  * Sparse: grid ``(B*H, n_q)``; the per-row key-block index list is DMA'd
    from HBM into SMEM scratch, then the *selected* 128-row K/V blocks are
    manually DMA'd with double buffering — HBM traffic and MXU work scale
    with the mask density, not the full sequence.
  * Online softmax in fp32; matmuls run in the input dtype (bf16) on the MXU
    with fp32 accumulation.
  * Backward is a recompute-based custom VJP: a dQ kernel keyed on the
    forward lists and a fused dK/dV kernel keyed on the transposed lists —
    no atomics (the reference's Triton backward needs atomic dQ; on TPU we
    re-key the loops instead).  The VJP also propagates the LSE cotangent
    (``ds += p * g_lse``), which the reference's CUDA path silently drops.

Reference behavior being matched: ``cogvideo_blocksparseattn.py:293-324``
(binary sparse path, LSE output), ``test_block_sparse_attention.py`` tests
1-2 (dense equivalence at all-ones mask; gradient correctness).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blade.attention.masks import mask_to_block_lists

__all__ = ["block_sparse_attention", "flash_attention"]

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # exp(x) == exp2(x * LOG2E)

DEFAULT_Q_BLOCK = 128
KV_BLOCK = 128
# Dense path uses wide KV tiles: the MXU/pipeline overhead of 128x128
# steps dominates otherwise (v5e, seq 32760: 128-tiles 440ms, 512-tiles
# 104ms, 1024-square 48.1ms; q=512/kv=4096 45.6ms = 144 TF/s, and
# 61.2ms = 63 TF/s at cog d=64 via the kv=2048 waste-capped pick —
# sweep in git history).  The q tile stays moderate: the f32 score
# intermediate is [q_tile, kv_tile] VMEM and 2048-square fails to compile.
DENSE_Q_TILE = 512
DENSE_KV_TILE = 4096
NBUF = 4  # sparse-gather DMA pipeline depth (group fetches)
GROUP = 8  # 128-blocks gathered/attended per iteration (1024-wide MXU tiles)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _tail_mask(s, start_col, kv_valid_len):
    """Mask score columns beyond the valid key length (padded tail).

    Implemented as a broadcast-add of a [1, tile] penalty row: one VPU pass
    over the score tile instead of the compare+select pair (the row's own
    compare/select is 1/rows of the tile)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[-1]), 1)
    pen = jnp.where(start_col + col < kv_valid_len, 0.0, NEG_INF)
    return s + pen


# ---------------------------------------------------------------------------
# Dense kernels (BlockSpec-pipelined classic flash attention)
# ---------------------------------------------------------------------------


def _dense_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale, bias, kv_valid_len, kv_pad_len, q_block,
):
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    kb = k_ref[0]
    # Scores stay in RAW q@k units; the softmax runs base-2 with the carry
    # in base-2 logit units (p = exp2(s*c - m2), c = scale*log2(e)) and the
    # scalar `bias` folded into the final LSE (softmax-invariant) — saves
    # the per-element scale-mul, bias-add and exp-internal-mul passes (the
    # VPU, not the MXU, bounds these kernels at d=64).
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kv_valid_len < kv_pad_len:
        # Unconditional: gating this on j == n_k-1 via lax.cond breaks the
        # Mosaic pipeline (measured 48->83 ms at wan geometry).
        s = _tail_mask(s, j * kb.shape[0], kv_valid_len)
    c = scale * LOG2E

    # The carry m lives in BASE-2 logit units (max(s)*c): the per-tile work
    # is one multiply + one broadcast-sub + exp2 (measured faster than both
    # the legacy s*scale+bias/exp form and recomputing m*c per tile —
    # scripts/profile_softmax_forms.py).
    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True) * c)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s * c - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == n_k - 1)
    def _finalize():
        l = l_scr[:, 0:1]
        m = m_scr[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        # m is base-2-scaled; LSE output stays natural-log (bias folded in).
        lse = jnp.where(l == 0.0, NEG_INF,
                        m * (1.0 / LOG2E) + bias + jnp.log(l_safe))
        lse_ref[0] = jnp.broadcast_to(jnp.transpose(lse, (1, 0)), lse_ref.shape[1:])


def _dense_dq_kernel(
    q_ref, do_ref, lse_ref, delta_ref, glse_ref, k_ref, v_ref, dq_ref, acc_scr,
    *, scale, bias, kv_valid_len, kv_pad_len, q_block,
):
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    do = do_ref[0]
    lse = jnp.transpose(lse_ref[0, 0:1, :], (1, 0))
    rest = jnp.transpose(glse_ref[0, 0:1, :] - delta_ref[0, 0:1, :], (1, 0))
    kb = k_ref[0]
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kv_valid_len < kv_pad_len:
        s = _tail_mask(s, j * kb.shape[0], kv_valid_len)
    # p = exp(s*scale + bias - lse) as one base-2 broadcast-fma pass.
    c = scale * LOG2E
    p = jnp.exp2(s * c - (lse - bias) * LOG2E)
    dov = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dov + rest)).astype(kb.dtype)
    acc_scr[...] += jax.lax.dot_general(
        ds, kb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == n_k - 1)
    def _finalize():
        dq_ref[0] = (acc_scr[...] * scale).astype(dq_ref.dtype)


def _dense_dkv_kernel(
    k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, glse_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale, bias, kv_valid_len, kv_pad_len, q_block,
):
    ki = pl.program_id(1)
    j = pl.program_id(2)  # query-block index
    n_q = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    kb = k_ref[0]
    vb = v_ref[0]
    qb = q_ref[0]
    dob = do_ref[0]
    lse = jnp.transpose(lse_ref[0, 0:1, :], (1, 0))
    rest = jnp.transpose(glse_ref[0, 0:1, :] - delta_ref[0, 0:1, :], (1, 0))
    s = jax.lax.dot_general(
        qb, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kv_valid_len < kv_pad_len:
        s = _tail_mask(s, ki * kb.shape[0], kv_valid_len)
    p = jnp.exp2(s * (scale * LOG2E) - (lse - bias) * LOG2E)
    dv_scr[...] += jax.lax.dot_general(
        p.astype(dob.dtype), dob, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dov = jax.lax.dot_general(
        dob, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dov + rest)).astype(qb.dtype)
    dk_scr[...] += jax.lax.dot_general(
        ds, qb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == n_q - 1)
    def _finalize():
        dk_ref[0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Sparse kernels (index lists DMA'd to SMEM; K/V gathered from HBM)
# ---------------------------------------------------------------------------


def _sparse_fwd_kernel(
    cnt_ref,  # scalar prefetch [BH, nQt] int32
    idx_hbm,  # [BH, nQt, 8, maxK] int32 (HBM, row-replicated tiles)
    q_ref,  # [1, q_block, D]
    kv_ref,  # ANY: packed [BH, nK * 2*KV_BLOCK, D] (per-block K rows then V)
    o_ref,
    lse_ref,  # [1, 8, q_block]
    idxbuf,  # SMEM (2, 8, maxK) int32 (double-buffered across grid steps)
    kvbuf,  # VMEM (NBUF, segs, 2*seg_rows, D)
    sem, idx_sem,
    *, scale, bias, kv_valid_len, kv_pad_len, q_block,
    seg_rows=KV_BLOCK, segs=None, lane_pack=False,
):
    """Grouped block-gather flash forward.

    GROUP mask-selected 128-blocks are fetched per iteration (one DMA each,
    K and V packed together) and attended as a single GROUP*128-wide MXU
    tile; invalid lanes (count remainder, padded tails) are masked.  Index
    lists for the *next* grid step are DMA'd while the current one computes.
    """
    if segs is None:
        segs = GROUP
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
    def _first_list():
        idx_copy(par, bh, qi).start()
    idx_copy(par, bh, qi).wait()
    # Prefetch the next step's list while this step computes.
    nxt_qi = jax.lax.rem(qi + 1, n_qt)
    nxt_bh = bh + jnp.where(qi + 1 == n_qt, 1, 0)

    @pl.when(nxt_bh < pl.num_programs(0))
    def _next_list():
        idx_copy(nxt_par, nxt_bh, nxt_qi).start()

    def kv_copy(slot, t, u):
        blk = idxbuf[par, 0, segs * t + u]
        # lane_pack (d == 64): K|V share the 128 lanes in seg_rows rows.
        rec = seg_rows if lane_pack else 2 * seg_rows
        return pltpu.make_async_copy(
            kv_ref.at[bh, pl.ds(blk * rec, rec), :], kvbuf.at[slot, u],
            sem.at[slot, u],
        )

    # Deep DMA pipeline: up to NBUF group-fetches in flight.
    def prefetch(t):
        @pl.when(t < iters)
        def _():
            slot = jax.lax.rem(t, NBUF)
            for u in range(segs):
                kv_copy(slot, t, u).start()

    for t0 in range(NBUF):
        prefetch(t0)

    q = q_ref[0]
    d = q_ref.shape[-1]
    width = segs * seg_rows
    col = jax.lax.broadcasted_iota(jnp.int32, (q_block, width), 1)
    lane = col % seg_rows
    grp = col // seg_rows

    def body(t, carry):
        m, l, acc = carry
        slot = jax.lax.rem(t, NBUF)
        for u in range(segs):
            kv_copy(slot, t, u).wait()
        kv = kvbuf[slot]  # [segs, 2*seg_rows, D] or lane-packed [segs, seg_rows, 2D]
        if lane_pack:
            kb = kv[:, :, :d].reshape(width, d)
            vb = kv[:, :, d:].reshape(width, d)
        else:
            kb = kv[:, :seg_rows, :].reshape(width, d)
            vb = kv[:, seg_rows:, :].reshape(width, d)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ok = (segs * t + grp) < count
        if kv_valid_len < kv_pad_len:
            src_col = jnp.zeros((q_block, width), jnp.int32)
            for u in range(segs):
                blk_u = idxbuf[par, 0, segs * t + u]
                src_col = jnp.where(grp == u, blk_u * seg_rows + lane, src_col)
            ok = ok & (src_col < kv_valid_len)
        s = jnp.where(ok, s, NEG_INF)
        # base-2 carry (see _dense_fwd_kernel)
        c = scale * LOG2E
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True) * c)
        alpha = jnp.exp2(m - m_new)
        p = jnp.exp2(s * c - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        prefetch(t + NBUF)
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


SPARSE_ROWS = 4  # mask rows processed per grid step (shared DMA pipeline)


def _sparse_fwd_rows_kernel(
    cnt_ref,  # scalar prefetch [BH, nQt] int32
    idx_hbm,  # [BH, nQt, 8, maxK] int32 (HBM)
    q_ref,  # [1, R*q_block, D]
    kv_ref,  # ANY packed K/V records
    o_ref,  # [1, R*q_block, D]
    lse_ref,  # [1, 8, R*q_block]
    idxbuf,  # SMEM (2, R, 8, maxK)
    kvbuf,  # VMEM (NBUF, GROUP, ...)
    sem, idx_sem,
    *, scale, bias, kv_valid_len, kv_pad_len, q_block, lane_pack=False,
):
    """Multi-row grouped gather forward: R mask rows share one grid step.

    Low-density rows leave each 128-row grid step with only 1-2 gather
    iterations, so the per-step pipeline overhead (~1.6us on v5e) dominates
    — at CogVideoX geometry (48 heads x 139 rows) that floor alone was
    ~11 ms.  Packing R rows per step divides the step count by R; each row
    keeps its own index list and m/l/acc (no union-style MXU waste), and
    the kv DMA pipeline runs over the *flattened* (row, iteration) space so
    it stays full across row boundaries.
    """
    segs = GROUP
    seg_rows = KV_BLOCK
    r_rows = SPARSE_ROWS
    bh = pl.program_id(0)
    step = pl.program_id(1)
    n_steps = pl.num_programs(1)
    par = jax.lax.rem(step + bh * n_steps, 2)
    nxt_par = jax.lax.rem(step + bh * n_steps + 1, 2)

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

    counts = [cnt_ref[bh, step * r_rows + r] for r in range(r_rows)]
    iters = [pl.cdiv(c, segs) for c in counts]
    base = [jnp.int32(0)]
    for r in range(r_rows - 1):
        base.append(base[-1] + iters[r])
    total = base[-1] + iters[-1]

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
        blk = idxbuf[par, r_g, 0, segs * local + u]
        rec = seg_rows if lane_pack else 2 * seg_rows
        return pltpu.make_async_copy(
            kv_ref.at[bh, pl.ds(blk * rec, rec), :], kvbuf.at[slot, u],
            sem.at[slot, u],
        )

    def prefetch(g):
        @pl.when(g < total)
        def _():
            slot = jax.lax.rem(g, NBUF)
            for u in range(segs):
                kv_copy(slot, g, u).start()

    for g0 in range(NBUF):
        prefetch(jnp.int32(g0))

    d = q_ref.shape[-1]
    width = segs * seg_rows
    col = jax.lax.broadcasted_iota(jnp.int32, (q_block, width), 1)
    lane = col % seg_rows
    grp = col // seg_rows

    n_kt = kv_pad_len // KV_BLOCK
    for r in range(r_rows):  # python-unrolled: static row slices
        q = q_ref[0, r * q_block:(r + 1) * q_block, :]
        count = counts[r]
        # Ascending lists put the (only possibly partial) boundary block
        # last: padded-tail masking is ONE column limit on the final gather
        # iteration instead of a per-segment where-chain (the chain cost
        # ~segs [128,1024] selects per iteration).
        j_last = jnp.maximum(count - 1, 0)
        t_last = j_last // segs
        u_last = jax.lax.rem(j_last, segs)
        last_entry = idxbuf[par, r, 0, j_last]
        lim = jnp.where(
            last_entry == n_kt - 1,
            u_last * seg_rows + (kv_valid_len - (n_kt - 1) * seg_rows),
            jnp.int32(width))

        def body(t, carry, r=r, count=count, t_last=t_last, lim=lim):
            m, l, acc = carry
            g = base[r] + t
            slot = jax.lax.rem(g, NBUF)
            for u in range(segs):
                kv_copy(slot, g, u).wait()
            kv = kvbuf[slot]
            if lane_pack:
                kb = kv[:, :, :d].reshape(width, d)
                vb = kv[:, :, d:].reshape(width, d)
            else:
                kb = kv[:, :seg_rows, :].reshape(width, d)
                vb = kv[:, seg_rows:, :].reshape(width, d)
            s = jax.lax.dot_general(
                q, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ok = (segs * t + grp) < count
            if kv_valid_len < kv_pad_len:
                limit = jnp.where(t == t_last, lim, jnp.int32(width))
                ok = ok & (col < limit)
            s = jnp.where(ok, s, NEG_INF)
            c = scale * LOG2E  # base-2 carry (see _dense_fwd_kernel)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True) * c)
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s * c - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha + pv
            prefetch(g + NBUF)
            return m_new, l, acc

        m0 = jnp.full((q_block, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((q_block, 1), jnp.float32)
        acc0 = jnp.zeros((q_block, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, iters[r], body, (m0, l0, acc0))

        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, r * q_block:(r + 1) * q_block, :] = (
            acc / l_safe).astype(o_ref.dtype)
        lse = jnp.where(l == 0.0, NEG_INF,
                        m * (1.0 / LOG2E) + bias + jnp.log(l_safe))
        lse_ref[0, :, r * q_block:(r + 1) * q_block] = jnp.broadcast_to(
            jnp.transpose(lse, (1, 0)), (8, q_block))


QGROUP = 2  # mask rows sharing one gathered q tile (union gathering)
# Union gathering helps only when adjacent mask rows overlap heavily (high
# Gilbert locality); on uncorrelated masks the row-masked MXU waste loses
# (measured 17.3 -> 30ms on iid masks). Off by default; flip per experiment.
SPARSE_UNION = False


def _sparse_fwd_union_kernel(
    cnt_ref,  # [BH, nQt2] int32 (SMEM prefetch): union counts
    idx_hbm,  # [BH, nQt2, 8, maxK] int32: (validity_bits << 16) | block_idx
    q_ref,  # [1, QGROUP*128, D]
    kv_ref,  # ANY packed [BH, nK * 2*KV_BLOCK, D]
    o_ref,
    lse_ref,  # [1, 8, QGROUP*128]
    idxbuf,  # SMEM (2, 8, maxK)
    kvbuf,  # VMEM (NBUF, GROUP, 2*KV_BLOCK, D)
    sem, idx_sem,
    *, scale, bias, kv_valid_len, kv_pad_len, q_block,
):
    """Union block-gather flash forward.

    One 256-row query tile covers QGROUP=2 mask rows; each key block in the
    UNION of their selections is fetched once, and per-row validity bits
    (packed in the high half of the index word) mask the rows that did not
    select it.  With Gilbert locality, adjacent rows overlap heavily, so
    this nearly halves the gather traffic of the 128-row kernel while
    computing exactly the reference mask semantics.
    """
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    n_qt = pl.num_programs(1)
    count = cnt_ref[bh, qi]
    iters = pl.cdiv(count, GROUP)
    flat = bh * n_qt + qi
    par = jax.lax.rem(flat, 2)
    nxt_par = jax.lax.rem(flat + 1, 2)

    def idx_copy(buf_par, b_i, q_i):
        return pltpu.make_async_copy(
            idx_hbm.at[b_i, q_i], idxbuf.at[buf_par], idx_sem.at[buf_par]
        )

    @pl.when(flat == 0)
    def _first_list():
        idx_copy(par, bh, qi).start()
    idx_copy(par, bh, qi).wait()
    nxt_qi = jax.lax.rem(qi + 1, n_qt)
    nxt_bh = bh + jnp.where(qi + 1 == n_qt, 1, 0)

    @pl.when(nxt_bh < pl.num_programs(0))
    def _next_list():
        idx_copy(nxt_par, nxt_bh, nxt_qi).start()

    def kv_copy(slot, t, u):
        blk = idxbuf[par, 0, GROUP * t + u] & 0xFFFF
        rec = 2 * KV_BLOCK
        return pltpu.make_async_copy(
            kv_ref.at[bh, pl.ds(blk * rec, rec), :], kvbuf.at[slot, u],
            sem.at[slot, u],
        )

    def prefetch(t):
        @pl.when(t < iters)
        def _():
            slot = jax.lax.rem(t, NBUF)
            for u in range(GROUP):
                kv_copy(slot, t, u).start()

    for t0 in range(NBUF):
        prefetch(t0)

    rows = QGROUP * 128
    q = q_ref[0]
    d = q_ref.shape[-1]
    width = GROUP * KV_BLOCK
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    lane = col % KV_BLOCK
    grp = col // KV_BLOCK
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0)
    rbit = jnp.where(row < 128, 1, 2)  # which validity bit applies per row

    def body(t, carry):
        m, l, acc = carry
        slot = jax.lax.rem(t, NBUF)
        for u in range(GROUP):
            kv_copy(slot, t, u).wait()
        kv = kvbuf[slot]  # [GROUP, 2*KV_BLOCK, D]
        kb = kv[:, :KV_BLOCK, :].reshape(width, d)
        vb = kv[:, KV_BLOCK:, :].reshape(width, d)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ok = (GROUP * t + grp) < count
        # Per-row validity from the packed high bits + optional tail mask.
        bits = jnp.zeros((rows, width), jnp.int32)
        for u in range(GROUP):
            entry = idxbuf[par, 0, GROUP * t + u]
            bits = jnp.where(grp == u, entry >> 16, bits)
        ok = ok & ((bits & rbit) > 0)
        if kv_valid_len < kv_pad_len:
            src_col = jnp.zeros((rows, width), jnp.int32)
            for u in range(GROUP):
                blk_u = idxbuf[par, 0, GROUP * t + u] & 0xFFFF
                src_col = jnp.where(grp == u, blk_u * KV_BLOCK + lane, src_col)
            ok = ok & (src_col < kv_valid_len)
        s = jnp.where(ok, s, NEG_INF)
        c = scale * LOG2E  # base-2 carry (see _dense_fwd_kernel)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True) * c)
        alpha = jnp.exp2(m - m_new)
        p = jnp.exp2(s * c - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        prefetch(t + NBUF)
        return m_new, l, acc

    m0 = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, iters, body, (m0, l0, acc0))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse = jnp.where(l == 0.0, NEG_INF,
                    m * (1.0 / LOG2E) + bias + jnp.log(l_safe))
    lse_ref[0] = jnp.broadcast_to(jnp.transpose(lse, (1, 0)), lse_ref.shape[1:])


def _sparse_dq_kernel(
    cnt_ref,
    idx_hbm,  # [BH, nQt, 8, maxK]
    q_ref, do_ref, lse_ref, delta_ref, glse_ref,  # tiles via BlockSpec
    kv_ref,  # ANY packed [BH, nK * 2*KV_BLOCK, D]
    dq_ref,
    idxbuf,  # SMEM (2, 8, maxK)
    kvbuf,  # VMEM (NBUF, GROUP, 2*KV_BLOCK, D)
    sem, idx_sem,
    *, scale, bias, kv_valid_len, kv_pad_len, q_block,
    seg_rows=KV_BLOCK, segs=None, lane_pack=False,
):
    """Grouped dQ: gathers GROUP selected K/V blocks (packed, one DMA each)
    per iteration, mirroring the forward kernel's pipeline."""
    if segs is None:
        segs = GROUP
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

    def kv_copy(slot, t, u):
        blk = idxbuf[par, 0, segs * t + u]
        # lane_pack (d == 64): K|V share the 128 lanes in seg_rows rows.
        rec = seg_rows if lane_pack else 2 * seg_rows
        return pltpu.make_async_copy(
            kv_ref.at[bh, pl.ds(blk * rec, rec), :], kvbuf.at[slot, u],
            sem.at[slot, u],
        )

    def prefetch(t):
        @pl.when(t < iters)
        def _():
            slot = jax.lax.rem(t, NBUF)
            for u in range(segs):
                kv_copy(slot, t, u).start()

    for t0 in range(NBUF):
        prefetch(t0)

    q = q_ref[0]
    do = do_ref[0]
    lse = jnp.transpose(lse_ref[0, 0:1, :], (1, 0))
    lse2 = (lse - bias) * LOG2E  # loop-invariant base-2 row vector
    rest = jnp.transpose(glse_ref[0, 0:1, :] - delta_ref[0, 0:1, :], (1, 0))
    d = q_ref.shape[-1]
    width = segs * seg_rows
    col = jax.lax.broadcasted_iota(jnp.int32, (q_block, width), 1)
    lane = col % seg_rows
    grp = col // seg_rows

    def body(t, dq):
        slot = jax.lax.rem(t, NBUF)
        for u in range(segs):
            kv_copy(slot, t, u).wait()
        kv = kvbuf[slot]
        if lane_pack:
            kb = kv[:, :, :d].reshape(width, d)
            vb = kv[:, :, d:].reshape(width, d)
        else:
            kb = kv[:, :seg_rows, :].reshape(width, d)
            vb = kv[:, seg_rows:, :].reshape(width, d)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ok = (segs * t + grp) < count
        if kv_valid_len < kv_pad_len:
            src_col = jnp.zeros((q_block, width), jnp.int32)
            for u in range(segs):
                blk_u = idxbuf[par, 0, segs * t + u]
                src_col = jnp.where(grp == u, blk_u * seg_rows + lane, src_col)
            ok = ok & (src_col < kv_valid_len)
        s = jnp.where(ok, s, NEG_INF)
        # p = exp(s*scale + bias - lse) in one base-2 broadcast-fma pass.
        p = jnp.exp2(s * (scale * LOG2E) - lse2)
        dov = jax.lax.dot_general(
            do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dov + rest)).astype(kb.dtype)
        dq = dq + jax.lax.dot_general(
            ds, kb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        prefetch(t + NBUF)
        return dq

    dq = jax.lax.fori_loop(0, iters, body, jnp.zeros((q_block, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


GROUP_Q = 4  # gathered q blocks per dK/dV iteration


def _sparse_dkv_kernel(
    tcnt_ref,  # [BH, nKt]
    tidx_hbm,  # [BH, nKt, 8, maxQ]
    k_ref,  # [1, KV_BLOCK, D]
    v_ref,
    qdo_ref,  # ANY packed [BH, nQt * 2*q_block, D]
    stats_ref,  # ANY packed [BH, nQt * 24, q_block] f32 (lse/delta/glse tiles)
    dk_ref, dv_ref,
    idxbuf,  # SMEM (2, 8, maxQ)
    qdobuf,  # VMEM (NBUF, GROUP_Q, 2*q_block, D)
    statbuf,  # VMEM (NBUF, GROUP_Q, 24, q_block) f32
    sem, idx_sem,
    *, scale, bias, kv_valid_len, kv_pad_len, q_block,
    kv_rows=KV_BLOCK, lane_pack=False,
):
    """Grouped dK/dV: gathers GROUP_Q selected (q, dO, stats) block records
    (2 DMAs per block) per iteration, keyed on the transposed mask lists."""
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    n_kt = pl.num_programs(1)
    count = tcnt_ref[bh, ki]
    iters = pl.cdiv(count, GROUP_Q)
    flat = bh * n_kt + ki
    par = jax.lax.rem(flat, 2)
    nxt_par = jax.lax.rem(flat + 1, 2)

    def idx_copy(buf_par, b_i, k_i):
        return pltpu.make_async_copy(
            tidx_hbm.at[b_i, k_i], idxbuf.at[buf_par], idx_sem.at[buf_par]
        )

    @pl.when(flat == 0)
    def _first():
        idx_copy(par, bh, ki).start()
    idx_copy(par, bh, ki).wait()
    nxt_ki = jax.lax.rem(ki + 1, n_kt)
    nxt_bh = bh + jnp.where(ki + 1 == n_kt, 1, 0)

    @pl.when(nxt_bh < pl.num_programs(0))
    def _next():
        idx_copy(nxt_par, nxt_bh, nxt_ki).start()

    def qdo_copy(slot, t, u):
        blk = idxbuf[par, 0, GROUP_Q * t + u]
        rec = q_block if lane_pack else 2 * q_block
        return pltpu.make_async_copy(
            qdo_ref.at[bh, pl.ds(blk * rec, rec), :], qdobuf.at[slot, u],
            sem.at[slot, 2 * u],
        )

    def stats_copy(slot, t, u):
        blk = idxbuf[par, 0, GROUP_Q * t + u]
        return pltpu.make_async_copy(
            stats_ref.at[bh, pl.ds(blk * 24, 24), :], statbuf.at[slot, u],
            sem.at[slot, 2 * u + 1],
        )

    def prefetch(t):
        @pl.when(t < iters)
        def _():
            slot = jax.lax.rem(t, NBUF)
            for u in range(GROUP_Q):
                qdo_copy(slot, t, u).start()
                stats_copy(slot, t, u).start()

    for t0 in range(NBUF):
        prefetch(t0)

    kb = k_ref[0]
    vb = v_ref[0]
    d = k_ref.shape[-1]
    rows = GROUP_Q * q_block
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, kv_rows), 0)
    rgrp = row // q_block

    def body(t, carry):
        dk, dv = carry
        slot = jax.lax.rem(t, NBUF)
        for u in range(GROUP_Q):
            qdo_copy(slot, t, u).wait()
            stats_copy(slot, t, u).wait()
        qdo = qdobuf[slot]  # [GROUP_Q, 2*q_block, D] or lane-packed
        if lane_pack:
            qb = qdo[:, :, :d].reshape(rows, d)
            dob = qdo[:, :, d:].reshape(rows, d)
        else:
            qb = qdo[:, :q_block, :].reshape(rows, d)
            dob = qdo[:, q_block:, :].reshape(rows, d)
        st = statbuf[slot]  # [GROUP_Q, 24, q_block]
        lse = jnp.concatenate(
            [jnp.transpose(st[u, 0:1, :], (1, 0)) for u in range(GROUP_Q)],
            axis=0,
        )  # [rows, 1]
        rest = jnp.concatenate(
            [
                jnp.transpose(st[u, 16:17, :] - st[u, 8:9, :], (1, 0))
                for u in range(GROUP_Q)
            ],
            axis=0,
        )
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ok = (GROUP_Q * t + rgrp) < count
        if kv_valid_len < kv_pad_len:
            colk = jax.lax.broadcasted_iota(jnp.int32, (rows, kv_rows), 1)
            ok = ok & (ki * kv_rows + colk < kv_valid_len)
        s = jnp.where(ok, s, NEG_INF)
        # p = exp(s*scale + bias - lse) in one base-2 broadcast-fma pass.
        p = jnp.exp2(s * (scale * LOG2E) - (lse - bias) * LOG2E)
        dv_part = jax.lax.dot_general(
            p.astype(dob.dtype), dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dov = jax.lax.dot_general(
            dob, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dov + rest)).astype(qb.dtype)
        dk_part = jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        prefetch(t + NBUF)
        return dk + dk_part, dv + dv_part

    dk0 = jnp.zeros((kv_rows, d), jnp.float32)
    dv0 = jnp.zeros((kv_rows, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, iters, body, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _common_kwargs(scale, bias, kv_valid_len, kv_pad_len, q_block):
    return dict(
        scale=scale, bias=bias, kv_valid_len=kv_valid_len,
        kv_pad_len=kv_pad_len, q_block=q_block,
    )


def _dense_tiles(lq, lk):
    """(q_tile, kv_tile) for the dense kernels: the widest tile that does
    not inflate the padded length (short pooled-branch keys would otherwise
    pay up to 40% padding waste at 1024-wide tiles)."""

    def pick(n, pref):
        padded128 = -(-n // 128) * 128
        if padded128 <= 128:
            return padded128
        # Widest tile whose padding waste stays under ~12.5% (tile width
        # buys far more than a few percent of padded compute).  Short
        # sequences take a single full-width tile — capped at 1280: tiles
        # much wider than pref make the (q_tile, kv_tile) f32 score
        # intermediate blow past the Mosaic compiler's budget (2048-square
        # fails to compile on v5e).
        if padded128 <= min(2 * pref, 1280):
            return padded128
        best = 128
        t = 128
        while t <= pref:
            cost = -(-padded128 // t) * t
            if cost <= padded128 * 1.125:
                best = t
            t *= 2
        return best

    return pick(lq, DENSE_Q_TILE), pick(lk, DENSE_KV_TILE)


def _fwd_call(q, k, v, lists, *, scale, bias, kv_valid_len, q_block, kv_tile,
              interpret, union_bound=None):
    bh, lq, d = q.shape
    lk_pad = k.shape[1]
    n_qt = lq // q_block
    kw = _common_kwargs(scale, bias, kv_valid_len, lk_pad, q_block)

    if lists is None:  # dense
        n_kt = lk_pad // kv_tile
        dv = v.shape[-1]  # may differ from d (wide one-hot pooling V)
        out, lse8 = pl.pallas_call(
            functools.partial(_dense_fwd_kernel, **kw),
            grid=(bh, n_qt, n_kt),
            in_specs=[
                pl.BlockSpec((1, q_block, d), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, kv_tile, d), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, kv_tile, dv), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, q_block, dv), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, 8, q_block), lambda b, i, j: (b, 0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, lq, dv), q.dtype),
                jax.ShapeDtypeStruct((bh, 8, lq), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((q_block, 128), jnp.float32),
                pltpu.VMEM((q_block, 128), jnp.float32),
                pltpu.VMEM((q_block, dv), jnp.float32),
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * bh * lq * lk_pad * (d + dv),
                bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
                transcendentals=bh * lq * lk_pad,
            ),
        )(q, k, v)
        return out, lse8[:, 0, :]
    n_kt = lk_pad // KV_BLOCK

    mask = lists  # masked path receives the [BH, nQt, nK] mask here
    if not SPARSE_UNION:
        return _fwd_call_direct(
            q, k, v, mask, scale=scale, bias=bias, kv_valid_len=kv_valid_len,
            q_block=q_block, interpret=interpret, kw=kw,
        )
    # Union gathering: 256-row q tiles over the union of each row pair's
    # selections, validity bits packed above the 16-bit block index.
    from blade.attention.masks import union_block_lists

    u_idx, u_cnt, u_bits = union_block_lists(
        mask, group=QGROUP, bound=union_bound)
    fused = (u_idx | (u_bits << 16)).astype(jnp.int32)
    fused4, u_cnt = _tile_lists(fused, u_cnt)
    if fused4.shape[-1] % GROUP:
        padn = GROUP - fused4.shape[-1] % GROUP
        fused4 = jnp.pad(fused4, ((0, 0), (0, 0), (0, 0), (0, padn)), mode="edge")
    max_k = fused4.shape[-1]
    n_qt2 = n_qt // QGROUP
    rows = QGROUP * q_block

    kv_packed = jnp.concatenate(
        [k.reshape(bh, n_kt, KV_BLOCK, d), v.reshape(bh, n_kt, KV_BLOCK, d)],
        axis=2,
    ).reshape(bh, n_kt * 2 * KV_BLOCK, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_qt2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # idx lists: HBM (row DMAs)
            pl.BlockSpec((1, rows, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, 8, rows), lambda b, i, *_: (b, 0, i)),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, 8, max_k), jnp.int32),
            pltpu.VMEM((NBUF, GROUP, 2 * KV_BLOCK, d), k.dtype),
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, lse8 = pl.pallas_call(
        functools.partial(_sparse_fwd_union_kernel, **kw),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, lq), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_qt * q_block * max_k * KV_BLOCK * d,
            bytes_accessed=q.size * q.dtype.itemsize
            + bh * n_qt2 * max_k * KV_BLOCK * d * k.dtype.itemsize,
            transcendentals=bh * lq * max_k * KV_BLOCK,
        ),
    )(u_cnt, fused4, q, kv_packed)
    return out, lse8[:, 0, :]


def _bwd_call(
    q, k, v, out, lse, g_out, g_lse, lists, t_lists,
    *, scale, bias, kv_valid_len, q_block, kv_tile, interpret
):
    bh, lq, d = q.shape
    lk_pad = k.shape[1]
    n_qt = lq // q_block
    n_kt = lk_pad // (kv_tile if lists is None else KV_BLOCK)
    kw = _common_kwargs(scale, bias, kv_valid_len, lk_pad, q_block)

    delta = jnp.sum(g_out.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    g_lse = g_lse.astype(jnp.float32)
    lse_f = lse.astype(jnp.float32)

    def rep8(x):  # [BH, Lq] -> [BH, 8, Lq] row-replicated
        return jnp.broadcast_to(x[:, None, :], (x.shape[0], 8, x.shape[1]))

    def tiles4(x):  # [BH, Lq] -> [BH, nQt, 8, q_block] row-replicated tiles
        return jnp.broadcast_to(
            x.reshape(bh, n_qt, 1, q_block), (bh, n_qt, 8, q_block)
        )

    if lists is None:  # dense backward
        # The bwd kernels hold p, dov and ds alongside the f32 scores —
        # 3x the forward's live tile bytes — so the forward's wide KV pick
        # (4096) blows the 16 MB scoped-VMEM budget.  Cap both tiles at
        # the measured-safe 1024 (tiles divide the fwd-padded lengths:
        # powers of two <= the fwd picks).
        q_block = min(q_block, 1024)
        kv_tile = min(kv_tile, 1024)
        n_qt = lq // q_block
        n_kt = lk_pad // kv_tile
        kw = _common_kwargs(scale, bias, kv_valid_len, lk_pad, q_block)
        stats_spec = pl.BlockSpec((1, 8, q_block), lambda b, i, j: (b, 0, i))
        qtile_spec = pl.BlockSpec((1, q_block, d), lambda b, i, j: (b, i, 0))
        ktile_spec = pl.BlockSpec((1, kv_tile, d), lambda b, i, j: (b, j, 0))
        dq = pl.pallas_call(
            functools.partial(_dense_dq_kernel, **kw),
            grid=(bh, n_qt, n_kt),
            in_specs=[
                qtile_spec, qtile_spec, stats_spec, stats_spec, stats_spec,
                ktile_spec, ktile_spec,
            ],
            out_specs=pl.BlockSpec((1, q_block, d), lambda b, i, j: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            scratch_shapes=[pltpu.VMEM((q_block, d), jnp.float32)],
            interpret=interpret,
        )(q, g_out, rep8(lse_f), rep8(delta), rep8(g_lse), k, v)

        kblk_spec = pl.BlockSpec((1, kv_tile, d), lambda b, i, j: (b, i, 0))
        qj_spec = pl.BlockSpec((1, q_block, d), lambda b, i, j: (b, j, 0))
        statsj_spec = pl.BlockSpec((1, 8, q_block), lambda b, i, j: (b, 0, j))
        dk, dv = pl.pallas_call(
            functools.partial(_dense_dkv_kernel, **kw),
            grid=(bh, n_kt, n_qt),
            in_specs=[
                kblk_spec, kblk_spec, qj_spec, qj_spec,
                statsj_spec, statsj_spec, statsj_spec,
            ],
            out_specs=[kblk_spec, kblk_spec],
            out_shape=[
                jax.ShapeDtypeStruct((bh, lk_pad, d), k.dtype),
                jax.ShapeDtypeStruct((bh, lk_pad, d), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((kv_tile, d), jnp.float32),
                pltpu.VMEM((kv_tile, d), jnp.float32),
            ],
            interpret=interpret,
        )(k, v, q, g_out, rep8(lse_f), rep8(delta), rep8(g_lse))
        return dq, dk, dv

    kv_idx, kv_cnt = lists
    t_idx, t_cnt = t_lists
    max_k = kv_idx.shape[-1]
    max_q = t_idx.shape[-1]

    from blade.kernels.pack import pack_kv

    lane_pack = d == 64
    kv_packed = pack_kv(k, v, lane_pack=lane_pack, interpret=interpret)
    if lane_pack:
        kv_buf_shape = (NBUF, GROUP, KV_BLOCK, 2 * d)
    else:
        kv_buf_shape = (NBUF, GROUP, 2 * KV_BLOCK, d)

    dq_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_qt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, q_block, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, q_block, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, 8, q_block), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec((1, 8, q_block), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec((1, 8, q_block), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda b, i, *_: (b, i, 0)),
        scratch_shapes=[
            pltpu.SMEM((2, 8, max_k), jnp.int32),
            pltpu.VMEM(kv_buf_shape, k.dtype),
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dq = pl.pallas_call(
        functools.partial(_sparse_dq_kernel, lane_pack=lane_pack, **kw),
        grid_spec=dq_grid,
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        interpret=interpret,
    )(kv_cnt, kv_idx, q, g_out, rep8(lse_f), rep8(delta), rep8(g_lse), kv_packed)

    # Packed per-q-block records for the dK/dV gather: [q; dO] and the three
    # stat tiles stacked on sublanes.
    if lane_pack:
        qdo_packed = jnp.concatenate(
            [q.reshape(bh, n_qt, q_block, d),
             g_out.astype(q.dtype).reshape(bh, n_qt, q_block, d)],
            axis=3,
        ).reshape(bh, n_qt * q_block, 2 * d)
        qdo_buf_shape = (NBUF, GROUP_Q, q_block, 2 * d)
    else:
        qdo_packed = jnp.concatenate(
            [q.reshape(bh, n_qt, q_block, d),
             g_out.astype(q.dtype).reshape(bh, n_qt, q_block, d)],
            axis=2,
        ).reshape(bh, n_qt * 2 * q_block, d)
        qdo_buf_shape = (NBUF, GROUP_Q, 2 * q_block, d)
    stats_packed = jnp.concatenate(
        [tiles4(lse_f), tiles4(delta), tiles4(g_lse)], axis=2
    ).reshape(bh, n_qt * 24, q_block)

    dkv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_kt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, KV_BLOCK, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, KV_BLOCK, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, KV_BLOCK, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, KV_BLOCK, d), lambda b, i, *_: (b, i, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, 8, max_q), jnp.int32),
            pltpu.VMEM(qdo_buf_shape, q.dtype),
            pltpu.VMEM((NBUF, GROUP_Q, 24, q_block), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 2 * GROUP_Q)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_sparse_dkv_kernel, lane_pack=lane_pack, **kw),
        grid_spec=dkv_grid,
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk_pad, d), v.dtype),
        ],
        interpret=interpret,
    )(t_cnt, t_idx, k, v, qdo_packed, stats_packed)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API (custom VJP over padded, [BH, L, D]-folded arrays)
# ---------------------------------------------------------------------------


def _pad_len(n: int, block: int) -> int:
    return -(-n // block) * block


def _tile_lists(idx, cnt):
    """[BH, n, m] lists -> ([BH, n, 8, m128] HBM-tileable form, counts).

    Mosaic tiles the last two dims of any (even HBM) memref at (8, 128) for
    int32, so per-row DMA slices must themselves be full tiles: pad the list
    length to a 128 multiple and replicate across an 8-row sublane axis.
    """
    bh, n, m = idx.shape
    m_pad = -(-m // 128) * 128
    if m_pad != m:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, m_pad - m)), mode="edge")
    idx4 = jnp.broadcast_to(idx[:, :, None, :], (bh, n, 8, m_pad))
    return idx4, cnt


def _lists_from_mask(mask):
    if mask is None:
        return None, None
    lists = _tile_lists(*mask_to_block_lists(mask))
    t_lists = _tile_lists(*mask_to_block_lists(jnp.swapaxes(mask, -1, -2)))
    return lists, t_lists


def _attn_core_fwd(q, k, v, mask, scale, bias, q_block, kv_tile, kv_valid_len,
                   interpret, union_bound=None):
    out, lse = _fwd_call(
        q, k, v, mask,
        scale=scale, bias=bias, kv_valid_len=kv_valid_len, q_block=q_block,
        kv_tile=kv_tile, interpret=interpret, union_bound=union_bound,
    )
    return (out, lse), (q, k, v, mask, out, lse)


def _attn_core_bwd(scale, bias, q_block, kv_tile, kv_valid_len, interpret,
                   union_bound, res, g):
    q, k, v, mask, out, lse = res
    g_out, g_lse = g
    lists, t_lists = _lists_from_mask(mask)
    dq, dk, dv = _bwd_call(
        q, k, v, out, lse, g_out, g_lse, lists, t_lists,
        scale=scale, bias=bias, kv_valid_len=kv_valid_len, q_block=q_block,
        kv_tile=kv_tile, interpret=interpret,
    )
    # Boolean masks are non-differentiable: their cotangent is float0.
    dmask = None if mask is None else np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _attn_with_lse(q, k, v, mask, scale, bias, q_block, kv_tile, kv_valid_len,
                   interpret, union_bound=None):
    (out, lse), _ = _attn_core_fwd(q, k, v, mask, scale, bias, q_block, kv_tile,
                                   kv_valid_len, interpret, union_bound)
    return out, lse


_attn_with_lse.defvjp(_attn_core_fwd, _attn_core_bwd)


def block_sparse_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_mask: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    bias: float = 0.0,
    q_block: int = DEFAULT_Q_BLOCK,
    interpret: Optional[bool] = None,
    union_bound: Optional[int] = None,
):
    """Block-sparse flash attention with LSE.

    Args:
      q, k, v: ``[B, H, L, D]`` (bf16/f32).  ``Lq`` and ``Lk`` may be ragged;
        inputs are zero-padded to 128 multiples and the padding is masked.
      block_mask: bool ``[B, H, ceil(Lq/q_block), ceil(Lk/128)]``; ``None``
        means dense.
      scale: softmax scale (default ``1/sqrt(D)``).
      bias: scalar added to every score (e.g. ``log(level)`` for pooled
        branches).
      q_block: query tile rows (the mask's row granularity).
      union_bound: static bound on every non-full union row's selection
        (see ``masks.union_block_lists``) — rows above it must be fully on.
        Cuts the mask->lists glue from an n_k argsort to one bounded top_k.

    Returns:
      ``(out [B, H, Lq, D], lse [B, H, Lq])`` — lse in natural log.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    if interpret is None:
        interpret = _interpret_default()

    # Gather DMAs need lane-complete records.  d == 64 lane-packs K|V (and
    # q|dO) side by side into 128 lanes (no waste); other sub-128 head dims
    # zero-pad to 128 (exact: padded lanes contribute nothing and padded
    # grads vanish).  The dense path uses BlockSpecs only and never pads.
    d_orig = d
    if block_mask is not None and d < 128 and (d != 64 or SPARSE_UNION):
        pad_d = 128 - d
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
        d = 128

    if block_mask is None:
        # Dense path: wide tiles (pipeline-efficient); padding masked below.
        q_block, kv_tile = _dense_tiles(lq, lk)
    else:
        kv_tile = KV_BLOCK
    lq_pad = _pad_len(lq, q_block)
    lk_pad = _pad_len(lk, kv_tile)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0))) if lq_pad != lq else q
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0))) if lk_pad != lk else k
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0))) if lk_pad != lk else v

    qp = qp.reshape(b * h, lq_pad, d)
    kp = kp.reshape(b * h, lk_pad, d)
    vp = vp.reshape(b * h, lk_pad, d)
    mask = None
    if block_mask is not None:
        n_qt_mask = block_mask.shape[-2]
        if q_block != 128:
            raise NotImplementedError("q_block != 128 requires row-group masks (TODO)")
        assert n_qt_mask == lq_pad // q_block, (n_qt_mask, lq_pad, q_block)
        mask = block_mask.reshape(b * h, n_qt_mask, block_mask.shape[-1])
        if n_qt_mask % 2:
            # Union gathering pairs mask rows: pad with an empty row (the
            # extra 128 q rows attend nothing and are sliced off).
            mask = jnp.pad(mask, ((0, 0), (0, 1), (0, 0)))
            qp = jnp.pad(qp, ((0, 0), (0, q_block), (0, 0)))
            lq_pad += q_block

    out, lse = _attn_with_lse(qp, kp, vp, mask, scale, bias, q_block, kv_tile,
                              lk, interpret, union_bound)
    out = out.reshape(b, h, lq_pad, d)[:, :, :lq, :d_orig]
    lse = lse.reshape(b, h, lq_pad)[:, :, :lq]
    return out, lse


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    bias: float = 0.0,
    q_block: int = DEFAULT_Q_BLOCK,
    interpret: Optional[bool] = None,
):
    """Dense flash attention (BlockSpec-pipelined path of the same family)."""
    return block_sparse_attention(
        q, k, v, None, scale=scale, bias=bias, q_block=q_block, interpret=interpret
    )


def flash_attention_wide_v(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    bias: float = 0.0,
    interpret: Optional[bool] = None,
):
    """Forward-only dense flash whose V feature width is independent of Q/K's.

    Used by the sum predictor: V is a one-hot block-pooling matrix of width
    ``n_k_blocks`` (lane-padded), so ONE pass yields all pooled block masses
    instead of ``ceil(n_k / d)`` full softmax recomputations.  Not
    differentiable (the predictor runs under ``stop_gradient``).

    Returns ``(out [B, H, Lq, Dv], lse [B, H, Lq])``.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    dv = v.shape[3]
    assert v.shape[2] == lk and dv % 128 == 0, (v.shape, lk)
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    if interpret is None:
        interpret = _interpret_default()
    q_block, kv_tile = _dense_tiles(lq, lk)
    lq_pad = _pad_len(lq, q_block)
    lk_pad = _pad_len(lk, kv_tile)

    def pad_seq(t, n):
        return (jnp.pad(t, ((0, 0), (0, 0), (0, n - t.shape[2]), (0, 0)))
                if n != t.shape[2] else t)

    qp = pad_seq(q, lq_pad).reshape(b * h, lq_pad, d)
    kp = pad_seq(k, lk_pad).reshape(b * h, lk_pad, d)
    vp = pad_seq(v, lk_pad).reshape(b * h, lk_pad, dv)
    out, lse = _fwd_call(
        qp, kp, vp, None, scale=scale, bias=bias, kv_valid_len=lk,
        q_block=q_block, kv_tile=kv_tile, interpret=interpret,
    )
    out = out.reshape(b, h, lq_pad, dv)[:, :, :lq]
    lse = lse.reshape(b, h, lq_pad)[:, :, :lq]
    return out, lse


def gather_backward(
    q, k, v, out, lse, g_out, g_lse, lists, t_lists,
    *, scale, bias, kv_valid_len, q_block=DEFAULT_Q_BLOCK,
    seg_rows=KV_BLOCK, interpret=None,
):
    """Grouped-gather backward passes over (possibly pooled) K/V.

    Generalization of the binary sparse backward used by the multi-level
    pooled passes: K/V rows come in ``seg_rows``-row segments (one segment
    per selected original 128-block at level ``128/seg_rows``), q/dO in
    ``q_block``-row blocks.  ``lists``/``t_lists`` are the (padded index,
    count) pairs in original-block coordinates for the forward and
    transposed directions.  Returns ``(dq, dk, dv)``.
    """
    if interpret is None:
        interpret = _interpret_default()
    bh, lq, d = q.shape
    lp = k.shape[1]
    n_qt = lq // q_block
    n_blocks = lp // seg_rows
    segs = max(512 // seg_rows, 1)
    kw = _common_kwargs(scale, bias, kv_valid_len, lp + 1, q_block)

    delta = jnp.sum(g_out.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    g_lse = g_lse.astype(jnp.float32)
    lse_f = lse.astype(jnp.float32)

    def rep8(x):
        return jnp.broadcast_to(x[:, None, :], (x.shape[0], 8, x.shape[1]))

    def tiles4(x):
        return jnp.broadcast_to(
            x.reshape(bh, n_qt, 1, q_block), (bh, n_qt, 8, q_block)
        )

    def pad_to_segs(idx, n):
        m = idx.shape[-1]
        if m % n:
            idx = jnp.pad(idx, ((0, 0), (0, 0), (0, 0), (0, n - m % n)),
                          mode="edge")
        return idx

    kv_idx, kv_cnt = lists
    kv_idx = pad_to_segs(kv_idx, segs)
    t_idx, t_cnt = t_lists
    t_idx = pad_to_segs(t_idx, GROUP_Q)
    max_k = kv_idx.shape[-1]
    max_q = t_idx.shape[-1]

    kv_packed = jnp.concatenate(
        [k.reshape(bh, n_blocks, seg_rows, d), v.reshape(bh, n_blocks, seg_rows, d)],
        axis=2,
    ).reshape(bh, n_blocks * 2 * seg_rows, d)

    dq_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_qt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, q_block, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, q_block, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, 8, q_block), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec((1, 8, q_block), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec((1, 8, q_block), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda b, i, *_: (b, i, 0)),
        scratch_shapes=[
            pltpu.SMEM((2, 8, max_k), jnp.int32),
            pltpu.VMEM((NBUF, segs, 2 * seg_rows, d), k.dtype),
            pltpu.SemaphoreType.DMA((NBUF, segs)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dq = pl.pallas_call(
        functools.partial(_sparse_dq_kernel, seg_rows=seg_rows, segs=segs, **kw),
        grid_spec=dq_grid,
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        interpret=interpret,
    )(kv_cnt, kv_idx, q, g_out, rep8(lse_f), rep8(delta), rep8(g_lse), kv_packed)

    qdo_packed = jnp.concatenate(
        [q.reshape(bh, n_qt, q_block, d),
         g_out.astype(q.dtype).reshape(bh, n_qt, q_block, d)],
        axis=2,
    ).reshape(bh, n_qt * 2 * q_block, d)
    stats_packed = jnp.concatenate(
        [tiles4(lse_f), tiles4(delta), tiles4(g_lse)], axis=2
    ).reshape(bh, n_qt * 24, q_block)

    dkv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, seg_rows, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, seg_rows, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, seg_rows, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, seg_rows, d), lambda b, i, *_: (b, i, 0)),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, 8, max_q), jnp.int32),
            pltpu.VMEM((NBUF, GROUP_Q, 2 * q_block, d), q.dtype),
            pltpu.VMEM((NBUF, GROUP_Q, 24, q_block), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 2 * GROUP_Q)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_sparse_dkv_kernel, kv_rows=seg_rows, **kw),
        grid_spec=dkv_grid,
        out_shape=[
            jax.ShapeDtypeStruct((bh, lp, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lp, d), v.dtype),
        ],
        interpret=interpret,
    )(t_cnt, t_idx, k, v, qdo_packed, stats_packed)
    return dq, dk, dv


def _fwd_call_direct(q, k, v, mask, *, scale, bias, kv_valid_len, q_block,
                     interpret, kw):
    """Multi-row grouped gather forward (default sparse path)."""
    bh, lq, d = q.shape
    lk_pad = k.shape[1]
    n_kt = lk_pad // KV_BLOCK
    r_rows = SPARSE_ROWS
    # Pad the row dimension so each grid step covers exactly R mask rows.
    n_qt = lq // q_block
    if n_qt % r_rows:
        pad_rows = r_rows - n_qt % r_rows
        q = jnp.pad(q, ((0, 0), (0, pad_rows * q_block), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_rows), (0, 0)))
        n_qt += pad_rows
    lq_padded = n_qt * q_block
    kv_idx, kv_cnt = _tile_lists(*mask_to_block_lists(mask))
    if kv_idx.shape[-1] % GROUP:
        padn = GROUP - kv_idx.shape[-1] % GROUP
        kv_idx = jnp.pad(kv_idx, ((0, 0), (0, 0), (0, 0), (0, padn)), mode="edge")
    max_k = kv_idx.shape[-1]
    from blade.kernels.pack import pack_kv

    lane_pack = d == 64
    kv_packed = pack_kv(k, v, lane_pack=lane_pack, interpret=interpret)
    if lane_pack:
        kv_buf_shape = (NBUF, GROUP, KV_BLOCK, 2 * d)
    else:
        kv_buf_shape = (NBUF, GROUP, 2 * KV_BLOCK, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_qt // r_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, r_rows * q_block, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, r_rows * q_block, d), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, 8, r_rows * q_block), lambda b, i, *_: (b, 0, i)),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, r_rows, 8, max_k), jnp.int32),
            pltpu.VMEM(kv_buf_shape, k.dtype),
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, lse8 = pl.pallas_call(
        functools.partial(_sparse_fwd_rows_kernel, lane_pack=lane_pack, **kw),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq_padded, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, lq_padded), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_qt * q_block * max_k * KV_BLOCK * d,
            bytes_accessed=q.size * q.dtype.itemsize
            + 2 * bh * n_qt * max_k * KV_BLOCK * d * k.dtype.itemsize,
            transcendentals=bh * lq * max_k * KV_BLOCK,
        ),
    )(kv_cnt, kv_idx, q, kv_packed)
    return out[:, :lq], lse8[:, 0, :lq]
