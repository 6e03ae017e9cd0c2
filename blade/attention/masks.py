"""Adaptive block-mask prediction for ASA.

Pipeline (reference semantics, rebuilt TPU-first):

  1. :func:`sample_block_tokens` — per-(batch, head) random subsample of 32
     tokens out of each 128-token block of Q and K (reference
     ``random_sample_tokens``, ``cogvideo_blocksparseattn.py:32-55``; note the
     reference draws *one* offset set per (B, H) and reuses it for every
     block — we keep that behavior, it is cheaper and just as unbiased).
  2. :func:`pooled_attention_scores` — block-pooled attention estimate
     ``Po[b,h,i,j] = max over (m in q-block i, n in k-block j) of
     softmax_row(q_s k_s^T * scale)[m, n]`` with rows of ``Po`` normalized to
     sum to one (reference Triton ``attn_pooling_kernel.py``: per-block row
     maxima, renormalized by the row's (m, l) statistics, then column max and
     a final row normalization).
  3. :func:`energy_mask` (training) — keep the smallest top-scoring set of
     key blocks reaching ``energy_threshold`` of each row's mass, clamped to
     ``[min_retain, max_retain] * n_k`` blocks, with the last two block
     rows/columns forced on (reference ``transfer_attn_to_mask`` "energy"
     mode, ``cogvideo_blocksparseattn.py:227-249``).
     :func:`multilevel_mask` (inference) — rank-percentile bands mapped to
     pooling levels {1, 2, 4, 8} with the rest skipped (reference
     ``cogvideo_newattn.py:154-207``).
  4. :func:`mask_to_block_lists` — convert a boolean block mask into padded
     per-row key-block index lists + counts for the Pallas block-gather
     kernel (static shapes; the energy clamp bounds the list length).

Everything here is pure JAX with static shapes and is jit/vmap/scan safe.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "pad_to_block_multiple",
    "sample_block_tokens",
    "pooled_attention_scores",
    "energy_mask",
    "topk_mask",
    "multilevel_mask",
    "multilevel_rank_bands",
    "mask_to_block_lists",
    "mask_density",
]


def pad_to_block_multiple(x: jnp.ndarray, block: int, axis: int = -2) -> jnp.ndarray:
    """Edge-pad ``x`` along ``axis`` up to a multiple of ``block``.

    Mirrors the reference's replicate padding (``pad_to_multiple``,
    ``cogvideo_blocksparseattn.py:20-31``) so tail blocks are filled with
    plausible tokens rather than zeros (zeros would distort the pooled
    softmax estimate).
    """
    axis = axis % x.ndim
    length = x.shape[axis]
    rem = length % block
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, block - rem)
    return jnp.pad(x, pad, mode="edge")


def sample_block_tokens(
    rng: jax.Array, x: jnp.ndarray, block: int = 128, num_keep: int = 32
) -> jnp.ndarray:
    """Subsample ``num_keep`` of every ``block`` tokens, same offsets per (B, H).

    ``x``: ``[B, H, L, D]`` with ``L % block == 0``.  Returns
    ``[B, H, (L // block) * num_keep, D]``.
    """
    b, h, length, d = x.shape
    nblk = length // block
    # One random offset set per (batch, head), shared across blocks: take the
    # indices of the top-`num_keep` uniform draws over the block positions.
    scores = jax.random.uniform(rng, (b, h, block))
    _, offs = jax.lax.top_k(scores, num_keep)  # [B, H, num_keep]
    xb = x.reshape(b, h, nblk, block, d)
    # Row selection as a one-hot matmul instead of a gather: XLA lowers
    # per-(B, H) take_along_axis on the sublane axis to a serial gather loop
    # on TPU (~10 ms at cog geometry); the equivalent [num_keep, block]
    # one-hot contraction is ~2 GFLOP of MXU work and bit-exact (each output
    # row is 1.0 * one input row accumulated once).
    onehot = jax.nn.one_hot(offs, block, dtype=x.dtype)  # [B, H, keep, block]
    sampled = jnp.einsum(
        "bhst,bhntd->bhnsd", onehot, xb,
        preferred_element_type=jnp.float32).astype(x.dtype)
    return sampled.reshape(b, h, nblk * num_keep, d)


def pooled_attention_scores(
    q_s: jnp.ndarray,
    k_s: jnp.ndarray,
    *,
    tokens_per_block: int,
    scale: float | None = None,
    q_chunk: int = 1024,
) -> jnp.ndarray:
    """Block-pooled attention estimate ``Po`` from (sub)sampled Q/K.

    ``q_s``/``k_s``: ``[B, H, Ls, D]`` where every ``tokens_per_block`` rows
    correspond to one 128-token block of the original sequence.  Returns
    ``Po``: ``[B, H, n_q, n_k]`` row-normalized (rows sum to 1).

    Computed in q-chunks via ``lax.map`` so the full ``Ls x Ls`` score matrix
    is never materialized (Ls is ~L/4 after 32/128 sampling; the FLOPs are
    ~1/16 of dense attention, matching the reference's cost envelope).
    """
    b, h, ls, d = q_s.shape
    n_q = ls // tokens_per_block
    n_k = k_s.shape[2] // tokens_per_block
    if scale is None:
        scale = 1.0 / (d**0.5)
    q_chunk = min(q_chunk, ls)
    # Round chunk to a multiple of tokens_per_block so blocks never straddle.
    q_chunk = (q_chunk // tokens_per_block) * tokens_per_block
    n_chunks = -(-ls // q_chunk)
    pad = n_chunks * q_chunk - ls
    if pad:
        # Pad with duplicate rows; the extra block rows are dropped below.
        q_s = jnp.concatenate([q_s, q_s[:, :, :pad]], axis=2)

    # bf16 matmul with f32 accumulate: the estimator is approximate by
    # construction (random token subsampling), so reduced-precision scores
    # cost nothing while f32 matmuls on the MXU would cost ~8x.
    kt = jnp.swapaxes(k_s, -1, -2).astype(jnp.bfloat16)

    def one_chunk(qc):
        # qc: [B, H, q_chunk, D]
        s = jnp.einsum(
            "bhqd,bhdk->bhqk", qc.astype(jnp.bfloat16), kt,
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # Defer the 1/l row normalization until after the key-axis block-max
        # (max is monotone in a positive per-row scale) — avoids a second
        # full [.., Ls, Ls] elementwise pass.
        nq_chunk = qc.shape[2] // tokens_per_block
        pb = p.reshape(b, h, nq_chunk, tokens_per_block, n_k, tokens_per_block)
        per_row = jnp.max(pb, axis=5) / l.reshape(
            b, h, nq_chunk, tokens_per_block, 1
        )
        return jnp.max(per_row, axis=3)  # [B, H, nq_chunk, n_k]

    chunks = q_s.reshape(b, h, n_chunks, q_chunk, d).transpose(2, 0, 1, 3, 4)
    po = jax.lax.map(one_chunk, chunks)  # [n_chunks, B, H, nq_chunk, n_k]
    po = po.transpose(1, 2, 0, 3, 4).reshape(b, h, -1, n_k)[:, :, :n_q]
    return po / jnp.sum(po, axis=-1, keepdims=True)


def _force_last2(mask: jnp.ndarray, on_value) -> jnp.ndarray:
    """Force the last two block rows and columns on (text/EOS blocks)."""
    mask = mask.at[..., :, -2:].set(on_value)
    mask = mask.at[..., -2:, :].set(on_value)
    return mask


def energy_mask(
    scores: jnp.ndarray,
    *,
    min_retain_ratio: float | jnp.ndarray = 0.05,
    max_retain_ratio: float | jnp.ndarray = 0.1,
    energy_threshold: float = 0.95,
    force_last2: bool = True,
) -> jnp.ndarray:
    """Boolean block mask keeping the top blocks holding ``energy_threshold`` mass.

    Per row: sort descending, find the first rank where the cumulative sum
    reaches ``energy_threshold`` of the total, clamp that count to
    ``[max(1, n_k * min_retain), n_k * max_retain]`` and keep the top-count
    blocks.  Retain ratios may be scalars or per-(B, H) arrays.
    """
    n_k = scores.shape[-1]
    scalar_ratios = not (
        hasattr(max_retain_ratio, "ndim") and jnp.ndim(max_retain_ratio) > 0
    )
    if scalar_ratios:
        # Fast path: the retain clamp caps the count at int(n_k * max_ratio),
        # so a top-k of that length replaces the full argsort (15 -> ~2 ms
        # at [12, 256, 256] on v5e; TPU sorts are expensive).
        k_cap = max(int(n_k * float(max_retain_ratio)), 1)
        total = jnp.sum(scores, axis=-1, keepdims=True)
        vals, order = jax.lax.top_k(scores, k_cap)
        cum = jnp.cumsum(vals, axis=-1)
        reached = cum >= energy_threshold * total
        k_idx = jnp.argmax(reached, axis=-1)
        # Rows that do not reach the threshold within k_cap keep k_cap
        # (identical to clip(n_k -> max_retain) in the argsort formulation).
        k_idx = jnp.where(jnp.any(reached, axis=-1), k_idx, k_cap)
        min_retain = max(int(n_k * float(min_retain_ratio)), 1)
        count = jnp.clip(k_idx, min_retain, k_cap)
        keep_sorted = jnp.arange(k_cap) < count[..., None]
        mask = jnp.zeros_like(scores, dtype=bool)
        mask = jnp.put_along_axis(mask, order, keep_sorted, axis=-1, inplace=False)
        if force_last2:
            mask = _force_last2(mask, True)
        return mask

    order = jnp.argsort(-scores, axis=-1, stable=True)
    sorted_scores = jnp.take_along_axis(scores, order, axis=-1)
    cum = jnp.cumsum(sorted_scores, axis=-1)
    total = cum[..., -1:]
    reached = cum >= energy_threshold * total
    # First crossing rank (count of blocks kept); rows that never reach the
    # threshold keep everything.
    k_idx = jnp.argmax(reached, axis=-1)
    k_idx = jnp.where(jnp.any(reached, axis=-1), k_idx, n_k)

    def _retain(ratio):
        r = jnp.maximum((n_k * jnp.asarray(ratio)).astype(jnp.int32), 1)
        # Per-(B, H) ratios broadcast over the query-row axis.
        if r.ndim and r.ndim == k_idx.ndim - 1:
            r = r[..., None]
        return r

    count = jnp.clip(k_idx, _retain(min_retain_ratio), _retain(max_retain_ratio))

    ranks = jnp.arange(n_k)
    keep_sorted = ranks < count[..., None]
    mask = jnp.zeros_like(scores, dtype=bool)
    mask = jnp.put_along_axis(mask, order, keep_sorted, axis=-1, inplace=False)
    if force_last2:
        mask = _force_last2(mask, True)
    return mask


def topk_mask(scores: jnp.ndarray, init_k: float | int, force_last2: bool = True) -> jnp.ndarray:
    """"topk" mode of the reference mask generator (rarely used; parity).

    Keeps ``init_k`` top blocks per row, tripling the count when the kept
    energy is below 60% of the total and scaling by 2/3 when below 90%
    (reference ``transfer_attn_to_mask`` topk branch,
    ``cogvideo_blocksparseattn.py:205-225``).
    """
    n_k = scores.shape[-1]
    k0 = int(n_k * init_k) if init_k < 1 else int(init_k)
    order = jnp.argsort(-scores, axis=-1, stable=True)
    sorted_scores = jnp.take_along_axis(scores, order, axis=-1)
    cum = jnp.cumsum(sorted_scores, axis=-1)
    total = cum[..., -1]
    cur = jnp.full(scores.shape[:-1], k0, dtype=jnp.int32)
    energy_at = jnp.take_along_axis(cum, (cur[..., None] - 1).clip(0), axis=-1)[..., 0]
    need3 = (energy_at < 0.6 * total) & (cur < n_k)
    need23 = (energy_at < 0.9 * total) & (cur < n_k)
    cur = jnp.where(need3, jnp.minimum(cur * 3, n_k), cur)
    cur = jnp.where(need23, jnp.minimum(cur // 3 * 2, n_k), cur)
    keep_sorted = jnp.arange(n_k) < cur[..., None]
    mask = jnp.put_along_axis(
        jnp.zeros_like(scores, dtype=bool), order, keep_sorted, axis=-1, inplace=False
    )
    if force_last2:
        mask = _force_last2(mask, True)
    return mask


# Inference-time multi-level bands: fraction-of-rank -> pooling level.
# level 1 = full attention, level L = L-times mean-pooled K/V, 0 = skip.
DEFAULT_MASK_RATIOS: Dict[int, Tuple[float, float]] = {
    1: (0.0, 0.05),
    2: (0.05, 0.15),
    4: (0.15, 0.25),
    8: (0.25, 0.5),
    0: (0.5, 1.0),
}


def multilevel_mask(
    scores: jnp.ndarray,
    mask_ratios: Dict[int, Tuple[float, float]] | None = None,
    force_last2: bool = True,
) -> jnp.ndarray:
    """Integer level mask from ranked percentile bands (inference path).

    Returns int32 levels in {0, 1, 2, 4, 8}: rank band ``[start, end)`` (as a
    fraction of ``n_k``) of each row is assigned the band's level.
    """
    if mask_ratios is None:
        mask_ratios = DEFAULT_MASK_RATIOS
    n_k = scores.shape[-1]
    order = jnp.argsort(-scores, axis=-1, stable=True)
    ranks = jnp.arange(n_k)
    band = jnp.zeros((n_k,), dtype=jnp.int32)
    for level, (lo, hi) in mask_ratios.items():
        lo_i, hi_i = max(0, int(n_k * lo)), min(n_k, int(n_k * hi))
        band = jnp.where((ranks >= lo_i) & (ranks < hi_i), level, band)
    # levels[c] = band[rank of c]; the inverse permutation via a second
    # argsort + gather is much cheaper than a scatter (put_along_axis) on
    # TPU (6.3 -> ~2 ms at CogVideoX geometry).
    inv = jnp.argsort(order, axis=-1).astype(jnp.int32)
    levels = band[inv]
    if force_last2:
        levels = _force_last2(levels, 1)
    return levels


def multilevel_rank_bands(
    n_k: int, mask_ratios: Dict[int, Tuple[float, float]] | None = None
) -> Dict[int, Tuple[int, int]]:
    """Static ``level -> (band_start, band_width)`` over a descending score
    ranking of ``n_k`` key blocks — the rank bands of :func:`multilevel_mask`
    / :func:`multilevel_lists` (every non-forced row selects exactly
    ``band_width`` blocks per level, a compile-time constant the fused
    kernel uses to size its per-level MXU tiles)."""
    if mask_ratios is None:
        mask_ratios = DEFAULT_MASK_RATIOS
    bands = {}
    for level in (1, 2, 4, 8):
        lo, hi = mask_ratios.get(level, (0.0, 0.0))
        lo_i, hi_i = max(0, int(n_k * lo)), min(n_k, int(n_k * hi))
        bands[level] = (lo_i, max(hi_i - lo_i, 0))
    return bands


def multilevel_lists(
    scores: jnp.ndarray,
    mask_ratios: Dict[int, Tuple[float, float]] | None = None,
    cap: int | None = None,
    force_last2: bool = True,
):
    """Per-level ascending block lists straight from ONE score ranking.

    Fast lane for the fused multilevel kernel: equivalent to
    ``multilevel_mask`` + four ``mask_to_block_lists`` calls, but the rank
    bands are STATIC slices of the descending order, so each level's
    ascending list is a short ``jnp.sort`` of its band slice and every
    count is a compile-time constant (forced rows aside).  One argsort of
    ``n_k`` + four sorts of band width replaces five ``n_k``-wide
    argsorts + scatters (~8 ms cheaper at CogVideoX geometry).

    Forcing semantics (exact reference parity): bands come from the
    UNMODIFIED score ranking; the last two key blocks are then overwritten
    to level 1 — removed from whichever band they ranked into and appended
    to the level-1 list (the post-hoc ``mask[..., -2:] = 1`` of
    ``cogvideo_newattn.py:154-207``; equals ``multilevel_mask`` +
    per-level ``mask_to_block_lists`` bit for bit).  Since ``n_k - 2`` and
    ``n_k - 1`` exceed every other index, appending them keeps the
    level-1 list ascending; removals inside a band are compacted by the
    band sort (removed entries become > n_k sentinels, clamped to
    ``n_k - 1`` after sorting so padding stays DMA-safe).  The last two
    query rows attend at level 1 to every block, exactly as in
    ``multilevel_mask``.

    Returns ``(idx, counts)``: ``idx`` int32 ``[..., n_q, 4, cap]``
    (levels 1, 2, 4, 8, each ascending, tail padded with in-range
    duplicates); ``counts`` int32 ``[..., n_q, 4]``.
    """
    if mask_ratios is None:
        mask_ratios = DEFAULT_MASK_RATIOS
    n_q, n_k = scores.shape[-2], scores.shape[-1]
    if cap is None:
        cap = n_k
    sentinel = n_k + 2
    order = jnp.argsort(-scores, axis=-1, stable=True).astype(jnp.int32)
    row = jnp.arange(n_q, dtype=jnp.int32)
    forced_row = (row >= n_q - 2) if force_last2 else jnp.zeros((n_q,), bool)
    full_row = jnp.minimum(jnp.arange(cap, dtype=jnp.int32), n_k - 1)
    bands = multilevel_rank_bands(n_k, mask_ratios)
    idx_levels, cnt_levels = [], []
    for level in (1, 2, 4, 8):
        lo_i, band_w = bands[level]
        budget = cap - (2 if (level == 1 and force_last2) else 0)
        width = min(band_w, budget)
        cnt = jnp.full(scores.shape[:-1], width, jnp.int32)
        if width:
            band = order[..., lo_i:lo_i + width]
            if force_last2:
                is_forced = band >= n_k - 2
                band = jnp.where(is_forced, sentinel, band)
                cnt = cnt - is_forced.sum(-1)
            if level == 1 and force_last2:
                # overwrite: the two forced columns always attend at full
                # resolution; they are the largest indices so the tail
                # append keeps ascending order after the sort
                band = jnp.concatenate(
                    [band,
                     jnp.broadcast_to(
                         jnp.arange(n_k - 2, n_k, dtype=jnp.int32),
                         (*band.shape[:-1], 2))],
                    axis=-1)
                cnt = cnt + 2
            asc = jnp.minimum(jnp.sort(band, axis=-1), n_k - 1)
            if cap > asc.shape[-1]:
                asc = jnp.concatenate(
                    [asc,
                     jnp.broadcast_to(asc[..., -1:],
                                      (*asc.shape[:-1],
                                       cap - asc.shape[-1]))],
                    axis=-1)
        elif level == 1 and force_last2:
            asc = jnp.broadcast_to(
                jnp.minimum(
                    jnp.arange(n_k - 2, n_k - 2 + cap, dtype=jnp.int32),
                    n_k - 1),
                (*scores.shape[:-1], cap)).astype(jnp.int32)
            cnt = cnt + 2
        else:
            asc = jnp.zeros((*scores.shape[:-1], cap), jnp.int32)
        if level == 1:
            asc = jnp.where(forced_row[:, None], full_row, asc)
            cnt = jnp.where(forced_row, min(n_k, cap), cnt)
        else:
            cnt = jnp.where(forced_row, 0, cnt)
        idx_levels.append(asc)
        cnt_levels.append(cnt)
    return jnp.stack(idx_levels, axis=-2), jnp.stack(cnt_levels, axis=-1)


def mask_to_block_lists(mask: jnp.ndarray, max_blocks: int | None = None):
    """Convert a boolean block mask into padded index lists for the kernel.

    ``mask``: ``[..., n_q, n_k]`` bool.  Returns ``(indices, counts)`` with
    ``indices``: int32 ``[..., n_q, max_blocks]`` — the selected key-block
    indices in ascending order, padded by repeating the last valid index
    (repeats are skipped via ``counts`` and keep the kernel's gather DMA
    pointed at valid memory); ``counts``: int32 ``[..., n_q]``.

    ``max_blocks`` must statically bound the per-row selection (the energy
    clamp guarantees ``ceil(n_k * max_retain) + 2`` for non-forced rows).
    """
    n_k = mask.shape[-1]
    if max_blocks is None:
        max_blocks = n_k
    # Stable argsort of (not selected) puts selected indices first, ascending.
    order = jnp.argsort(~mask, axis=-1, stable=True).astype(jnp.int32)
    counts = jnp.sum(mask, axis=-1).astype(jnp.int32)
    idx = order[..., :max_blocks]
    # Pad tail with the last valid index.
    pos = jnp.arange(max_blocks, dtype=jnp.int32)
    last = jnp.take_along_axis(
        idx, jnp.maximum(counts[..., None] - 1, 0).astype(jnp.int32), axis=-1
    )
    idx = jnp.where(pos < counts[..., None], idx, last)
    counts = jnp.minimum(counts, max_blocks)
    return idx, counts


def mask_density(mask: jnp.ndarray) -> jnp.ndarray:
    """Fraction of active blocks (1 - sparsity)."""
    return jnp.mean(mask.astype(jnp.float32))


def union_block_lists(
    mask: jnp.ndarray,
    group: int = 2,
    max_blocks: int | None = None,
    bound: int | None = None,
):
    """Union key-block lists over groups of ``group`` adjacent mask rows.

    For a 256-row query tile covering two 128-row mask rows, the kernel
    gathers each key block once and applies per-row validity, halving K/V
    traffic when adjacent rows select overlapping blocks (which the Gilbert
    reordering encourages).

    ``bound``: static per-union-row selection bound for all

    non-full rows (e.g. ``group * (ceil(n_k * max_retain) + 2)`` under the
    energy clamp).  When given, the ``n_k``-wide argsort is replaced by one
    ``top_k`` of that width (TPU sorts are expensive — the energy-mask
    top-k lesson); any row whose union EXCEEDS the bound must be a fully-on
    row (true for energy masks: only the forced last-2 query rows exceed
    the clamp) and is rewritten as the identity list.  Output width stays
    ``n_k`` either way; only the sort shrinks.

    Returns ``(indices [..., n_q/group, max_u], counts [..., n_q/group],
    valbits [..., n_q/group, max_u] int32)`` where bit ``r`` of ``valbits``
    says whether mask row ``group*i + r`` selected that block.
    """
    *lead, n_q, n_k = mask.shape
    assert n_q % group == 0
    m = mask.reshape(*lead, n_q // group, group, n_k)
    union = jnp.any(m, axis=-2)
    if bound is not None and bound < n_k and max_blocks is None:
        iota = jnp.arange(n_k, dtype=jnp.int32)
        counts = jnp.sum(union, axis=-1).astype(jnp.int32)
        # selected blocks first, both segments ascending by block id
        key = jnp.where(union, 2 * n_k - iota, n_k - iota)
        _, sel = jax.lax.top_k(key, bound)
        sel = sel.astype(jnp.int32)
        pos = jnp.arange(bound, dtype=jnp.int32)
        cl = jnp.minimum(counts, bound)[..., None]
        last = jnp.take_along_axis(sel, jnp.maximum(cl - 1, 0), axis=-1)
        sel = jnp.where(pos < cl, sel, last)
        if n_k > bound:
            sel = jnp.concatenate(
                [sel, jnp.broadcast_to(last, (*sel.shape[:-1], n_k - bound))],
                axis=-1)
        idx = jnp.where((counts > bound)[..., None], iota, sel)
    else:
        idx, counts = mask_to_block_lists(union, max_blocks)
    # Validity bits: gather each row's mask at the union indices.
    bits = jnp.zeros(idx.shape, jnp.int32)
    for r in range(group):
        sel = jnp.take_along_axis(m[..., r, :], idx, axis=-1)
        bits = bits | (sel.astype(jnp.int32) << r)
    return idx, counts, bits
