"""ASA — Adaptive block-Sparse Attention (the reference's core algorithm).

Composition (training path, reference ``adaptive_block_sparse_attn``,
``cogvideo_blocksparseattn.py:327-394``):

  1. Gilbert-rearrange tokens so spatio-temporal neighbors share 128-blocks.
  2. Predict a per-(batch, head) boolean block mask from a subsampled pooled
     attention estimate (no gradients through the predictor).
  3. Branch A: binary block-sparse flash attention over the mask.
     Branch B: dense attention against ``sample_gap``-mean-pooled K/V — a
     low-resolution global corrective for everything the mask dropped.
  4. Merge branches in log space: ``alpha = softmax([lse_A, lse_B +
     log(sample_gap)])`` — here realized as exact LSE merging with the
     ``log(gap)`` bias folded into branch B's scores.
  5. Inverse-rearrange the output.

Inference path (reference ``cogvideo_newattn.py``): the same predictor feeds
a multi-level {0,1,2,4,8} mask executed by the grouped pooled kernel.

Everything is functional: geometry lives in :class:`ASAConfig`; randomness
(token subsampling) comes from an explicit PRNG key.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from blade.attention import gilbert
from blade.attention import masks as M
from blade.kernels.block_sparse_attn import (
    block_sparse_attention,
    flash_attention,
    flash_attention_wide_v,
)
from blade.kernels.multilevel_attn import multilevel_attention
from blade.kernels.ref_attention import merge_attention

__all__ = ["ASAConfig", "predict_block_scores", "adaptive_sparse_attention",
           "asa_attention", "COGVIDEOX_ASA", "WAN_ASA"]


@dataclasses.dataclass(frozen=True)
class ASAConfig:
    """Geometry + sparsity hyperparameters for one model family.

    Reference constants: ``cogvideo_blocksparseattn.py:9-16`` (CogVideoX),
    ``wanx_blocksparseattn.py:9-16`` (Wan).
    """

    latent_width: int
    latent_height: int
    latent_frames: int
    text_length: int = 0
    use_rearrange: bool = True
    block_size: int = 128
    sample_tokens_per_block: int = 32
    min_retain_ratio: float = 0.05
    max_retain_ratio: float = 0.1
    energy_threshold: float = 0.95
    sample_gap: int = 15
    mask_mode: str = "energy"  # "energy" (train) | "multilevel" (inference)
    mask_ratios: Optional[Dict[int, Tuple[float, float]]] = None
    # "max": reference semantics (renormalized col-max pooling, Pallas roll
    # tree).  "sum": mean of row-softmax mass per key block — matmul-
    # reducible (runs as flash attention with a one-hot pooling V), ~2x
    # cheaper, rows sum to 1 by construction.
    predictor: str = "max"
    # Tokens arrive already gilbert-arranged (the model permuted once after
    # patchify instead of per attention call) — skip the per-call permutes.
    pre_arranged: bool = False
    # Query rows per multilevel mask row (fused lists lane only).  256
    # halves the kernel's per-row overhead; the mask is then shared by 256
    # consecutive (gilbert-local) queries instead of the reference's 128.
    multilevel_q_rows: int = 128

    @property
    def video_tokens(self) -> int:
        return self.latent_width * self.latent_height * self.latent_frames

    @property
    def seq_len(self) -> int:
        return self.video_tokens + self.text_length

    def permutations(self):
        return gilbert.gilbert_permutations(
            self.latent_width, self.latent_height, self.latent_frames
        )


# Reference geometry: CogVideoX-5B 49f 480x720 -> 13x30x45 latents + 226 text
COGVIDEOX_ASA = ASAConfig(
    latent_width=45, latent_height=30, latent_frames=13,
    text_length=226, sample_gap=15,
    min_retain_ratio=0.05, max_retain_ratio=0.1,
)
# Wan2.1-1.3B 81f 480x832 -> 21x30x52 latents, video-only self attention
WAN_ASA = ASAConfig(
    latent_width=52, latent_height=30, latent_frames=21,
    text_length=0, sample_gap=30,
    min_retain_ratio=0.05, max_retain_ratio=0.2,
)


def predict_block_scores(
    rng: jax.Array, q: jnp.ndarray, k: jnp.ndarray, cfg: ASAConfig
) -> jnp.ndarray:
    """Pooled block-score estimate ``[B, H, n_q, n_k]`` (stop-gradient).

    Subsamples ``sample_tokens_per_block`` tokens per 128-block of Q and K
    (shared offsets per (B, H), reference ``random_sample_tokens``) and runs
    the pooled softmax estimator.
    """
    q = jax.lax.stop_gradient(q)
    k = jax.lax.stop_gradient(k)
    rq, rk = jax.random.split(rng)
    qp = M.pad_to_block_multiple(q, cfg.block_size)
    kp = M.pad_to_block_multiple(k, cfg.block_size)
    q_s = M.sample_block_tokens(rq, qp, cfg.block_size, cfg.sample_tokens_per_block)
    k_s = M.sample_block_tokens(rk, kp, cfg.block_size, cfg.sample_tokens_per_block)
    scale = 1.0 / math.sqrt(q.shape[-1])

    if cfg.predictor == "sum":
        # Row-softmax mass pooled per key block: exactly flash attention
        # with a one-hot block-pooling matrix as V.  The pooling V is
        # lane-padded to a 128 multiple so ONE pass covers every key block
        # (the kernel's V width is independent of Q/K's head dim) — the
        # former head_dim-wide chunking recomputed the full softmax
        # ceil(n_k / d) times.
        b, h, ls, d = k_s.shape
        nq = qp.shape[2] // cfg.block_size
        nk = kp.shape[2] // cfg.block_size
        tokens = cfg.sample_tokens_per_block
        nk_pad = max(128, -(-nk // 128) * 128)
        pool = jax.nn.one_hot(
            jnp.arange(ls) // tokens, nk_pad, dtype=k_s.dtype)
        pool = jnp.broadcast_to(pool, (b, h, ls, nk_pad))
        out, _ = flash_attention_wide_v(q_s, k_s, pool, scale=scale)
        out = out[..., :nk]
        return out.reshape(b, h, nq, tokens, nk).mean(3).astype(jnp.float32)

    from blade.kernels.pooled_predictor import pooled_scores_kernel_call

    return pooled_scores_kernel_call(
        q_s, k_s, tokens_per_block=cfg.sample_tokens_per_block, scale=scale
    )


def _coarsen_scores(scores, cfg: ASAConfig):
    """Mean-pool score rows to ``multilevel_q_rows`` granularity."""
    g = cfg.multilevel_q_rows // cfg.block_size
    if g == 1:
        return scores
    nq = scores.shape[-2]
    if nq % g:
        scores = jnp.pad(
            scores, ((0, 0), (0, 0), (0, g - nq % g), (0, 0)), mode="edge")
    return scores.reshape(
        *scores.shape[:-2], -1, g, scores.shape[-1]).mean(-2)


def _fused_lane_params(k_len: int, mask_ratios=None):
    """(cap, pooled_tiles, single_shot) for the fused lists lane.

    Rank-band widths are static, so each pooled level's MXU tile can be
    sized to its band (the default tile widths waste up to ~45% of the
    level-8 exp+matmul on masked tail columns), and when every band fits
    its tile the kernel can merge all levels into ONE MXU tile per row
    (single-shot lane).  The single source of this geometry — profiling
    scripts and tests import it rather than re-deriving the formula."""
    from blade.kernels.multilevel_attn import KV_BLOCK, POOLED_TILE

    n_kt = -(-k_len // KV_BLOCK)
    cap = -(-n_kt // 128) * 128
    bands = M.multilevel_rank_bands(n_kt, mask_ratios)
    tiles = tuple(
        max(128, min(POOLED_TILE[lv],
                     -(-(bands[lv][1] * (128 // lv)) // 128) * 128))
        for lv in (2, 4, 8))
    single_shot = all(
        t >= bands[lv][1] * (128 // lv)
        for t, lv in zip(tiles, (2, 4, 8)))
    return cap, tiles, single_shot


def _fused_lane_supported(cfg: "ASAConfig", q, k) -> bool:
    from blade.kernels.multilevel_attn import fused_supported

    return cfg.mask_mode == "multilevel" and fused_supported(
        q.shape[-1], k.shape[2], jnp.dtype(q.dtype).itemsize)


def compute_lists(rng, q, k, cfg: ASAConfig):
    """Per-level block lists for the fused multilevel lane — the reusable
    mask artifact on this path (carrying LISTS instead of an int level
    mask keeps refresh AND replay steps off the mask->lists re-argsort
    glue; see ``multilevel_lists``)."""
    scores = _coarsen_scores(predict_block_scores(rng, q, k, cfg), cfg)
    cap, _, _ = _fused_lane_params(k.shape[2], cfg.mask_ratios)
    return M.multilevel_lists(scores, cfg.mask_ratios, cap=cap)


def compute_mask(rng, q, k, cfg: ASAConfig):
    """The data-dependent mask for (q, k): multilevel int levels or the
    boolean energy mask (both derivable from the pooled score estimate).

    Multilevel levels come out at ``multilevel_q_rows`` granularity (one
    row per ``multilevel_q_rows`` queries) when the fused kernel supports
    the geometry; otherwise at ``block_size``."""
    scores = predict_block_scores(rng, q, k, cfg)
    if cfg.mask_mode == "multilevel":
        from blade.kernels.multilevel_attn import fused_supported

        if fused_supported(q.shape[-1], k.shape[2],
                           jnp.dtype(q.dtype).itemsize):
            scores = _coarsen_scores(scores, cfg)
        return M.multilevel_mask(scores, cfg.mask_ratios)
    return M.energy_mask(
        scores,
        min_retain_ratio=cfg.min_retain_ratio,
        max_retain_ratio=cfg.max_retain_ratio,
        energy_threshold=cfg.energy_threshold,
    )


def adaptive_sparse_attention(
    rng: jax.Array,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cfg: ASAConfig,
    *,
    interpret: Optional[bool] = None,
    mask: Optional[jnp.ndarray] = None,
):
    """Training-path ASA over already-(re)arranged ``[B, H, L, D]``.

    ``mask``: optional precomputed mask (from :func:`compute_mask`) — the
    opt-in VSA-style reuse across denoise steps skips the predictor.
    Returns ``(out, sparsity)`` where sparsity mirrors the reference metric
    ``1 - mask.mean() - 1/sample_gap``.
    """
    if cfg.mask_mode == "multilevel":
        # Fused fast lane: per-level lists straight from the score ranking
        # (one argsort + short band sorts) — skips the level mask and its
        # four re-sorting round-trips entirely.  ``mask`` may be a replayed
        # (idx, counts) lists tuple (the artifact asa_attention collects on
        # this lane), keeping replay steps equally fast.
        lists = tuple(mask) if isinstance(mask, (tuple, list)) else None
        if lists is None and mask is None and _fused_lane_supported(
                cfg, q, k):
            lists = compute_lists(rng, q, k, cfg)
        if lists is not None:
            _, tiles, single_shot = _fused_lane_params(
                k.shape[2], cfg.mask_ratios)
            out, _ = multilevel_attention(
                q, k, v, None, lists=lists, interpret=interpret,
                q_rows=cfg.multilevel_q_rows, pooled_tiles=tiles,
                pooled_single_shot=single_shot)
        else:
            # compute_mask / replayed masks carry their row granularity in
            # their shape: q_rows = ceil(n_128_rows / n_mask_rows) * 128.
            levels = compute_mask(rng, q, k, cfg) if mask is None else mask
            n128 = -(-q.shape[2] // 128)
            q_rows = 128 * (-(-n128 // levels.shape[-2]))
            out, _ = multilevel_attention(
                q, k, v, levels, interpret=interpret, q_rows=q_rows)
        ratios = cfg.mask_ratios or M.DEFAULT_MASK_RATIOS
        density = sum(
            (hi - lo) / lv for lv, (lo, hi) in ratios.items() if lv != 0
        )
        return out, jnp.asarray(1.0 - density, jnp.float32)

    if mask is None:
        mask = compute_mask(rng, q, k, cfg)

    # The energy clamp statically bounds every non-forced row's selection
    # at ceil(n_k * max_retain) + 2 forced columns; the union of two such
    # rows at twice that.  Rows above the bound are the forced fully-on
    # last-2 query rows — exactly the contract union_block_lists' bounded
    # top_k lane needs (cuts the mask->lists argsort glue).
    n_k = mask.shape[-1]
    union_bound = 2 * (max(int(n_k * cfg.max_retain_ratio), 1) + 2)

    out1, lse1 = block_sparse_attention(
        q, k, v, mask, interpret=interpret,
        union_bound=union_bound if union_bound < n_k else None)

    # Low-res global branch: sample_gap-mean-pooled K/V with +log(gap) bias
    # (each pooled key stands in for `gap` keys).  sum * 1/gap lowers to a
    # faster reduction than mean on TPU (~1 ms at Wan-480p).
    inv_gap = 1.0 / cfg.sample_gap
    kp = M.pad_to_block_multiple(k, cfg.sample_gap)
    vp = M.pad_to_block_multiple(v, cfg.sample_gap)
    k_pool = (kp.reshape(*kp.shape[:2], -1, cfg.sample_gap, kp.shape[-1])
              .sum(axis=-2) * inv_gap).astype(k.dtype)
    v_pool = (vp.reshape(*vp.shape[:2], -1, cfg.sample_gap, vp.shape[-1])
              .sum(axis=-2) * inv_gap).astype(v.dtype)
    out2, lse2 = flash_attention(
        q, k_pool, v_pool,
        scale=1.0 / math.sqrt(q.shape[-1]),
        bias=float(math.log(cfg.sample_gap)),
        interpret=interpret,
    )

    out, _ = merge_attention([out1, out2], [lse1, lse2])
    sparsity = 1.0 - M.mask_density(mask) - 1.0 / cfg.sample_gap
    return out.astype(q.dtype), sparsity


def asa_attention(
    rng: jax.Array,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cfg: ASAConfig,
    *,
    interpret: Optional[bool] = None,
    mask: Optional[jnp.ndarray] = None,
    return_mask: bool = False,
):
    """Full ASA: gilbert rearrange -> adaptive sparse attention -> restore.

    ``q, k, v``: ``[B, H, text_length + video_tokens, D]`` with the text
    segment first (CogVideoX layout; ``text_length == 0`` for Wan).
    ``mask``/``return_mask`` support cross-step mask reuse: masks live in
    arranged-token coordinates.  Returns ``(out, sparsity[, mask])``.

    On the fused multilevel lane the mask artifact is the per-level
    ``(idx, counts)`` LISTS tuple rather than an int level mask — both
    fresh and replayed steps then run the lists fast lane (an int mask
    would force the generic mask->lists re-argsort glue, ~8-11 ms/layer
    at CogVideoX geometry).
    """
    rearrange = cfg.use_rearrange and not cfg.pre_arranged
    if rearrange:
        perm, inv = cfg.permutations()
        q = gilbert.rearrange_tokens(q, perm, cfg.text_length)
        k = gilbert.rearrange_tokens(k, perm, cfg.text_length)
        v = gilbert.rearrange_tokens(v, perm, cfg.text_length)
    if mask is None:
        if _fused_lane_supported(cfg, q, k):
            mask = compute_lists(rng, q, k, cfg)
        else:
            mask = compute_mask(rng, q, k, cfg)
    out, sparsity = adaptive_sparse_attention(
        rng, q, k, v, cfg, interpret=interpret, mask=mask
    )
    if rearrange:
        out = gilbert.unrearrange_tokens(out, inv, cfg.text_length)
    if return_mask:
        return out, sparsity, mask
    return out, sparsity
