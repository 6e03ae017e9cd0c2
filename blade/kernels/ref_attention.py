"""Pure-JAX reference attention implementations.

These are the semantic ground truth for the Pallas kernels (mirroring the
role of the SDPA-equivalence tests in the reference's
``test_block_sparse_attention.py``): small, obviously-correct, autodiff-able.
They are also the CPU fallback path used in unit tests.

All functions operate on ``[B, H, L, D]`` and return ``(out, lse)`` where
``lse`` is the natural-log row log-sum-exp of the scaled scores — the
composition primitive used to fuse sparse/pooled/multi-level branches
exactly (see :func:`merge_attention`).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "dense_attention_with_lse",
    "block_masked_attention",
    "merge_attention",
    "mean_pool_kv",
    "multilevel_block_attention_reference",
    "NEG_INF",
]

# Large-but-finite negative used to mask scores: keeps exp() flushing to zero
# without producing -inf - -inf = nan in the online-softmax recurrences.
NEG_INF = -1e30


def dense_attention_with_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    bias: float = 0.0,
    kv_valid_len: int | None = None,
):
    """Softmax attention returning (out, lse); fp32 accumulation.

    ``bias`` is a scalar added to every score (used as ``+log(level)`` for
    pooled branches).  ``kv_valid_len`` masks out trailing padded keys.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("...qd,...kd->...qk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    s = s + bias
    if kv_valid_len is not None and kv_valid_len < k.shape[-2]:
        col = jnp.arange(k.shape[-2])
        s = jnp.where(col < kv_valid_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("...qk,...kd->...qd", p / l, v.astype(jnp.float32))
    lse = (m + jnp.log(l))[..., 0]
    return out.astype(q.dtype), lse


def block_masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_mask: jnp.ndarray,
    *,
    scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    bias: float = 0.0,
):
    """Binary block-sparse attention by dense masking (reference semantics).

    ``block_mask``: bool ``[B, H, ceil(Lq/bq), ceil(Lk/bk)]``.  Skipped blocks
    contribute nothing to the softmax (scores -> -inf), exactly like the
    block-sparse CUDA kernel the reference wraps.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    lq, lk = q.shape[-2], k.shape[-2]
    token_mask = jnp.repeat(jnp.repeat(block_mask, block_q, axis=-2), block_k, axis=-1)
    token_mask = token_mask[..., :lq, :lk]
    s = jnp.einsum("...qd,...kd->...qk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    s = jnp.where(token_mask, s + bias, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    # Masked entries must be EXACT zeros: for a fully-empty row m == NEG_INF
    # and exp(s - m) would be exp(0) = 1 everywhere, leaking mean-of-V into
    # a row the kernels (and the ring merge) define as out = 0, lse = -inf.
    p = jnp.where(token_mask, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l_safe = jnp.where(l == 0, 1.0, l)
    out = jnp.einsum("...qk,...kd->...qd", p / l_safe, v.astype(jnp.float32))
    lse = (m + jnp.log(l_safe))[..., 0]
    lse = jnp.where(l[..., 0] == 0, NEG_INF, lse)
    return out.astype(q.dtype), lse


def mean_pool_kv(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Mean-pool keys/values along the sequence axis by ``factor``.

    ``x``: ``[..., L, D]`` with ``L % factor == 0`` (callers replicate-pad
    first).  Level-``factor`` pooled keys stand in for ``factor`` original
    keys; pair with a ``+log(factor)`` score bias so softmax mass matches
    (reference: the ``+log(level)`` constants in the multi-level Triton
    kernel, ``block_sparse_attn_kernel_with_backward_9_10.py:164-313``).
    """
    *lead, length, d = x.shape
    return x.reshape(*lead, length // factor, factor, d).mean(axis=-2)


def multilevel_block_attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    levels: jnp.ndarray,
    *,
    scale: float | None = None,
    block: int = 128,
):
    """Dense reference for multi-level pooled block attention.

    ``levels``: int ``[B, H, n_q, n_k]`` in {0, 1, 2, 4, 8}: 0 = skip,
    1 = full attention, L = attend to L-times mean-pooled K/V of that block
    with a ``+log(L)`` bias.  Sequences must be multiples of ``block``.
    Returns ``(out, lse)``.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    outs, lses = [], []
    for level in (1, 2, 4, 8):
        kp = k if level == 1 else mean_pool_kv(k, level)
        vp = v if level == 1 else mean_pool_kv(v, level)
        sub_block = block // level
        block_mask = levels == level
        out_l, lse_l = block_masked_attention(
            q, kp, vp, block_mask, scale=scale,
            block_q=block, block_k=sub_block, bias=float(np.log(level)),
        )
        outs.append(out_l)
        lses.append(lse_l)
    return merge_attention(outs, lses)


def merge_attention(outs: Sequence[jnp.ndarray], lses: Sequence[jnp.ndarray]):
    """Exactly combine attention branches computed over disjoint key sets.

    Given branch outputs ``o_i`` (softmax-normalized within the branch) and
    their log-sum-exps ``lse_i``, the attention over the union of key sets is

        out = sum_i softmax_i(lse)_i * o_i,   lse = logsumexp_i(lse_i)

    This is the generalization of the reference's two-branch fusion
    ``alpha = softmax([lse1, lse2 + log(gap)])``
    (``cogvideo_blocksparseattn.py:374-393``) — any per-branch score bias is
    assumed to already be folded into the branch's lse.
    """
    lse_stack = jnp.stack(list(lses), axis=0)  # [n, ..., Lq] (small: no D)
    m = jnp.max(lse_stack, axis=0)
    w = jnp.exp(lse_stack - m[None])  # [n, ..., Lq]
    denom = jnp.sum(w, axis=0)
    # Weighted sum WITHOUT stacking the outputs: stacking materializes n
    # f32 copies of [.., Lq, D] (~0.8 GB at Wan 480p) that XLA does not
    # fuse away; the unrolled sum is one elementwise pass over the branch
    # outputs in their storage dtype.
    wn = w / denom
    out = sum(o.astype(jnp.float32) * wn[i][..., None]
              for i, o in enumerate(outs))
    lse = m + jnp.log(denom)
    return out.astype(outs[0].dtype), lse
