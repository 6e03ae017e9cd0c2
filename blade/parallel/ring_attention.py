"""Ring (sequence-parallel) flash attention over an ICI mesh axis.

SURVEY §7 stretch goal (the reference has NO sequence parallelism — its
long sequences are handled per-device by ASA).  This shards the token
axis over a mesh axis ``sp``: each device holds an L/n slice of q/k/v,
computes flash attention of its queries against the resident K/V shard,
and rotates the K/V shards around the ring with ``jax.lax.ppermute``,
merging partial results exactly in log space (softmax is associative over
disjoint key sets, the same LSE merge the ASA two-branch fusion uses).

Composable with ASA: pass ``block_mask`` (the ASA block mask, bool
``[B, H, Lq/q_block, Lk/128]``) and each ring step runs the BLOCK-SPARSE
kernel on the (query-shard, key-shard) pair with the matching mask tile —
at ring step ``s`` device ``i`` holds key shard ``j = (i - s) mod n``, so
the pair mask is the ``j``-th column slice of the device's resident mask
rows (``tests/test_ring_attention.py::test_ring_block_sparse_*`` pins
exactness vs the single-device masked reference, including pair-empty
rows, which merge through lse = -inf).

Communication rides the ICI ring — each step moves only the K/V shard
(``2 * B*H*(L/n)*D`` bf16 elements; Wan-480p geometry at sp=8: 25.2 MB
per device per step, ~0.6 ms on one v5e ICI link at ~45 GB/s), which
XLA's latency-hiding scheduler overlaps with the previous step's inner
attention.  Around the full ring each device transmits K/V once
(``(n-1)/n`` of it), independent of n.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_flash_attention", "make_ring_attention_fn"]


def _default_inner(q, k, v, scale):
    """Per-shard attention returning (out, lse); Pallas flash on TPU."""
    from blade.kernels.block_sparse_attn import flash_attention
    from blade.kernels.ref_attention import dense_attention_with_lse

    if jax.default_backend() == "tpu":
        return flash_attention(q, k, v, scale=scale)
    return dense_attention_with_lse(q, k, v, scale=scale)


def _default_sparse_inner(q, k, v, scale, mask_pair):
    """Per-pair block-sparse attention returning (out, lse).

    Pallas block-sparse kernel on TPU; the dense-masking reference
    elsewhere (pair-empty rows return out = 0, lse = -inf on both lanes,
    which the ring merge passes through exactly)."""
    from blade.kernels.block_sparse_attn import block_sparse_attention
    from blade.kernels.ref_attention import block_masked_attention

    q_block = q.shape[2] // mask_pair.shape[-2]  # mask row granularity
    if jax.default_backend() == "tpu":
        return block_sparse_attention(q, k, v, mask_pair, scale=scale,
                                      q_block=q_block)
    return block_masked_attention(q, k, v, mask_pair, scale=scale,
                                  block_q=q_block)


def _merge(out_a, lse_a, out_b, lse_b):
    """Exact online merge of two disjoint-key partials (f32)."""
    m = jnp.maximum(lse_a, lse_b)
    # Empty partials carry lse = -inf; keep exp(-inf - -inf) well-defined.
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    wa = jnp.exp(lse_a - m_safe)
    wb = jnp.exp(lse_b - m_safe)
    den = jnp.maximum(wa + wb, 1e-38)
    out = (out_a * wa[..., None] + out_b * wb[..., None]) / den[..., None]
    lse = jnp.where(jnp.isfinite(m), m_safe + jnp.log(den), m)
    return out, lse


def ring_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = "sp",
    scale: Optional[float] = None,
    inner: Optional[Callable] = None,
    block_mask: Optional[jnp.ndarray] = None,
):
    """Sequence-parallel attention: ``[B, H, L, D]`` with L sharded on
    ``axis``.  Returns ``(out, lse)`` with the same sharding as q.

    ``L`` must divide evenly by the axis size.  The inner function
    defaults to the dense flash kernel,
    ``inner(q_shard, k_shard, v_shard, scale) -> (out, lse)``.

    ``block_mask`` composes ASA's binary block sparsity with the ring:
    bool ``[B, H, nQ, nK]`` (the single-device ASA mask layout; nQ rows
    are sharded with the queries, nK columns must divide evenly by the
    axis size).  Each ring step slices the column band matching the key
    shard the device currently holds — at step ``s`` device ``i`` holds
    key shard ``(i - s) mod n`` — and the inner becomes
    ``inner(q, k, v, scale, mask_pair) -> (out, lse)`` (default:
    block-sparse Pallas kernel on TPU, masked dense reference elsewhere).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n = mesh.shape[axis]
    assert q.shape[2] % n == 0, (q.shape, n)
    if block_mask is not None:
        inner_fn = inner or _default_sparse_inner
        nk = block_mask.shape[-1]
        assert nk % n == 0 and block_mask.shape[-2] % n == 0, \
            (block_mask.shape, n)
        nk_shard = nk // n
    else:
        inner_fn = inner or _default_inner

    def shard_fn(q, k, v, *mask):
        me = jax.lax.axis_index(axis)

        def step(carry, s):
            k_cur, v_cur, out, lse = carry
            if block_mask is not None:
                j = jax.lax.rem(me - s + n, n)  # resident key shard
                pair = jax.lax.dynamic_slice_in_dim(
                    mask[0], j * nk_shard, nk_shard, axis=-1)
                o_i, l_i = inner_fn(q, k_cur, v_cur, scale, pair)
            else:
                o_i, l_i = inner_fn(q, k_cur, v_cur, scale)
            out, lse = _merge(out, lse, o_i.astype(jnp.float32), l_i)
            k_nxt = jax.lax.ppermute(
                k_cur, axis, [(i, (i + 1) % n) for i in range(n)]
            )
            v_nxt = jax.lax.ppermute(
                v_cur, axis, [(i, (i + 1) % n) for i in range(n)]
            )
            return (k_nxt, v_nxt, out, lse), None

        out0 = jnp.zeros(q.shape, jnp.float32)
        lse0 = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)
        (k, v, out, lse), _ = jax.lax.scan(
            step, (k, v, out0, lse0), jnp.arange(n)
        )
        return out.astype(q.dtype), lse

    spec = P(None, None, axis, None)
    in_specs = (spec, spec, spec)
    operands = (q, k, v)
    if block_mask is not None:
        in_specs += (P(None, None, axis, None),)  # mask rows ride with q
        operands += (block_mask,)
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=in_specs,
        out_specs=(spec, P(None, None, axis)),
        check_vma=False,
    )
    return fn(*operands)


def make_ring_attention_fn(mesh: Mesh, axis: str = "sp"):
    """``attention_fn(q, k, v, **kw) -> out`` for the DiTs: drop-in dense
    attention sharded over the sequence axis (for >720p geometries where
    even ASA-sparse activations exceed one chip)."""

    def attention_fn(q, k, v, **_):
        out, _lse = ring_flash_attention(q, k, v, mesh=mesh, axis=axis)
        return out

    return attention_fn
