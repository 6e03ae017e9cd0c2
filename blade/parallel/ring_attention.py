"""Ring (sequence-parallel) flash attention over an ICI mesh axis.

SURVEY §7 stretch goal (the reference has NO sequence parallelism — its
long sequences are handled per-device by ASA).  This shards the token
axis over a mesh axis ``sp``: each device holds an L/n slice of q/k/v,
computes flash attention of its queries against the resident K/V shard,
and rotates the K/V shards around the ring with ``jax.lax.ppermute``,
merging partial results exactly in log space (softmax is associative over
disjoint key sets, the same LSE merge the ASA two-branch fusion uses).

Composable with ASA: the per-(query-shard, key-shard) inner attention is
pluggable, so a block-sparse inner pass (with per-pair masks) runs the
same ring.  Communication rides the ICI ring — each step moves only the
K/V shard, overlapping with the previous step's compute under XLA's
latency-hiding scheduler.
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
):
    """Sequence-parallel attention: ``[B, H, L, D]`` with L sharded on
    ``axis``.  Returns ``(out, lse)`` with the same sharding as q.

    ``L`` must divide evenly by the axis size.  The inner function
    ``inner(q_shard, k_shard, v_shard, scale) -> (out, lse)`` defaults to
    the dense flash kernel.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    inner_fn = inner or _default_inner
    n = mesh.shape[axis]
    assert q.shape[2] % n == 0, (q.shape, n)

    def shard_fn(q, k, v):
        def step(carry, _):
            k_cur, v_cur, out, lse = carry
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
            step, (k, v, out0, lse0), None, length=n
        )
        return out.astype(q.dtype), lse

    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, P(None, None, axis)),
        check_vma=False,
    )
    return fn(q, k, v)


def make_ring_attention_fn(mesh: Mesh, axis: str = "sp"):
    """``attention_fn(q, k, v, **kw) -> out`` for the DiTs: drop-in dense
    attention sharded over the sequence axis (for >720p geometries where
    even ASA-sparse activations exceed one chip)."""

    def attention_fn(q, k, v, **_):
        out, _lse = ring_flash_attention(q, k, v, mesh=mesh, axis=axis)
        return out

    return attention_fn
