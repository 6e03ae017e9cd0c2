"""Functional LoRA for Flax parameter trees.

The reference trains rank-64/alpha-64 adapters on ``to_q,to_k,to_v,to_out``
via peft (``train_cogvideo_tdm.py:1113-1119``).  Here LoRA is a pure tree
transform: ``init_lora`` builds a sparse mirror tree of (A, B) factors and
``merge_lora`` produces effective parameters ``W + (alpha/rank) A B`` — used
both for training (gradients flow through the merge into the factors) and
for inference (merge once at load, zero runtime overhead — the BASELINE
"LoRA merged at load" requirement).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["init_lora", "merge_lora", "DEFAULT_TARGETS", "lora_param_count"]

DEFAULT_TARGETS: Tuple[str, ...] = ("to_q", "to_k", "to_v", "to_out")


def _is_target(path, targets) -> bool:
    keys = [getattr(p, "key", None) for p in path]
    return (
        len(keys) >= 2
        and keys[-1] == "kernel"
        and any(t in str(keys[-2]) for t in targets)
    )


def init_lora(
    rng: jax.Array,
    params,
    *,
    rank: int = 64,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
):
    """Build the LoRA factor tree: for each targeted ``kernel`` of shape
    ``[in, out]``, a dict ``{"a": [in, r] ~ N(0, 1/r), "b": [r, out] = 0}``;
    everything else maps to ``None`` (empty subtree)."""
    flat = {}
    counter = [0]

    def build(path, leaf):
        if not _is_target(path, targets):
            return None
        counter[0] += 1
        key = jax.random.fold_in(rng, counter[0])
        d_in, d_out = leaf.shape[-2], leaf.shape[-1]
        a = jax.random.normal(key, (d_in, rank), dtype) / jnp.sqrt(
            jnp.asarray(rank, dtype)
        )
        b = jnp.zeros((rank, d_out), dtype)
        return {"a": a, "b": b}

    return jax.tree_util.tree_map_with_path(build, params)


def merge_lora(params, lora, *, alpha: float = 64.0, rank: int = 64):
    """Effective params: ``kernel + (alpha/rank) * a @ b`` where lora has a
    factor pair, identity elsewhere.  Pure + differentiable in ``lora``."""
    scale = alpha / rank

    def combine(p, l):
        if l is None:
            return p
        delta = (l["a"] @ l["b"]) * scale
        return (p.astype(jnp.float32) + delta).astype(p.dtype)

    # params' arrays are the leaves; the lora tree is flattened up to that
    # structure, so `l` arrives as either None or the {"a","b"} factor dict.
    return jax.tree_util.tree_map(combine, params, lora)


def lora_param_count(lora) -> int:
    return sum(
        x.size for x in jax.tree_util.tree_leaves(lora) if hasattr(x, "size")
    )
