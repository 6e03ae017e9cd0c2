"""Glue between ASA and the DiT models (the reference's "model patching").

Where the reference monkey-patches diffusers attention processors
(``set_block_sparse_attn_cogvideox``/``set_adaptive_block_sparse_attn_wanx``),
here the DiTs take a pluggable ``attention_fn``; this module builds those
functions.  Randomness for the mask predictor's token subsampling arrives
through ``attn_kwargs['rng']`` and is folded with the layer index so each
block draws fresh samples (the reference draws fresh ``torch.rand`` per
call).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from blade.attention.asa import ASAConfig, asa_attention

__all__ = ["make_asa_attention_fn", "asa_model_kwargs", "extract_attn_aux"]


def extract_attn_aux(intermediates):
    """The per-layer mask artifact out of a flax intermediates tree.

    The models sow the attention aux under ``"attn_aux"``; flax wraps each
    sown value in a 1-tuple.  Under ``nn.scan`` (the default) one sow site
    carries a stacked ``[L, ...]`` leading axis; with ``scan_layers=False``
    each layer sows at its own path (``blocks_0``, ``blocks_1``, ...) and
    the per-layer artifacts are stacked here, in numeric layer order, to
    the same ``[L, ...]`` contract.  The aux itself is a pytree — a single
    mask array (energy / generic multilevel) or an (idx, counts) lists
    tuple (fused multilevel lane) — so callers must NOT assume one leaf."""
    import re
    from collections.abc import Mapping

    found = []

    def walk(node, name):
        if not isinstance(node, Mapping):
            return
        if "attn_aux" in node:
            v = node["attn_aux"]
            found.append(
                (name, v[0] if isinstance(v, tuple) and len(v) == 1 else v))
        for k, child in node.items():
            if k != "attn_aux":
                walk(child, k)

    walk(intermediates, "")
    if not found:
        return None
    if len(found) == 1:
        return found[0][1]

    def layer_no(name):
        m = re.search(r"(\d+)$", name)
        return int(m.group(1)) if m else 0

    found.sort(key=lambda t: layer_no(t[0]))
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[aux for _, aux in found])


def asa_model_kwargs(
    asa_cfg: ASAConfig,
    interpret: Optional[bool] = None,
    log_sparsity_every: int = 0,
) -> dict:
    """Model kwargs wiring ASA the TPU-first way.

    The gilbert permutation is hoisted to the model level: tokens are
    permuted once per forward (``WanModel.token_perm`` /
    ``CogVideoXModel.token_perm``) and the attention runs ``pre_arranged``
    — removing 4 full-tensor gathers per layer (~6 ms x 30 layers at Wan
    480p).  For CogVideoX the model also switches the joint concat to
    ``[video, text]`` (``text_last``) so ASA sees 128-block-aligned video
    tokens with no per-call text move (the reference re-shuffles text to
    the back inside every attention call).
    """
    if asa_cfg.use_rearrange:
        perm, inv = asa_cfg.permutations()
        cfg = dataclasses.replace(asa_cfg, pre_arranged=True)
        return {
            "attention_fn": make_asa_attention_fn(
                cfg, interpret, log_sparsity_every
            ),
            "token_perm": (perm, inv),
        }
    return {
        "attention_fn": make_asa_attention_fn(
            asa_cfg, interpret, log_sparsity_every
        )
    }


def make_asa_attention_fn(
    asa_cfg: ASAConfig,
    interpret: Optional[bool] = None,
    log_sparsity_every: int = 0,
):
    """Returns ``attention_fn(q, k, v, rng=..., layer_index=...) -> out``.

    Drop-in for ``WanModel``/``CogVideoXModel`` ``attention_fn``; applies the
    full ASA pipeline (gilbert reorder, mask prediction, sparse + pooled
    fusion or multi-level execution per ``asa_cfg.mask_mode``).

    ``log_sparsity_every > 0`` emits the per-layer sparsity from inside the
    compiled graph every N layers (the reference prints a running average
    every 800 calls, ``cogvideo_blocksparseattn.py:414-420``).
    """

    def attention_fn(q, k, v, *, rng=None, layer_index=0, masks=None,
                     collect_mask=False, **_):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng = jax.random.fold_in(rng, layer_index)
        # Cross-step mask reuse: `masks` is a per-layer stack [L, ...]
        # computed earlier (collect_mask=True returns (out, mask) so the
        # model can sow it); see sampling/pipeline.sample_wan.  The
        # artifact is a pytree: a bool/int mask array (energy / generic
        # multilevel) or an (idx, counts) lists tuple (fused lane).
        mask = None if masks is None else jax.tree_util.tree_map(
            lambda a: a[layer_index], masks)
        out, sparsity, mask = asa_attention(
            rng, q, k, v, asa_cfg, interpret=interpret, mask=mask,
            return_mask=True,
        )
        if log_sparsity_every and layer_index % log_sparsity_every == 0:
            jax.debug.print(
                "asa sparsity layer {l}: {s:.4f}", l=layer_index, s=sparsity
            )
        out = out.astype(q.dtype)
        if collect_mask:
            return out, mask
        return out

    return attention_fn
