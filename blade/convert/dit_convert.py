"""HF diffusers DiT state-dicts -> blade Flax param trees.

Mappings follow the published diffusers module names
(``WanTransformer3DModel`` / ``CogVideoXTransformer3DModel``); shape
conventions: torch ``Linear.weight [out, in]`` -> flax ``kernel [in, out]``;
torch ``ConvNd.weight [out, in, *k]`` -> flax ``kernel [*k, in, out]``.

Structural round-trip is tested in ``tests/test_converters.py``; numerical
validation against real checkpoints happens when weights are present (the
zero-egress build environment has none).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from blade.models.cogvideox_dit import CogVideoXConfig
from blade.models.wan_dit import WanConfig

__all__ = ["convert_wan_transformer", "convert_cogvideox_transformer"]


def _stack_layers(layers):
    """List of per-layer trees -> one tree with a leading layer axis
    (matches the ``nn.scan`` parameter layout)."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers)


def _lin(sd, name):
    return {"kernel": np.asarray(sd[name + ".weight"], np.float32).T,
            **({"bias": np.asarray(sd[name + ".bias"], np.float32)}
               if name + ".bias" in sd else {})}


def _conv(sd, name):
    w = np.asarray(sd[name + ".weight"], np.float32)
    # [out, in, *k] -> [*k, in, out]
    kernel = np.moveaxis(w, (0, 1), (-1, -2))
    out = {"kernel": kernel}
    if name + ".bias" in sd:
        out["bias"] = np.asarray(sd[name + ".bias"], np.float32)
    return out


def _norm(sd, name, scale_key="weight"):
    out = {"scale": np.asarray(sd[name + "." + scale_key], np.float32)}
    if name + ".bias" in sd:
        out["bias"] = np.asarray(sd[name + ".bias"], np.float32)
    return out


def convert_wan_transformer(sd: Mapping[str, np.ndarray], cfg: WanConfig) -> Dict:
    p: Dict = {
        "patch_embedding": _conv(sd, "patch_embedding"),
        "text_proj_1": _lin(sd, "condition_embedder.text_embedder.linear_1"),
        "text_proj_2": _lin(sd, "condition_embedder.text_embedder.linear_2"),
        "time_embed": {
            "Dense_0": _lin(sd, "condition_embedder.time_embedder.linear_1"),
            "Dense_1": _lin(sd, "condition_embedder.time_embedder.linear_2"),
        },
        "time_projection": _lin(sd, "condition_embedder.time_proj"),
        "head_modulation": np.asarray(sd["scale_shift_table"], np.float32)
        .reshape(1, 2, cfg.dim),
        "proj_out": _lin(sd, "proj_out"),
    }
    if "condition_embedder.image_embedder.norm1.weight" in sd:
        # I2V image-context embedder (diffusers WanImageEmbedding)
        ie = "condition_embedder.image_embedder"
        p["img_norm1"] = _norm(sd, f"{ie}.norm1")
        p["img_ff_1"] = _lin(sd, f"{ie}.ff.net.0.proj")
        p["img_ff_2"] = _lin(sd, f"{ie}.ff.net.2")
        p["img_norm2"] = _norm(sd, f"{ie}.norm2")
    layers = []
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        layers.append({
            "modulation": np.asarray(sd[f"{b}.scale_shift_table"], np.float32)
            .reshape(1, 6, cfg.dim),
            "attn1": {
                "to_q": _lin(sd, f"{b}.attn1.to_q"),
                "to_k": _lin(sd, f"{b}.attn1.to_k"),
                "to_v": _lin(sd, f"{b}.attn1.to_v"),
                "to_out": _lin(sd, f"{b}.attn1.to_out.0"),
                "norm_q": _norm(sd, f"{b}.attn1.norm_q", "weight"),
                "norm_k": _norm(sd, f"{b}.attn1.norm_k", "weight"),
            },
            "attn2": {
                "to_q": _lin(sd, f"{b}.attn2.to_q"),
                "to_k": _lin(sd, f"{b}.attn2.to_k"),
                "to_v": _lin(sd, f"{b}.attn2.to_v"),
                "to_out": _lin(sd, f"{b}.attn2.to_out.0"),
                "norm_q": _norm(sd, f"{b}.attn2.norm_q", "weight"),
                "norm_k": _norm(sd, f"{b}.attn2.norm_k", "weight"),
                **({
                    # I2V added K/V projections (reference image branch,
                    # modify_wan.py:121-126)
                    "add_k_proj": _lin(sd, f"{b}.attn2.add_k_proj"),
                    "add_v_proj": _lin(sd, f"{b}.attn2.add_v_proj"),
                    "norm_added_k": _norm(sd, f"{b}.attn2.norm_added_k",
                                          "weight"),
                } if f"{b}.attn2.add_k_proj.weight" in sd else {}),
            },
            "norm3": _norm(sd, f"{b}.norm2"),
            "ffn": {
                "Dense_0": _lin(sd, f"{b}.ffn.net.0.proj"),
                "Dense_1": _lin(sd, f"{b}.ffn.net.2"),
            },
        })
    p["blocks"] = _stack_layers(layers)
    return {"params": p}


def convert_cogvideox_transformer(
    sd: Mapping[str, np.ndarray], cfg: CogVideoXConfig
) -> Dict:
    p: Dict = {
        "patch_embed": _conv(sd, "patch_embed.proj"),
        "text_proj": _lin(sd, "patch_embed.text_proj"),
        "time_embed_1": _lin(sd, "time_embedding.linear_1"),
        "time_embed_2": _lin(sd, "time_embedding.linear_2"),
        "norm_final": _norm(sd, "norm_final"),
        "norm_out": _norm(sd, "norm_out.norm"),
        "norm_out_linear": _lin(sd, "norm_out.linear"),
        "proj_out": _lin(sd, "proj_out"),
    }
    layers = []
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        layers.append({
            "norm1": {
                "linear": _lin(sd, f"{b}.norm1.linear"),
                "norm": _norm(sd, f"{b}.norm1.norm"),
            },
            "norm2": {
                "linear": _lin(sd, f"{b}.norm2.linear"),
                "norm": _norm(sd, f"{b}.norm2.norm"),
            },
            "attn1": {
                "to_q": _lin(sd, f"{b}.attn1.to_q"),
                "to_k": _lin(sd, f"{b}.attn1.to_k"),
                "to_v": _lin(sd, f"{b}.attn1.to_v"),
                "to_out": _lin(sd, f"{b}.attn1.to_out.0"),
                "norm_q": _norm(sd, f"{b}.attn1.norm_q"),
                "norm_k": _norm(sd, f"{b}.attn1.norm_k"),
            },
            "ff": {
                "Dense_0": _lin(sd, f"{b}.ff.net.0.proj"),
                "Dense_1": _lin(sd, f"{b}.ff.net.2"),
            },
        })
    p["blocks"] = _stack_layers(layers)
    return {"params": p}
