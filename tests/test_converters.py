"""Converter structural tests: synthetic diffusers-shaped state dicts must
convert into trees that exactly match model.init() structure and run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blade.convert.dit_convert import (
    convert_cogvideox_transformer,
    convert_wan_transformer,
)
from blade.models.cogvideox_dit import COGVIDEOX_TINY, CogVideoXModel
from blade.models.wan_dit import WAN_TINY, WanModel


def _rand(*shape):
    return np.random.default_rng(0).normal(size=shape).astype(np.float32) * 0.02


def _wan_sd(c):
    sd = {
        "patch_embedding.weight": _rand(c.dim, c.in_channels, 1, 2, 2),
        "patch_embedding.bias": _rand(c.dim),
        "condition_embedder.text_embedder.linear_1.weight": _rand(c.dim, c.text_dim),
        "condition_embedder.text_embedder.linear_1.bias": _rand(c.dim),
        "condition_embedder.text_embedder.linear_2.weight": _rand(c.dim, c.dim),
        "condition_embedder.text_embedder.linear_2.bias": _rand(c.dim),
        "condition_embedder.time_embedder.linear_1.weight": _rand(c.dim, c.freq_dim),
        "condition_embedder.time_embedder.linear_1.bias": _rand(c.dim),
        "condition_embedder.time_embedder.linear_2.weight": _rand(c.dim, c.dim),
        "condition_embedder.time_embedder.linear_2.bias": _rand(c.dim),
        "condition_embedder.time_proj.weight": _rand(6 * c.dim, c.dim),
        "condition_embedder.time_proj.bias": _rand(6 * c.dim),
        "scale_shift_table": _rand(1, 2, c.dim),
        "proj_out.weight": _rand(2 * 2 * c.out_channels, c.dim),
        "proj_out.bias": _rand(2 * 2 * c.out_channels),
    }
    for i in range(c.num_layers):
        b = f"blocks.{i}"
        sd[f"{b}.scale_shift_table"] = _rand(1, 6, c.dim)
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                sd[f"{b}.{attn}.{proj}.weight"] = _rand(c.dim, c.dim)
                sd[f"{b}.{attn}.{proj}.bias"] = _rand(c.dim)
            sd[f"{b}.{attn}.to_out.0.weight"] = _rand(c.dim, c.dim)
            sd[f"{b}.{attn}.to_out.0.bias"] = _rand(c.dim)
            sd[f"{b}.{attn}.norm_q.weight"] = _rand(c.dim)
            sd[f"{b}.{attn}.norm_k.weight"] = _rand(c.dim)
        sd[f"{b}.norm2.weight"] = _rand(c.dim)
        sd[f"{b}.norm2.bias"] = _rand(c.dim)
        sd[f"{b}.ffn.net.0.proj.weight"] = _rand(c.ffn_dim, c.dim)
        sd[f"{b}.ffn.net.0.proj.bias"] = _rand(c.ffn_dim)
        sd[f"{b}.ffn.net.2.weight"] = _rand(c.dim, c.ffn_dim)
        sd[f"{b}.ffn.net.2.bias"] = _rand(c.dim)
    return sd


def _cog_sd(c):
    p = c.patch_size
    sd = {
        "patch_embed.proj.weight": _rand(c.dim, c.in_channels, p, p),
        "patch_embed.proj.bias": _rand(c.dim),
        "patch_embed.text_proj.weight": _rand(c.dim, c.text_embed_dim),
        "patch_embed.text_proj.bias": _rand(c.dim),
        "time_embedding.linear_1.weight": _rand(c.time_embed_dim, c.dim),
        "time_embedding.linear_1.bias": _rand(c.time_embed_dim),
        "time_embedding.linear_2.weight": _rand(c.time_embed_dim, c.time_embed_dim),
        "time_embedding.linear_2.bias": _rand(c.time_embed_dim),
        "norm_final.weight": _rand(c.dim),
        "norm_final.bias": _rand(c.dim),
        "norm_out.norm.weight": _rand(c.dim),
        "norm_out.norm.bias": _rand(c.dim),
        "norm_out.linear.weight": _rand(2 * c.dim, c.time_embed_dim),
        "norm_out.linear.bias": _rand(2 * c.dim),
        "proj_out.weight": _rand(p * p * c.out_channels, c.dim),
        "proj_out.bias": _rand(p * p * c.out_channels),
    }
    hd = c.head_dim
    for i in range(c.num_layers):
        b = f"transformer_blocks.{i}"
        for n in ("norm1", "norm2"):
            sd[f"{b}.{n}.linear.weight"] = _rand(6 * c.dim, c.time_embed_dim)
            sd[f"{b}.{n}.linear.bias"] = _rand(6 * c.dim)
            sd[f"{b}.{n}.norm.weight"] = _rand(c.dim)
            sd[f"{b}.{n}.norm.bias"] = _rand(c.dim)
        for proj in ("to_q", "to_k", "to_v"):
            sd[f"{b}.attn1.{proj}.weight"] = _rand(c.dim, c.dim)
            sd[f"{b}.attn1.{proj}.bias"] = _rand(c.dim)
        sd[f"{b}.attn1.to_out.0.weight"] = _rand(c.dim, c.dim)
        sd[f"{b}.attn1.to_out.0.bias"] = _rand(c.dim)
        sd[f"{b}.attn1.norm_q.weight"] = _rand(hd)
        sd[f"{b}.attn1.norm_q.bias"] = _rand(hd)
        sd[f"{b}.attn1.norm_k.weight"] = _rand(hd)
        sd[f"{b}.attn1.norm_k.bias"] = _rand(hd)
        sd[f"{b}.ff.net.0.proj.weight"] = _rand(c.ffn_mult * c.dim, c.dim)
        sd[f"{b}.ff.net.0.proj.bias"] = _rand(c.ffn_mult * c.dim)
        sd[f"{b}.ff.net.2.weight"] = _rand(c.dim, c.ffn_mult * c.dim)
        sd[f"{b}.ff.net.2.bias"] = _rand(c.dim)
    return sd


def _assert_same_structure(converted, initialized):
    c_flat = jax.tree_util.tree_flatten_with_path(converted)[0]
    i_flat = jax.tree_util.tree_flatten_with_path(initialized)[0]
    c_map = {jax.tree_util.keystr(k): np.shape(v) for k, v in c_flat}
    i_map = {jax.tree_util.keystr(k): np.shape(v) for k, v in i_flat}
    assert c_map == i_map, (
        sorted(set(i_map) - set(c_map))[:8],
        sorted(set(c_map) - set(i_map))[:8],
        {k: (c_map[k], i_map[k]) for k in c_map if k in i_map and c_map[k] != i_map[k]},
    )


def test_wan_converter_structure_and_forward():
    c = WAN_TINY
    model = WanModel(c, dtype=jnp.float32)
    lat = jnp.zeros((1, 16, 2, 8, 8))
    text = jnp.zeros((1, 8, c.text_dim))
    ref = model.init(jax.random.PRNGKey(0), lat, jnp.ones((1,)), text)
    params = convert_wan_transformer(_wan_sd(c), c)
    _assert_same_structure(params, ref)
    out = model.apply(params, lat + 0.5, jnp.ones((1,)), text + 0.1)
    assert np.isfinite(np.asarray(out)).all()


def test_cog_converter_structure_and_forward():
    c = COGVIDEOX_TINY
    model = CogVideoXModel(c, dtype=jnp.float32)
    lat = jnp.zeros((1, 2, 16, 8, 8))
    text = jnp.zeros((1, 8, c.text_embed_dim))
    ref = model.init(jax.random.PRNGKey(0), lat, jnp.ones((1,)), text)
    params = convert_cogvideox_transformer(_cog_sd(c), c)
    _assert_same_structure(params, ref)
    out = model.apply(params, lat + 0.5, jnp.ones((1,)), text + 0.1)
    assert np.isfinite(np.asarray(out)).all()
