"""HF/diffusers VAE state dicts -> blade Flax param trees.

Families:
  * ``AutoencoderKLWan``      -> ``blade.models.vae_wan.WanVAE``
    (reference load: ``wanx/train/inference.py:33-38``)
  * ``AutoencoderKLCogVideoX``-> ``blade.models.vae_cogvideox.CogVideoXVAE``
    (reference load: ``cogvideox/train/inference.py:48,54-55``)

The Flax modules were written so that torch attribute paths map 1:1 onto
Flax scopes: integer list indices merge into the preceding segment
(``down_blocks.3`` -> ``down_blocks_3``), causal-conv weights live under an
inner ``conv`` scope, and torch conv weights transpose
``[out,in,*k] -> [*k,in,out]``.  ``fake_torch_state_dict`` inverts the
mapping, which both provides torch-free converter tests and documents the
expected checkpoint layout key-for-key.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = [
    "convert_wan_vae",
    "convert_cogvideox_vae",
    "fake_torch_state_dict",
]

# Causal convs whose kernels live under an inner "conv" scope in Flax
# (for Wan; CogVideoX torch keys already carry the inner ".conv").
_WAN_CAUSAL = {
    "conv_in", "conv_out", "conv1", "conv2", "conv_shortcut", "time_conv",
    "quant_conv", "post_quant_conv",
}
# 1x1 Conv2d modules converted to Dense (squeeze the spatial kernel dims).
_DENSE_1X1 = {"to_qkv", "proj"}
# torch GroupNorm affine params -> flax scale/bias.
_GROUPNORMS = {"norm1", "norm2", "norm_out", "norm_layer"}


def _merge_indices(parts):
    out = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv weight [out, in, *k] -> flax [*k, in, out]."""
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _wan_entry(key: str, w: np.ndarray):
    parts = _merge_indices(key.split("."))
    leaf = parts[-1]
    scope = parts[:-1]
    mod = scope[-1] if scope else ""
    if leaf == "gamma":
        return tuple(scope) + ("gamma",), np.asarray(w).reshape(-1)
    if mod in _DENSE_1X1:
        if leaf == "weight":
            return tuple(scope) + ("kernel",), np.asarray(w)[..., 0, 0].T
        return tuple(scope) + ("bias",), np.asarray(w)
    if mod in _WAN_CAUSAL:
        if leaf == "weight":
            return tuple(scope) + ("conv", "kernel"), _conv_kernel(w)
        return tuple(scope) + ("conv", "bias"), np.asarray(w)
    if mod == "resample_1":
        if leaf == "weight":
            return tuple(scope) + ("kernel",), _conv_kernel(w)
        return tuple(scope) + ("bias",), np.asarray(w)
    raise KeyError(f"unmapped AutoencoderKLWan key: {key}")


def _cog_entry(key: str, w: np.ndarray):
    parts = _merge_indices(key.split("."))
    leaf = parts[-1]
    scope = parts[:-1]
    mod = scope[-1] if scope else ""
    if mod == "conv":  # inner conv of causal convs + up/downsampler Conv2d
        if leaf == "weight":
            return tuple(scope) + ("kernel",), _conv_kernel(w)
        return tuple(scope) + ("bias",), np.asarray(w)
    if mod == "conv_shortcut":  # plain SafeConv3d, no inner scope
        if leaf == "weight":
            return tuple(scope) + ("kernel",), _conv_kernel(w)
        return tuple(scope) + ("bias",), np.asarray(w)
    if mod in _GROUPNORMS:
        return tuple(scope) + ("scale" if leaf == "weight" else "bias",), \
            np.asarray(w)
    raise KeyError(f"unmapped AutoencoderKLCogVideoX key: {key}")


def _convert(sd: Dict[str, np.ndarray], entry_fn) -> Dict:
    params: Dict = {}
    for key in sorted(sd):
        path, value = entry_fn(key, np.asarray(sd[key]))
        _set(params, path, value.astype(np.float32))
    return {"params": params}


def convert_wan_vae(sd: Dict[str, np.ndarray]) -> Dict:
    return _convert(sd, _wan_entry)


def convert_cogvideox_vae(sd: Dict[str, np.ndarray]) -> Dict:
    return _convert(sd, _cog_entry)


# --------------------------------------------------------------- inverse
def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _split_index(seg: str) -> str:
    """down_blocks_3 -> down_blocks.3 (only for known list containers)."""
    for container in ("down_blocks", "up_blocks", "resnets", "attentions",
                      "upsamplers", "downsamplers", "resample"):
        if seg.startswith(container + "_") and \
                seg[len(container) + 1:].isdigit():
            return f"{container}.{seg[len(container) + 1:]}"
    return seg


def fake_torch_state_dict(params: Dict, family: str) -> Dict[str, np.ndarray]:
    """Invert the key mapping: a blade param tree -> the torch-layout state
    dict the converter expects (values round-trip exactly).  Used by the
    torch-free converter tests and as executable layout documentation."""
    tree = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    for path, value in _flatten(tree):
        value = np.asarray(value)
        segs = [_split_index(s) for s in path]
        leaf = segs[-1]
        parent = segs[-2] if len(segs) > 1 else ""
        if leaf == "gamma":
            # Wan RMS norms: images=False -> (C,1,1,1); attention norms
            # (inside attentions.N) use images=True -> (C,1,1).
            images = any(s.startswith("attentions") for s in segs)
            shape = (-1, 1, 1) if images else (-1, 1, 1, 1)
            sd[".".join(segs)] = value.reshape(shape)
        elif leaf == "kernel" and parent == "conv":
            key = ".".join(segs[:-1]) if family == "cogvideox" else \
                ".".join(segs[:-2])
            nd = value.ndim
            sd[key + ".weight"] = np.transpose(
                value, (nd - 1, nd - 2) + tuple(range(nd - 2)))
        elif leaf == "bias" and parent == "conv":
            key = ".".join(segs[:-1]) if family == "cogvideox" else \
                ".".join(segs[:-2])
            sd[key + ".bias"] = value
        elif leaf == "kernel" and parent in _DENSE_1X1:
            sd[".".join(segs[:-1]) + ".weight"] = value.T[..., None, None]
        elif leaf == "kernel":  # plain convs: resample.1 / conv_shortcut
            nd = value.ndim
            sd[".".join(segs[:-1]) + ".weight"] = np.transpose(
                value, (nd - 1, nd - 2) + tuple(range(nd - 2)))
        elif leaf == "scale":
            sd[".".join(segs[:-1]) + ".weight"] = value
        else:  # bias of dense / plain conv / groupnorm
            sd[".".join(segs[:-1]) + ".bias"] = value
    return sd
