"""Checkpoint loading: HF safetensors dirs -> pipeline params, LoRA merge.

Layout expected (diffusers-style):
  <weights_dir>/transformer/*.safetensors   (DiT)
  <weights_dir>/text_encoder/*.safetensors  (T5/UMT5)
  <weights_dir>/vae/*.safetensors           (AutoencoderKLWan /
                                             AutoencoderKLCogVideoX)

LoRA adapters come either from a blade TDM checkpoint (orbax) or an ``.npz``
of {path: a/b factors} and are merged into the DiT at load
(BASELINE: "LoRA weights merged at load").
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import numpy as np

__all__ = [
    "load_safetensors_dir",
    "load_dit_params",
    "load_text_params",
    "load_vae_params",
]


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    from safetensors import numpy as st_numpy

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    sd: Dict[str, np.ndarray] = {}
    for f in files:
        sd.update(st_numpy.load_file(f))
    return sd


def load_dit_params(weights_dir: str, preset):
    from blade.convert.dit_convert import (
        convert_cogvideox_transformer,
        convert_wan_transformer,
    )

    sd = load_safetensors_dir(os.path.join(weights_dir, "transformer"))
    if preset.name == "wan":
        return convert_wan_transformer(sd, preset.dit)
    return convert_cogvideox_transformer(sd, preset.dit)


def load_text_params(weights_dir: str, preset):
    from blade.convert.t5_convert import convert_t5_encoder

    sd = load_safetensors_dir(os.path.join(weights_dir, "text_encoder"))
    return convert_t5_encoder(sd, preset.text)


def load_vae_params(weights_dir: str, preset):
    from blade.convert.vae_convert import (
        convert_cogvideox_vae,
        convert_wan_vae,
    )

    sd = load_safetensors_dir(os.path.join(weights_dir, "vae"))
    if preset.name == "wan":
        return convert_wan_vae(sd)
    return convert_cogvideox_vae(sd)
