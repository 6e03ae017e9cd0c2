"""HF T5/UMT5 encoder state-dict -> blade T5Encoder params.

Accepts a flat name->numpy mapping (from ``safetensors`` or a torch
``state_dict``); validated against ``transformers`` in
``tests/test_t5.py::test_parity_with_hf_t5``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from blade.models.t5 import T5Config

__all__ = ["convert_t5_encoder"]


def convert_t5_encoder(sd: Mapping[str, np.ndarray], cfg: T5Config) -> Dict:
    """Build the Flax param tree for :class:`blade.models.t5.T5Encoder`."""
    g = lambda name: np.asarray(sd[name], np.float32)

    def linear(name):  # torch Linear weight [out, in] -> flax kernel [in, out]
        return {"kernel": g(name + ".weight").T}

    params: Dict = {
        "embed": {"embedding": g("shared.weight")
                  if "shared.weight" in sd else g("encoder.embed_tokens.weight")},
        "final_norm": {"scale": g("encoder.final_layer_norm.weight")},
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer"
        attn = {
            "q": linear(f"{pre}.0.SelfAttention.q"),
            "k": linear(f"{pre}.0.SelfAttention.k"),
            "v": linear(f"{pre}.0.SelfAttention.v"),
            "o": linear(f"{pre}.0.SelfAttention.o"),
        }
        bias_name = f"{pre}.0.SelfAttention.relative_attention_bias.weight"
        if bias_name in sd:
            attn["rel_bias"] = g(bias_name)
        params[f"block_{i}"] = {
            "attn": attn,
            "norm_attn": {"scale": g(f"{pre}.0.layer_norm.weight")},
            "wi_0": linear(f"{pre}.1.DenseReluDense.wi_0"),
            "wi_1": linear(f"{pre}.1.DenseReluDense.wi_1"),
            "wo": linear(f"{pre}.1.DenseReluDense.wo"),
            "norm_ff": {"scale": g(f"{pre}.1.layer_norm.weight")},
        }
    return {"params": params}
