"""Device mesh + sharding rules (the reference's Accelerate/DeepSpeed layer).

The reference's only real parallelism is ZeRO-2 data parallelism over NCCL
(``cogvideox/train/config.yaml``).  TPU-native equivalent: a
``jax.sharding.Mesh`` with axes

  * ``dp``   — data parallel (batch),
  * ``fsdp`` — parameter/optimizer sharding (the ZeRO-2/3 analogue),
  * ``tp``   — tensor parallel (attention heads / FFN columns), optional,

and NamedSharding rules applied to params/optimizer/batch; XLA inserts the
collectives (all-gather for fsdp params, psum for dp grads, ICI-local).
No explicit communication code is needed for the data path — the sparse
attention kernel is single-chip and shards over (dp, heads).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "param_sharding_rules",
    "shard_params",
    "shard_batch",
    "replicate",
]


def make_mesh(
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = dp * fsdp * tp
    assert len(devices) >= n, (len(devices), n)
    arr = np.asarray(devices[:n]).reshape(dp, fsdp, tp)
    return Mesh(arr, axis_names=("dp", "fsdp", "tp"))


# (regex on the '/'-joined param path, PartitionSpec) — first match wins.
# Kernels are [in, out]; we shard the larger/contraction-friendly dim:
#   * attention/ffn input projections: out-dim over tp, in-dim over fsdp
#   * output projections: in-dim over tp (row parallel), out over fsdp
#   * embeddings/bias/norm scales: fsdp on the big axis or replicated.
DEFAULT_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(to_q|to_k|to_v|text_proj|linear|time_projection|ffn.*Dense_0|ff.*Dense_0)/kernel$",
     P("fsdp", "tp")),
    (r".*(to_out|ffn.*Dense_1|ff.*Dense_1|proj_out)/kernel$", P("tp", "fsdp")),
    (r".*kernel$", P("fsdp", None)),
    (r".*(lora.*|a|b)$", P(None, None)),
    (r".*", P()),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def param_sharding_rules(params, mesh: Mesh, rules=DEFAULT_RULES):
    """PartitionSpec tree for a param tree by path-regex rules.

    Falls back to replication whenever a spec does not divide the shape.
    """

    def spec_for(path, leaf):
        s = _path_str(path)
        for pat, spec in rules:
            if re.match(pat, s):
                chosen = spec
                break
        else:
            chosen = P()
        # Right-align the spec to the trailing dims (scan-stacked params
        # carry a leading layer axis; conv kernels lead with window dims),
        # then drop axes that don't divide the shape.
        spec_t = tuple(chosen)
        if len(spec_t) < leaf.ndim:
            spec_t = (None,) * (leaf.ndim - len(spec_t)) + spec_t
        spec_t = spec_t[: leaf.ndim]
        fixed = []
        for dim, axis in enumerate(spec_t):
            if axis is None:
                fixed.append(None)
                continue
            size = mesh.shape[axis]
            if leaf.shape[dim] % size == 0 and leaf.shape[dim] >= size:
                fixed.append(axis)
            else:
                fixed.append(None)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, rules=DEFAULT_RULES):
    shardings = param_sharding_rules(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis over dp (params shard over fsdp/tp)."""

    def put(x):
        spec = P("dp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
