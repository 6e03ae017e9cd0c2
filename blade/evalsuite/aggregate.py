"""VBench score aggregation (reference ``calc_finnal_score.py``, fixed to be
self-contained: the constants ship in-repo)."""

from __future__ import annotations

import json
import os
from typing import Dict

from blade.evalsuite.constants import (
    DIM_WEIGHT,
    NORMALIZE_DIC,
    QUALITY_LIST,
    QUALITY_WEIGHT,
    SEMANTIC_LIST,
    SEMANTIC_WEIGHT,
    TASK_INFO,
)

__all__ = ["load_results_dir", "normalized_scores", "final_scores", "format_table"]


def load_results_dir(directory: str) -> Dict[str, float]:
    """Read ``*_eval_results.json`` files (one per dimension) into a dict;
    missing dimensions default to 0 (matching the reference)."""
    data: Dict[str, float] = {}
    for fname in sorted(os.listdir(directory)):
        if fname.startswith((".", "__")) or not fname.endswith("_eval_results.json"):
            continue
        with open(os.path.join(directory, fname)) as f:
            payload = json.load(f)
        if isinstance(payload, dict):
            for key, val in payload.items():
                data[key.replace("_", " ")] = val[0] if isinstance(val, list) else val
    for key in TASK_INFO:
        data.setdefault(key, 0.0)
    return data


def normalized_scores(raw: Dict[str, float]) -> Dict[str, float]:
    out = {}
    for key in TASK_INFO:
        lo, hi = NORMALIZE_DIC[key]["Min"], NORMALIZE_DIC[key]["Max"]
        norm = (min(max(raw[key], lo), hi) - lo) / (hi - lo)
        out[key] = norm * DIM_WEIGHT[key]
    return out


def final_scores(raw: Dict[str, float]) -> Dict[str, float]:
    norm = normalized_scores(raw)
    qw = sum(DIM_WEIGHT[k] for k in QUALITY_LIST)
    sw = sum(DIM_WEIGHT[k] for k in SEMANTIC_LIST)
    quality = sum(norm[k] for k in QUALITY_LIST) / qw
    semantic = sum(norm[k] for k in SEMANTIC_LIST) / sw
    total = (quality * QUALITY_WEIGHT + semantic * SEMANTIC_WEIGHT) / (
        QUALITY_WEIGHT + SEMANTIC_WEIGHT
    )
    return {"quality": quality, "semantic": semantic, "total": total}


def format_table(raw: Dict[str, float]) -> str:
    rows = [f"{'dimension':<26}{'raw':>10}{'weighted':>12}"]
    norm = normalized_scores(raw)
    for key in TASK_INFO:
        rows.append(f"{key:<26}{raw[key]:>10.4f}{norm[key]:>12.4f}")
    final = final_scores(raw)
    rows.append("-" * 48)
    for k, v in final.items():
        rows.append(f"{k:<26}{v:>10.4f}")
    return "\n".join(rows)
