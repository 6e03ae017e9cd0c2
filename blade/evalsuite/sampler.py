"""Batched evaluation sampler (VBench filename contract).

Replaces the reference's one-process-per-GPU mp.Queue sampler
(``simple_multiprocess_sampler.py``) with the TPU-native layout: on a pod,
each *host process* takes a strided shard of the prompt list by
``jax.process_index()``, and the per-host batch is vmapped/jitted over the
local devices.  Behavioral parity:

  * filename contract ``"{naming_prompt}-{video_idx}.mp4"``
    (``simple_multiprocess_sampler.py:268-270``),
  * per-video seeds ``base_seed + prompt_idx * 1000 + video_idx`` (:181),
  * skip-existing resume (:272-274),
  * per-batch error isolation (a failed batch is logged, not fatal).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import List, Optional, Sequence

import jax
import numpy as np

from blade.utils.video_io import export_video

__all__ = ["SamplerConfig", "build_tasks", "run_sampler"]


@dataclasses.dataclass
class SamplerConfig:
    output_dir: str
    num_videos_per_prompt: int = 5
    batch_size: int = 2
    base_seed: int = 42
    num_steps: int = 8
    guidance_scale: float = 1.0
    fps: int = 16

    @classmethod
    def from_json(cls, path: str) -> "SamplerConfig":
        with open(path) as f:
            cfg = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})


def _safe_name(prompt: str, limit: int = 180) -> str:
    return prompt.strip().replace("/", " ")[:limit]


def build_tasks(
    prompts: Sequence[str],
    cfg: SamplerConfig,
    naming_prompts: Optional[Sequence[str]] = None,
):
    """(prompt_idx, video_idx, seed, out_path) list with skip-existing and
    host sharding by process index."""
    naming = naming_prompts or prompts
    tasks = []
    for p_idx, prompt in enumerate(prompts):
        for v_idx in range(cfg.num_videos_per_prompt):
            name = f"{_safe_name(naming[p_idx])}-{v_idx}.mp4"
            path = os.path.join(cfg.output_dir, name)
            alt = os.path.splitext(path)[0] + ".gif"
            if os.path.exists(path) or os.path.exists(alt):
                continue
            seed = cfg.base_seed + p_idx * 1000 + v_idx
            tasks.append((p_idx, v_idx, seed, path))
    # Host-level sharding (pod): stride by process index.
    n, i = jax.process_count(), jax.process_index()
    return tasks[i::n]


def run_sampler(generate_fn, embeds_fn, prompts, cfg: SamplerConfig, log=print):
    """Drive generation task-batch by task-batch.

    ``embeds_fn(list[str]) -> [B, L, D]`` prompt embeddings;
    ``generate_fn(embeds, seeds[B]) -> [B, T, H, W, 3]`` frames in [-1, 1].
    """
    os.makedirs(cfg.output_dir, exist_ok=True)
    tasks = build_tasks(prompts, cfg)
    log(f"{len(tasks)} videos to generate -> {cfg.output_dir}")
    done, failed = 0, 0
    t_start = time.time()
    for i in range(0, len(tasks), cfg.batch_size):
        chunk = tasks[i : i + cfg.batch_size]
        # Pad the trailing partial batch (duplicating the last task) so the
        # jitted generate function sees one static batch shape.
        padded = chunk + [chunk[-1]] * (cfg.batch_size - len(chunk))
        try:
            embeds = embeds_fn([prompts[p] for p, _, _, _ in padded])
            seeds = np.array([s for _, _, s, _ in padded], np.uint32)
            frames = np.asarray(generate_fn(embeds, seeds))[: len(chunk)]
            for (p, v, s, path), clip in zip(chunk, frames):
                out = export_video(clip, path, fps=cfg.fps)
                done += 1
            dt = time.time() - t_start
            log(f"[{done}/{len(tasks)}] {done / max(dt, 1e-9) * 60:.2f} clips/min")
        except Exception as e:  # per-batch isolation, like the reference
            failed += len(chunk)
            log(f"batch {i // cfg.batch_size} failed: {type(e).__name__}: {e}")
    return {"done": done, "failed": failed, "seconds": time.time() - t_start}
