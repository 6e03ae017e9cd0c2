"""Attention/mask visualization CLI (the reference's analysis tooling:
``visualize_head_seq`` heatmaps, ``tools.py:19-120``, and the gilbert
curve plots, ``Triton/tests/gilbert/gilbert_visualization.py``).

Renders, for a family preset (or explicit geometry):
  * per-head pooled block-score heatmaps,
  * the energy mask and multi-level mask derived from them,
  * the 3-D gilbert scan path.

Inputs are random (or cluster-structured with --peaked) q/k unless an .npz
with arrays ``q``/``k`` of shape [B, H, L, D] is given — e.g. dumped from a
debugging hook during a real run.

  python -m blade.cli.visualize --family wan --tiny --peaked --out /tmp/viz
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def get_args():
    p = argparse.ArgumentParser(description="BLADE-TPU mask visualization")
    p.add_argument("--family", choices=["wan", "cogvideox"], default="wan")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--qk", type=str, help=".npz with q/k [B,H,L,D]")
    p.add_argument("--peaked", action="store_true",
                   help="cluster-structured synthetic inputs")
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--out", type=str, default="viz_out")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = get_args()
    jax.config.update("jax_platforms", "cpu") if args.tiny else None
    from blade import config as C
    from blade.attention import masks as M
    from blade.attention.asa import predict_block_scores
    from blade.config import derive_asa_config
    from blade.utils.viz import visualize_gilbert_curve, visualize_head_seq

    if args.tiny:
        preset = (C.WAN_TINY_PRESET if args.family == "wan"
                  else C.COGVIDEOX_TINY_PRESET)
    else:
        preset = C.WAN_480P if args.family == "wan" else C.COGVIDEOX_480P
    cfg = derive_asa_config(preset, "energy")
    rng = jax.random.PRNGKey(args.seed)

    if args.qk:
        data = np.load(args.qk)
        q, k = jnp.asarray(data["q"]), jnp.asarray(data["k"])
    else:
        b, h, l, d = 1, max(args.heads, 2), cfg.video_tokens, 64
        if args.peaked:
            cid = (jnp.arange(l) * 16) // l
            cvecs = jax.random.normal(jax.random.fold_in(rng, 1), (16, d))
            base = cvecs[cid] * 1.2
        else:
            base = 0.0
        q = base + jax.random.normal(jax.random.fold_in(rng, 2), (b, h, l, d))
        k = base + jax.random.normal(jax.random.fold_in(rng, 3), (b, h, l, d))

    scores = predict_block_scores(rng, q, k, cfg)
    energy = M.energy_mask(
        scores, min_retain_ratio=cfg.min_retain_ratio,
        max_retain_ratio=cfg.max_retain_ratio,
        energy_threshold=cfg.energy_threshold,
    )
    levels = M.multilevel_mask(scores, cfg.mask_ratios)

    os.makedirs(args.out, exist_ok=True)
    p1 = visualize_head_seq(
        {
            "block scores": np.asarray(scores),
            "energy mask": np.asarray(energy),
            "multilevel mask": np.asarray(levels),
        },
        os.path.join(args.out, "masks.png"), max_heads=args.heads,
    )
    print(f"mask heatmaps -> {p1}  (densities: energy "
          f"{float(np.asarray(energy).mean()):.3f})")
    t, h_, w_ = preset.latent_grid()
    p2 = visualize_gilbert_curve(
        w_, h_, t, os.path.join(args.out, "gilbert_path.png")
    )
    print(f"gilbert path -> {p2}")


if __name__ == "__main__":
    main()
