"""Gilbert-curve locality analysis (reference ``Triton/tests/gilbert/``:
adjacency %, locality ratios, scan-path visualization).

  python -m blade.cli.analyze_gilbert --width 45 --height 30 --depth 13 \
      --block 128 --viz curve.png
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from blade.attention.gilbert import gilbert3d_coords


def locality_stats(width: int, height: int, depth: int, block: int = 128):
    coords = gilbert3d_coords(width, height, depth).astype(np.int64)
    steps = np.abs(np.diff(coords, axis=0)).sum(axis=1)
    n = len(coords)

    # Row-major baseline ordering for comparison.
    zyx = np.stack(
        np.meshgrid(
            np.arange(depth), np.arange(height), np.arange(width), indexing="ij"
        ),
        -1,
    ).reshape(-1, 3)[:, ::-1]
    rm_steps = np.abs(np.diff(zyx, axis=0)).sum(axis=1)

    def block_spread(c):
        """Mean spatial bounding-box diagonal of each `block`-token chunk —
        lower = more spatially compact attention blocks."""
        m = (n // block) * block
        chunks = c[:m].reshape(-1, block, 3)
        ext = chunks.max(axis=1) - chunks.min(axis=1)
        return float(np.linalg.norm(ext, axis=1).mean())

    gil_spread = block_spread(coords)
    rm_spread = block_spread(zyx)
    return {
        "tokens": n,
        "adjacency_pct": float((steps == 1).mean() * 100),
        "rowmajor_adjacency_pct": float((rm_steps == 1).mean() * 100),
        "mean_step": float(steps.mean()),
        "block_spread_gilbert": gil_spread,
        "block_spread_rowmajor": rm_spread,
        "locality_improvement": rm_spread / gil_spread,
    }


def save_curve_image(width, height, depth, path):
    """Project the scan order onto the (x, y) plane as a color ramp PNG."""
    from PIL import Image

    coords = gilbert3d_coords(width, height, depth)
    img = np.zeros((height, width, 3), np.float64)
    cnt = np.zeros((height, width, 1), np.float64)
    order = np.linspace(0, 1, len(coords))
    for (x, y, _), o in zip(coords, order):
        img[y, x, 0] += o
        img[y, x, 1] += 1 - o
        cnt[y, x, 0] += 1
    img = img / np.maximum(cnt, 1)
    img[..., 2] = 0.25
    scale = max(1, 512 // max(width, height))
    arr = (img * 255).astype(np.uint8).repeat(scale, 0).repeat(scale, 1)
    Image.fromarray(arr).save(path)
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=45)
    p.add_argument("--height", type=int, default=30)
    p.add_argument("--depth", type=int, default=13)
    p.add_argument("--block", type=int, default=128)
    p.add_argument("--viz", type=str, help="write a curve projection PNG")
    args = p.parse_args()
    stats = locality_stats(args.width, args.height, args.depth, args.block)
    print(json.dumps(stats, indent=2))
    if args.viz:
        print(save_curve_image(args.width, args.height, args.depth, args.viz))


if __name__ == "__main__":
    main()
