"""Attention / mask visualization (parity with the reference's
``visualize_head_seq``, ``special_attentions_local/utils/tools.py:19-120``,
and the gilbert visualization scripts under ``Triton/tests/gilbert/``).

Pure matplotlib (Agg backend, headless); every function renders to a file
and returns the path.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

__all__ = ["visualize_head_seq", "visualize_gilbert_curve"]


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def visualize_head_seq(
    data_dict: Dict[str, np.ndarray],
    out_path: str,
    *,
    batch_idx: int = 0,
    max_heads_per_row: int = 4,
    figsize_scale: float = 3.0,
    cmap: str = "viridis",
    max_heads: Optional[int] = 8,
) -> str:
    """Per-head heatmap grid for ``{title: [B, H, n, m] or [H, n, m]}``
    (block scores, boolean/int masks, attention estimates).

    One row group per entry; heads wrap at ``max_heads_per_row``.
    """
    plt = _mpl()
    processed = {}
    for name, data in data_dict.items():
        arr = np.asarray(data)
        if arr.ndim == 4:
            arr = arr[batch_idx]
        elif arr.ndim != 3:
            raise ValueError(f"{name}: expected 3D/4D, got {arr.shape}")
        processed[name] = arr.astype(np.float32)

    n_heads = min(a.shape[0] for a in processed.values())
    if max_heads:
        n_heads = min(n_heads, max_heads)
    cols = min(max_heads_per_row, n_heads)
    rows_per = -(-n_heads // cols)
    total_rows = rows_per * len(processed)
    fig, axes = plt.subplots(
        total_rows, cols,
        figsize=(cols * figsize_scale, total_rows * figsize_scale),
        squeeze=False,
    )
    for gi, (name, arr) in enumerate(processed.items()):
        vmin, vmax = float(arr[:n_heads].min()), float(arr[:n_heads].max())
        for hd in range(rows_per * cols):
            ax = axes[gi * rows_per + hd // cols][hd % cols]
            if hd >= n_heads:
                ax.axis("off")
                continue
            im = ax.imshow(arr[hd], cmap=cmap, vmin=vmin, vmax=vmax,
                           aspect="auto", interpolation="nearest")
            ax.set_title(f"{name} h{hd}", fontsize=8)
            ax.set_xticks([])
            ax.set_yticks([])
        fig.colorbar(im, ax=axes[gi * rows_per][-1], fraction=0.046)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def visualize_gilbert_curve(
    width: int, height: int, depth: int, out_path: str, *, max_points=4096
) -> str:
    """3-D plot of the gilbert scan path through the latent grid
    (reference ``gilbert_visualization.py``)."""
    plt = _mpl()
    from blade.attention.gilbert import gilbert3d_coords

    coords = np.asarray(gilbert3d_coords(width, height, depth))
    if len(coords) > max_points:
        coords = coords[:: len(coords) // max_points]
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    c = np.linspace(0, 1, len(coords))
    ax.plot(coords[:, 0], coords[:, 1], coords[:, 2],
            lw=0.5, color="lightgray")
    ax.scatter(coords[:, 0], coords[:, 1], coords[:, 2], c=c,
               cmap="viridis", s=2)
    ax.set_title(f"gilbert scan path {width}x{height}x{depth}")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
