"""Video export utilities (mp4 via imageio; grid layout like the reference's
``save_videos_grid``)."""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

__all__ = ["to_uint8_frames", "export_video", "save_videos_grid"]


def to_uint8_frames(video: np.ndarray) -> np.ndarray:
    """[-1, 1] float [T, H, W, C] -> uint8 frames."""
    video = np.clip((np.asarray(video, np.float32) + 1.0) * 127.5, 0, 255)
    return video.astype(np.uint8)


def export_video(video: np.ndarray, path: str, fps: int = 8) -> str:
    """Write [T, H, W, C] float video in [-1, 1] (or uint8).

    Prefers the requested container (mp4 via ffmpeg when available); falls
    back to GIF (pure-pillow) with the extension swapped when no ffmpeg
    backend exists, returning the actual path written.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    frames = video if video.dtype == np.uint8 else to_uint8_frames(video)
    import imageio.v3 as iio

    try:
        iio.imwrite(path, frames, fps=fps)
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".gif"
        iio.imwrite(alt, frames, duration=int(1000 / fps), loop=0)
        return alt


def save_videos_grid(videos: np.ndarray, path: str, fps: int = 8, ncols: int = 4):
    """[B, T, H, W, C] -> one mp4 with samples tiled in a grid."""
    b, t, h, w, c = videos.shape
    ncols = min(ncols, b)
    nrows = -(-b // ncols)
    pad = nrows * ncols - b
    if pad:
        videos = np.concatenate([videos, np.zeros((pad, t, h, w, c), videos.dtype)])
    grid = videos.reshape(nrows, ncols, t, h, w, c)
    grid = grid.transpose(2, 0, 3, 1, 4, 5).reshape(t, nrows * h, ncols * w, c)
    return export_video(grid, path, fps=fps)
