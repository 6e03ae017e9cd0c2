"""Benchmark helpers that are robust to async/relay TPU runtimes.

On the tunneled TPU backend, ``block_until_ready`` can return before the
device work is complete, and a host round-trip carries tens of ms of RPC
latency.  ``bench_fn`` therefore measures the *slope*: enqueue 1 vs 1+N
dispatches of the same jitted function and fetch one scalar of the last
result (the device executes in order, so the fetch waits for everything).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import numpy as np

__all__ = ["bench_fn", "sync", "trace"]


def sync(tree) -> None:
    """Force completion of all device work feeding ``tree``."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def bench_fn(
    f: Callable,
    args: Sequence,
    *,
    iters: int = 10,
    repeats: int = 3,
    warmup: int = 1,
) -> float:
    """Seconds per call of ``f(*args)`` (compile excluded, RPC slope-corrected)."""
    for _ in range(max(warmup, 1)):
        out = f(*args)
    sync(out)

    def run(m: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(m):
            out = f(*args)
        sync(out)
        return time.perf_counter() - t0

    t_base = min(run(1) for _ in range(repeats))
    t_full = min(run(1 + iters) for _ in range(repeats))
    return max((t_full - t_base) / iters, 1e-9)


import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (TensorBoard-compatible; the TPU analogue
    of the reference's ad-hoc @timeit CUDA-sync decorator)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
