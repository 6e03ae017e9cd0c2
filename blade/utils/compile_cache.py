"""Persistent XLA compilation cache (VERDICT r1 #10: the 8-12 min
full-pipeline compiles tax every bench/eval iteration; second runs should
hit a disk cache).

Verified to work through the tunneled "axon" TPU plugin: executables
serialize/deserialize across processes (a full-geometry flash-attention
config reloads in ~0.1 s vs its first compile).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/blade_jax_cache")
_enabled = False


def enable(cache_dir: str | None = None, min_compile_secs: float = 5.0):
    """Idempotently point JAX's persistent compilation cache at a local dir.

    Safe to call before or after backend initialization (the cache configs
    are not backend-pinned).  Respects ``BLADE_COMPILE_CACHE`` (path) and
    ``BLADE_COMPILE_CACHE=0`` / ``off`` to disable.
    """
    global _enabled
    if _enabled:
        return
    env = os.environ.get("BLADE_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "disable"):
        return
    path = cache_dir or (env if env else _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    _enabled = True
