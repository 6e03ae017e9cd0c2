"""Native (C) runtime components with lazy build + pure-Python fallbacks.

``blade_native.c`` provides:
  * a packed prompt-embedding store with a background prefetch thread
    (the data-free TDM data loader),
  * native gilbert-curve generation for large latent grids.

The shared object is built on first use with the system C compiler; every
entry point degrades gracefully to a Python implementation when the
toolchain or the .so is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "blade_native.c")
_SO = os.path.join(_HERE, "blade_native.so")
_lib = None
_lock = threading.Lock()


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run(
                        [cc, "-O2", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO],
                        check=True, capture_output=True, timeout=120,
                    )
                    break
                except Exception:
                    continue
            else:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.embed_store_open.restype = ctypes.c_void_p
        lib.embed_store_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.embed_store_len.restype = ctypes.c_int64
        lib.embed_store_len.argtypes = [ctypes.c_void_p]
        lib.embed_store_get.restype = ctypes.c_int
        lib.embed_store_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p]
        lib.embed_store_prefetch.argtypes = [ctypes.c_void_p,
                                             ctypes.POINTER(ctypes.c_int64),
                                             ctypes.c_int]
        lib.embed_store_close.argtypes = [ctypes.c_void_p]
        lib.gilbert3d_fill.restype = ctypes.c_int
        lib.gilbert3d_fill.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# Gilbert curve
# ---------------------------------------------------------------------------


def gilbert3d_flat(width: int, height: int, depth: int) -> Optional[np.ndarray]:
    """Curve-order flat coordinates via the native generator (None if the
    native library is unavailable; callers fall back to the Python curve)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(width * height * depth, np.int32)
    rc = lib.gilbert3d_fill(
        width, height, depth, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    return out if rc == 0 else None


# ---------------------------------------------------------------------------
# Embedding store
# ---------------------------------------------------------------------------


def pack_embeddings(npy_dir: str, out_path: str) -> dict:
    """Pack ``<npy_dir>/{i}.npy`` per-prompt embeddings into one binary
    record file + sidecar meta (all records must share one shape/dtype)."""
    import json

    files = sorted(
        (f for f in os.listdir(npy_dir) if f.endswith(".npy")),
        key=lambda f: int(os.path.splitext(f)[0]),
    )
    first = np.load(os.path.join(npy_dir, files[0]))
    meta = {
        "shape": list(first.shape),
        "dtype": str(first.dtype),
        "count": len(files),
    }
    with open(out_path, "wb") as out:
        for f in files:
            arr = np.ascontiguousarray(np.load(os.path.join(npy_dir, f)))
            assert arr.shape == first.shape and arr.dtype == first.dtype, f
            out.write(arr.tobytes())
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f)
    return meta


class EmbedStore:
    """Random-access packed embedding reader with background prefetch.

    Uses the native store when available; otherwise a numpy memmap."""

    def __init__(self, path: str):
        import json

        with open(path + ".json") as f:
            self.meta = json.load(f)
        self.shape = tuple(self.meta["shape"])
        self.dtype = np.dtype(self.meta["dtype"])
        self.record_bytes = int(np.prod(self.shape)) * self.dtype.itemsize
        self._lib = _load()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.embed_store_open(
                path.encode(), self.record_bytes
            )
        if self._handle:
            self._n = self._lib.embed_store_len(self._handle)
        else:
            self._mm = np.memmap(path, dtype=self.dtype, mode="r").reshape(
                (-1,) + self.shape
            )
            self._n = self._mm.shape[0]

    def __len__(self):
        return int(self._n)

    def get(self, idx: int) -> np.ndarray:
        if self._handle:
            out = np.empty(self.shape, self.dtype)
            rc = self._lib.embed_store_get(
                self._handle, idx, out.ctypes.data_as(ctypes.c_void_p)
            )
            if rc != 0:
                raise IndexError(idx)
            return out
        return np.array(self._mm[idx])

    def prefetch(self, indices: Sequence[int]) -> None:
        if self._handle:
            arr = (ctypes.c_int64 * len(indices))(*indices)
            self._lib.embed_store_prefetch(self._handle, arr, len(indices))

    def close(self):
        if self._handle:
            self._lib.embed_store_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
