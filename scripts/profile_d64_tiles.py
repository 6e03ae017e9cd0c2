"""Tile sweep for the dense flash kernel at CogVideoX d=64 geometry
(VERDICT r3 #5, second half: is ~64 TF/s a tile-tuning gap?).

Sweeps (q_tile, kv_tile) by monkeypatching the module tile preferences
(the picker reads them at call time) and times the kernel at
[1, 48, 17776, 64] bf16.

Run from the repo root: python scripts/profile_d64_tiles.py
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from blade.utils.compile_cache import enable

enable()

from blade.kernels import block_sparse_attn as B  # noqa: E402
from blade.utils.profiling import bench_fn  # noqa: E402


def main():
    rng = jax.random.PRNGKey(0)
    b, h, l, d = 1, 48, 17776, 64
    q = jax.random.normal(rng, (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d

    out = {}
    for qt in (256, 512, 1024):
        for kt in (2048, 4096, 8192):
            B.DENSE_Q_TILE, B.DENSE_KV_TILE = qt, kt
            try:
                f = jax.jit(lambda q, k, v: B.flash_attention(
                    q, k, v, interpret=False)[0])
                t = bench_fn(f, (q, k, v), iters=4)
                out[f"q{qt}_kv{kt}_tfs"] = round(flops / t / 1e12, 1)
            except Exception as e:
                out[f"q{qt}_kv{kt}_tfs"] = f"{type(e).__name__}"[:40]
            print(json.dumps(out), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
