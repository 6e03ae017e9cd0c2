"""Chip e2e: 8-step Wan-1.3B 480p denoise loop, sparse ASA vs dense.

Full 30-layer DiT (random weights — timing only), bf16, one chip.
Wall-clock with device_get sync (seconds-scale runs; the relay's
block_until_ready jitter is negligible here).  First call per pipeline
compiles (8-12 min cold, cached afterwards).
"""
import sys
import time

import jax
import jax.numpy as jnp

from blade.utils.compile_cache import enable as _enable_cache
_enable_cache()

from blade.config import WAN_480P
from blade.sampling.t2v import T2VPipeline


def run(sparse: bool, steps: int = 8):
    rng = jax.random.PRNGKey(0)
    pipe = T2VPipeline.random_init(
        WAN_480P, rng, sparse=sparse, mask_mode="energy",
        with_text_encoder=False, interpret=False)
    embeds = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, WAN_480P.max_text_len, WAN_480P.text.d_model), jnp.bfloat16)

    f = jax.jit(lambda e, r: pipe.sample_latents(e, rng=r, num_steps=steps))
    t0 = time.perf_counter()
    jax.device_get(f(embeds, jax.random.PRNGKey(2)))
    t_compile = time.perf_counter() - t0
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        jax.device_get(f(embeds, jax.random.PRNGKey(3 + i)))
        times.append(time.perf_counter() - t0)
    name = "sparse" if sparse else "dense"
    print(f"{name}: {min(times):.2f} s / {steps} steps "
          f"(runs {[f'{t:.2f}' for t in times]}, first+compile {t_compile:.1f} s)")
    return min(times)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    ts = run(True) if which in ("both", "sparse") else None
    td = run(False) if which in ("both", "dense") else None
    if ts and td:
        print(f"speedup: {td / ts:.2f}x")
