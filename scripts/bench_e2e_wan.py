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


def run_fwd(sparse: bool):
    """Single full-DiT denoise forward at 480p (one step of the 8-step
    loop at CFG 1.0; the monolithic sampler program currently exceeds the
    remote-compile relay's tolerance, but e2e = steps x forward + O(ms)
    scheduler math, so this is the honest per-step measurement)."""
    from blade.utils.profiling import bench_fn

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    pipe = T2VPipeline.random_init(
        WAN_480P, rng, sparse=sparse, mask_mode="energy",
        with_text_encoder=False, interpret=False)
    print(f"  [init {time.perf_counter()-t0:.0f}s]", flush=True)
    embeds = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, WAN_480P.max_text_len, WAN_480P.text.d_model), jnp.bfloat16)
    lat = jax.random.normal(
        jax.random.PRNGKey(2), pipe.latent_shape(1), jnp.float32
    ).astype(pipe.dtype)
    model = pipe.model_fn()
    f = jax.jit(lambda x, e, r: model(x, jnp.full((1,), 500.0), e, r))
    t0 = time.perf_counter()
    lowered = f.lower(lat, embeds, jax.random.PRNGKey(3))
    print(f"  [lower {time.perf_counter()-t0:.0f}s]", flush=True)
    t0 = time.perf_counter()
    lowered.compile()
    print(f"  [compile {time.perf_counter()-t0:.0f}s]", flush=True)
    t = bench_fn(f, (lat, embeds, jax.random.PRNGKey(3)), iters=4)
    name = "sparse" if sparse else "dense"
    print(f"{name} fwd: {t*1e3:.1f} ms/step -> 8-step denoise ~{8*t:.2f} s")
    return t


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("fwd", "fwd-sparse", "fwd-dense"):
        ts = run_fwd(True) if which != "fwd-dense" else None
        td = run_fwd(False) if which != "fwd-sparse" else None
        if ts and td:
            print(f"per-step speedup: {td / ts:.2f}x")
    else:
        ts = run(True) if which in ("both", "sparse") else None
        td = run(False) if which in ("both", "dense") else None
        if ts and td:
            print(f"speedup: {td / ts:.2f}x")
