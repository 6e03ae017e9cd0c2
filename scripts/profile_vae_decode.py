"""Chip microbench: Wan VAE streamed decode — where do 97.5 s go?

Times one steady-state chunk (jitted decode_with_cache), then traces it
for an op-level breakdown.  Run: PYTHONPATH=... python scripts/profile_vae_decode.py
"""
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp

from blade.utils.compile_cache import enable as _enable_cache
_enable_cache()

from blade.config import WAN_480P
from blade.models.vae_wan import WanVAE
from blade.utils.profiling import bench_fn


def main(trace=False):
    p = WAN_480P
    vae = WanVAE(p.vae)
    rng = jax.random.PRNGKey(0)
    t_lat, h_lat, w_lat = 21, p.video.height // p.vae.spatial_factor, \
        p.video.width // p.vae.spatial_factor
    print("latent grid", t_lat, h_lat, w_lat, flush=True)
    z_small = jnp.zeros((1, 1, 8, 8, p.vae.latent_channels), jnp.float32)
    params = vae.init(rng, z_small, method=vae.decode)
    z = jax.random.normal(rng, (1, 1, h_lat, w_lat, p.vae.latent_channels),
                          jnp.float32)

    decode1 = jax.jit(
        lambda pp, zz, c: vae.apply(pp, zz, c, method=vae.decode_with_cache))
    t0 = time.perf_counter()
    piece, cache = decode1(params, z, None)
    jax.device_get(piece[..., 0, 0, 0])
    print(f"first chunk compile+run {time.perf_counter()-t0:.1f}s",
          piece.shape, flush=True)
    t0 = time.perf_counter()
    piece2, cache2 = decode1(params, z, cache)
    jax.device_get(piece2[..., 0, 0, 0])
    print(f"steady chunk compile+run {time.perf_counter()-t0:.1f}s", flush=True)

    t = bench_fn(lambda pp, zz, c: decode1(pp, zz, c)[0], (params, z, cache),
                 iters=4)
    print(f"steady chunk: {t*1e3:.1f} ms -> 21 chunks ~{21*t:.1f}s", flush=True)

    if trace:
        logdir = "/tmp/vaetrace"
        os.system(f"rm -rf {logdir}")
        jax.profiler.start_trace(logdir)
        piece2, _ = decode1(params, z, cache)
        jax.device_get(piece2[..., 0, 0, 0])
        jax.profiler.stop_trace()
        for f in glob.glob(f"{logdir}/**/*", recursive=True):
            if os.path.isfile(f):
                print(" ", f, os.path.getsize(f))


if __name__ == "__main__":
    main(trace="--trace" in sys.argv)
