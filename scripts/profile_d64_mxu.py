"""Settle the cog d=64 dense question (VERDICT r3 #5): is ~60 TF/s a
structural MXU ceiling for 64-deep contractions, or a tile-tuning gap?

Measures, on the real chip:
  1. bare batched matmul TF/s at contraction depth 64 vs 128 (the MXU's
     systolic depth is 128; a 64-deep pass loads half the array),
  2. the same with the d=64 operands zero-padded to 128 (same useful
     FLOPs, full-depth passes — isolates pure depth utilization from
     bandwidth),
  3. the flash kernel at cog geometry d=64 vs wan d=128,
  4. flash at d=64 with q/k/v zero-padded to d=128 (the "head-packing"
     alternative is impossible for QK^T — lane-concatenating two heads
     SUMS their score matrices since lanes are the contraction axis — so
     padding is the only way to feed full-depth passes, at 2x nominal
     FLOPs).

Run: python scripts/profile_d64_mxu.py
"""

import json

import jax
import jax.numpy as jnp

from blade.utils.compile_cache import enable

enable()

from blade.kernels.block_sparse_attn import flash_attention  # noqa: E402
from blade.utils.profiling import bench_fn  # noqa: E402


def main():
    rng = jax.random.PRNGKey(0)
    out = {}

    # --- bare matmuls: [BH, L, d] @ [BH, d, L] ---
    bh, l = 8, 4096
    for d in (64, 128):
        a = jax.random.normal(rng, (bh, l, d), jnp.bfloat16)
        b = jax.random.normal(rng, (bh, d, l), jnp.bfloat16)
        f = jax.jit(lambda a, b: jnp.einsum(
            "bld,bdm->blm", a, b, preferred_element_type=jnp.float32))
        t = bench_fn(f, (a, b), iters=8)
        tf = 2 * bh * l * l * d / t / 1e12
        out[f"matmul_depth{d}_tfs"] = round(tf, 1)

    # depth-64 operands zero-padded to 128: same useful FLOPs, 2x nominal
    a64 = jax.random.normal(rng, (bh, l, 64), jnp.bfloat16)
    b64 = jax.random.normal(rng, (bh, 64, l), jnp.bfloat16)
    ap = jnp.pad(a64, ((0, 0), (0, 0), (0, 64)))
    bp = jnp.pad(b64, ((0, 0), (0, 64), (0, 0)))
    f = jax.jit(lambda a, b: jnp.einsum(
        "bld,bdm->blm", a, b, preferred_element_type=jnp.float32))
    t = bench_fn(f, (ap, bp), iters=8)
    out["matmul_depth64_padded128_useful_tfs"] = round(
        2 * bh * l * l * 64 / t / 1e12, 1)

    # --- flash attention at both geometries ---
    cases = {
        "cog_d64": (1, 48, 17776, 64),
        "wan_d128": (1, 12, 32760, 128),
    }
    for name, (b, h, sl, d) in cases.items():
        q = jax.random.normal(rng, (b, h, sl, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, sl, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, sl, d),
                              jnp.bfloat16)
        f = jax.jit(lambda q, k, v: flash_attention(q, k, v,
                                                    interpret=False)[0])
        t = bench_fn(f, (q, k, v), iters=4)
        tf = 4 * b * h * sl * sl * d / t / 1e12
        out[f"flash_{name}_ms"] = round(t * 1e3, 2)
        out[f"flash_{name}_tfs"] = round(tf, 1)

    # flash at cog geometry with head dim zero-padded to 128
    b, h, sl, d = 1, 48, 17776, 64
    q = jax.random.normal(rng, (b, h, sl, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, sl, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, sl, d), jnp.bfloat16)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 64)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 64)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, 64)))
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v, interpret=False)[0])
    t = bench_fn(f, (qp, kp, vp), iters=4)
    out["flash_cog_d64_padded128_ms"] = round(t * 1e3, 2)
    out["flash_cog_d64_padded128_useful_tfs"] = round(
        4 * b * h * sl * sl * 64 / t / 1e12, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
