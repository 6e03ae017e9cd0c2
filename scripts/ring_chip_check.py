"""Prove the ring-attention program LOWERS for the TPU chip (VERDICT r4
#5): single-device `sp` mesh on the real chip, block-sparse Pallas inner
composed through shard_map + ppermute + scan, compiled AND executed, and
checked against the masked dense reference computed on host.

Multi-chip hardware is not available here (one tunneled v5e chip); the
sp=8 exactness path runs on the 8-virtual-device CPU mesh in
tests/test_ring_attention.py.  What a single-chip run uniquely proves is
that the composed program — shard_map(scan(ppermute + pallas
block-sparse kernel + f32 LSE merge)) — compiles through the Mosaic
pipeline and produces exact numbers on TPU, i.e. the kernel composes
under shard_map (GSPMD cannot partition a pallas_call, so manual
sharding is the only lane that works multi-chip).

Usage: python scripts/ring_chip_check.py   (on the chip; ~1 min)
Prints one JSON line with max|err| vs reference and the ring time.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, ".")
from blade.utils.compile_cache import enable

enable()

from blade.kernels.ref_attention import block_masked_attention
from blade.parallel.ring_attention import ring_flash_attention
from blade.utils.profiling import bench_fn


def main():
    dev = jax.devices()[0]
    assert dev.platform != "cpu", "run on the chip"
    mesh = Mesh(np.array([dev]), ("sp",))

    # Geometry sized so the masked dense REFERENCE stays tractable on the
    # 1-core host CPU (~1 min); the lowering proof is shape-generic.
    b, h, l, d = 1, 4, 4096, 128
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b, h, l, d),
                          jnp.bfloat16)
        for i in range(3)
    )
    nq = nk = l // 128
    mask = jax.random.uniform(jax.random.fold_in(key, 3), (b, h, nq, nk)) < 0.15
    mask = mask.at[..., -2:].set(True)

    f = jax.jit(lambda q, k, v, m: ring_flash_attention(
        q, k, v, mesh=mesh, block_mask=m))
    t0 = time.monotonic()
    out, lse = f(q, k, v, mask)
    out, lse = jax.device_get((out, lse))
    t_compile = time.monotonic() - t0

    with jax.default_device(jax.devices("cpu")[0]):
        ref, rlse = jax.jit(block_masked_attention)(
            jax.device_get(q), jax.device_get(k), jax.device_get(v),
            jax.device_get(mask))
    err = float(np.max(np.abs(out.astype(np.float32)
                              - np.asarray(ref, np.float32))))
    lerr = float(np.max(np.abs(lse - np.asarray(rlse))))
    t = bench_fn(f, (q, k, v, mask), iters=4)
    ok = err < 0.02 and lerr < 1e-2  # bf16 inner vs f32 reference
    print(json.dumps({
        "ring_chip_ok": ok,
        "max_abs_err": round(err, 5),
        "max_lse_err": round(lerr, 5),
        "ring_ms": round(t * 1e3, 2),
        "compile_s": round(t_compile, 1),
        "geometry": f"b{b} h{h} l{l} d{d} density~0.16 sp-mesh(1) on "
                    f"{dev.platform}",
    }), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
