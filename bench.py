"""Benchmark: ASA sparse attention vs dense flash at Wan inference geometry.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline anchor: the reference's multi-level Triton kernel claims "2-3x on
long sequences" over dense (Triton/README.md:92); we report our measured
end-to-end ASA attention speedup at the same sequence/density regime and
normalize vs_baseline against the midpoint claim (2.5x).

Runs on one real TPU chip.  Timing uses dispatch-slope measurement (the
tunneled runtime's block_until_ready is unreliable; see
blade/utils/profiling.py).
"""

import json
import sys

import jax
import jax.numpy as jnp


BASELINE_SPEEDUP = 2.5  # reference Triton multi-level kernel claim midpoint


def main():
    from blade.attention import masks as M
    from blade.kernels.block_sparse_attn import block_sparse_attention, flash_attention
    from blade.kernels.multilevel_attn import multilevel_attention
    from blade.utils.profiling import bench_fn

    # Wan2.1-1.3B inference geometry: 81f 480x832 -> 32760 tokens, 12 heads.
    b, h, l, d = 1, 12, 32760, 128
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, l, d), jnp.bfloat16)
    nq = nk = -(-l // 128)

    # Training-path mask: energy mode densities (5-20% + forced last-2).
    mask = jax.random.uniform(jax.random.PRNGKey(3), (b, h, nq, nk)) < 0.143
    mask = mask.at[..., -2:].set(True).at[..., -2:, :].set(True)
    # Inference-path multi-level mask at reference band ratios.
    scores = jax.random.uniform(jax.random.PRNGKey(4), (b, h, nq, nk))
    levels = M.multilevel_mask(scores / scores.sum(-1, keepdims=True))

    f_dense = jax.jit(lambda q, k, v: flash_attention(q, k, v, interpret=False)[0])
    f_sparse = jax.jit(
        lambda q, k, v, m: block_sparse_attention(q, k, v, m, interpret=False)[0]
    )
    f_ml = jax.jit(
        lambda q, k, v, lv: multilevel_attention(q, k, v, lv, interpret=False)[0]
    )

    t_dense = bench_fn(f_dense, (q, k, v), iters=4)
    t_sparse = bench_fn(f_sparse, (q, k, v, mask), iters=8)
    try:
        t_ml = bench_fn(f_ml, (q, k, v, levels), iters=8)
    except Exception:
        t_ml = None

    # Training path: fwd+bwd through the custom VJP.
    def loss_sparse(q, k, v):
        o, _ = block_sparse_attention(q, k, v, mask, interpret=False)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_dense(q, k, v):
        o, _ = flash_attention(q, k, v, interpret=False)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_sparse = jax.jit(jax.grad(loss_sparse, argnums=(0, 1, 2)))
    g_dense = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))
    try:
        t_bwd_sparse = bench_fn(g_sparse, (q, k, v), iters=4)
        t_bwd_dense = bench_fn(g_dense, (q, k, v), iters=2)
    except Exception:
        t_bwd_sparse = t_bwd_dense = None

    speedup = t_dense / t_sparse
    flops = 4.0 * b * h * l * l * d
    result = {
        "metric": "asa_block_sparse_attention_speedup_vs_dense_wan480p",
        "value": round(speedup, 3),
        "unit": "x (seq=32760, h=12, d=128, density~0.16, bf16, v5e chip)",
        "vs_baseline": round(speedup / BASELINE_SPEEDUP, 3),
        "extra": {
            "dense_ms": round(t_dense * 1e3, 2),
            "sparse_ms": round(t_sparse * 1e3, 2),
            "dense_tflops": round(flops / t_dense / 1e12, 1),
            "sparse_effective_tflops": round(flops / t_sparse / 1e12, 1),
            **({
                "multilevel_ms": round(t_ml * 1e3, 2),
                "multilevel_speedup": round(t_dense / t_ml, 3),
            } if t_ml else {}),
            **({
                "train_fwd_bwd_sparse_ms": round(t_bwd_sparse * 1e3, 2),
                "train_fwd_bwd_dense_ms": round(t_bwd_dense * 1e3, 2),
                "train_fwd_bwd_speedup": round(t_bwd_dense / t_bwd_sparse, 3),
            } if t_bwd_sparse else {}),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
