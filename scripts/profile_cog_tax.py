"""Chip microbench: decompose the cog multilevel FULL-path tax.

BENCH_r02 driver: cog full path 39.8 ms vs fused kernel ~29-30 ms — where do
the ~10 ms go?  Times each stage of adaptive_sparse_attention's fused lane
in isolation (all jitted separately; shared compile cache):

  1. sample_block_tokens gathers (q_s, k_s)
  2. predictor flash passes (sum predictor, one-hot pooling V, chunked by d)
  3. predict_block_scores end-to-end (1+2 + mean reshape)
  4. _coarsen_scores + multilevel_lists glue
  5. fused kernel alone (precomputed lists)
  6. full adaptive_sparse_attention

Run: python scripts/profile_cog_tax.py
"""
import dataclasses

import jax
import jax.numpy as jnp

from blade.utils.compile_cache import enable as _enable_cache
_enable_cache()

from blade.attention import masks as M
from blade.attention.asa import (
    COGVIDEOX_ASA, _coarsen_scores, adaptive_sparse_attention,
    predict_block_scores)
from blade.kernels.block_sparse_attn import flash_attention
from blade.kernels.multilevel_attn import KV_BLOCK, multilevel_attention
from blade.utils.profiling import bench_fn


def main():
    b, h, l, d = 1, 48, 17776, 64
    cfg = dataclasses.replace(
        COGVIDEOX_ASA, pre_arranged=True, mask_mode="multilevel",
        predictor="sum", sample_tokens_per_block=16, multilevel_q_rows=256)
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 3), (b, h, l, d), jnp.bfloat16)

    # 1. sampling gathers
    def sample_only(r, q, k):
        rq, rk = jax.random.split(r)
        qp = M.pad_to_block_multiple(q, cfg.block_size)
        kp = M.pad_to_block_multiple(k, cfg.block_size)
        q_s = M.sample_block_tokens(rq, qp, cfg.block_size,
                                    cfg.sample_tokens_per_block)
        k_s = M.sample_block_tokens(rk, kp, cfg.block_size,
                                    cfg.sample_tokens_per_block)
        return q_s, k_s

    f_sample = jax.jit(sample_only)
    q_s, k_s = f_sample(rng, q, k)
    t_sample = bench_fn(lambda r, q, k: f_sample(r, q, k)[0], (rng, q, k),
                        iters=8)

    # 2. predictor flash passes on pre-sampled tokens (isolates the matmul
    #    work from the gathers)
    nq = nk = -(-l // cfg.block_size)
    tokens = cfg.sample_tokens_per_block
    scale = 1.0 / (d ** 0.5)

    def pred_core(q_s, k_s):
        bb, hh, ls, dd = k_s.shape
        outs = []
        for c0 in range(0, nk, dd):
            w = min(dd, nk - c0)
            pool = jax.nn.one_hot(
                jnp.arange(ls) // tokens - c0, dd, dtype=k_s.dtype)
            pool = jnp.broadcast_to(pool, (bb, hh, ls, dd))
            o, _ = flash_attention(q_s, k_s, pool, scale=scale)
            outs.append(o[..., :w])
        out = jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]
        return out.reshape(bb, hh, nq, tokens, nk).mean(3).astype(jnp.float32)

    f_core = jax.jit(pred_core)
    t_core = bench_fn(f_core, (q_s, k_s), iters=8)

    # single flash pass (chunk 0 only) for scaling reference
    def one_pass(q_s, k_s):
        bb, hh, ls, dd = k_s.shape
        pool = jnp.broadcast_to(
            jax.nn.one_hot(jnp.arange(ls) // tokens, dd, dtype=k_s.dtype),
            (bb, hh, ls, dd))
        return flash_attention(q_s, k_s, pool, scale=scale)[0]

    t_one = bench_fn(jax.jit(one_pass), (q_s, k_s), iters=8)

    # 3. predictor end-to-end
    f_pred = jax.jit(lambda r, q, k: predict_block_scores(r, q, k, cfg))
    scores = f_pred(rng, q, k)
    t_pred = bench_fn(f_pred, (rng, q, k), iters=8)

    # 4. lists glue from precomputed scores
    n_kt = -(-l // KV_BLOCK)
    cap = -(-n_kt // 128) * 128

    def glue(sc):
        return M.multilevel_lists(_coarsen_scores(sc, cfg),
                                  cfg.mask_ratios, cap=cap)

    f_glue = jax.jit(glue)
    lists = f_glue(scores)
    t_glue = bench_fn(lambda sc: f_glue(sc)[0], (scores,), iters=8)

    # 5. fused kernel alone
    f_kern = jax.jit(lambda q, k, v, ls: multilevel_attention(
        q, k, v, None, lists=ls, interpret=False,
        q_rows=cfg.multilevel_q_rows)[0])
    t_kern = bench_fn(f_kern, (q, k, v, lists), iters=8)

    # 6. full path
    f_full = jax.jit(lambda r, q, k, v: adaptive_sparse_attention(
        r, q, k, v, cfg)[0])
    t_full = bench_fn(f_full, (rng, q, k, v), iters=8)

    # dense anchor
    f_dense = jax.jit(lambda q, k, v: flash_attention(q, k, v,
                                                      interpret=False)[0])
    t_dense = bench_fn(f_dense, (q, k, v), iters=4)

    print(f"sample gathers     {t_sample*1e3:8.2f} ms")
    print(f"pred flash x3      {t_core*1e3:8.2f} ms   (one pass {t_one*1e3:.2f})")
    print(f"predictor e2e      {t_pred*1e3:8.2f} ms")
    print(f"coarsen+lists glue {t_glue*1e3:8.2f} ms")
    print(f"fused kernel       {t_kern*1e3:8.2f} ms")
    print(f"full path          {t_full*1e3:8.2f} ms")
    print(f"dense              {t_dense*1e3:8.2f} ms   "
          f"(full speedup {t_dense/t_full:.2f}x)")
    print(f"sum of stages      {(t_pred+t_glue+t_kern)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
