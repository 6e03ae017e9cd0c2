"""Chip microbench: CogVideoX multilevel attention (fused vs composition vs dense).

CogVideoX inference geometry: seq 17776 (17550 video + 226 text), 48 heads,
head dim 64; eval-band levels {1:5%, 2:10%, 4:10%, 8:25%, skip:50%}.
"""
import sys

import jax
import jax.numpy as jnp

from blade.utils.compile_cache import enable as _enable_cache
_enable_cache()

from blade.attention import masks as M
from blade.kernels.block_sparse_attn import flash_attention
from blade.kernels.multilevel_attn import multilevel_attention
from blade.kernels.ref_attention import multilevel_block_attention_reference
from blade.utils.profiling import bench_fn


def main(check=False, small=False):
    # small: nk=64 keeps the level-1 band >= 2 ranks wide so the lists
    # fast lane's boosted forcing matches multilevel_mask(boosted) exactly.
    b, h, l, d = (1, 4, 8192, 64) if small else (1, 48, 17776, 64)
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 3), (b, h, l, d), jnp.bfloat16)
    nq = nk = -(-l // 128)
    scores = jax.random.uniform(jax.random.fold_in(rng, 4), (b, h, nq, nk))
    levels = M.multilevel_mask(scores / scores.sum(-1, keepdims=True))

    f_fused = jax.jit(lambda q, k, v, lv: multilevel_attention(
        q, k, v, lv, interpret=False, fused=True))
    cap = -(-nk // 128) * 128

    def fused_lists(q, k, v, sc):
        lists = M.multilevel_lists(sc, cap=cap)
        return multilevel_attention(q, k, v, None, lists=lists,
                                    interpret=False, fused=True)

    f_lists = jax.jit(fused_lists)

    def fused_lists_256(q, k, v, sc):
        if sc.shape[-2] % 2:
            sc = jnp.pad(sc, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
        sc = sc.reshape(*sc.shape[:-2], -1, 2, sc.shape[-1]).mean(-2)
        lists = M.multilevel_lists(sc, cap=cap)
        return multilevel_attention(q, k, v, None, lists=lists,
                                    interpret=False, fused=True, q_rows=256)

    f_lists256 = jax.jit(fused_lists_256)
    f_comp = jax.jit(lambda q, k, v, lv: multilevel_attention(
        q, k, v, lv, interpret=False, fused=False))
    f_dense = jax.jit(lambda q, k, v: flash_attention(q, k, v, interpret=False)[0])

    if check:
        of, lf = f_fused(q, k, v, levels)
        oc, lc = f_comp(q, k, v, levels)
        of, lf, oc, lc = map(lambda t: jnp.asarray(t, jnp.float32), (of, lf, oc, lc))
        print("fused vs comp: out maxerr",
              float(jnp.abs(of - oc).max()), "lse maxerr",
              float(jnp.abs(lf - lc).max()))
        # lists fast lane vs the SAME levels built from boosted scores
        boosted = scores.at[..., -2:].set(
            scores.max(-1, keepdims=True) + 1.0)
        lv_b = M.multilevel_mask(boosted)
        ol, ll = f_lists(q, k, v, scores)
        ob, lb = f_fused(q, k, v, lv_b)
        ol, ll, ob, lb = map(lambda t: jnp.asarray(t, jnp.float32), (ol, ll, ob, lb))
        print("lists vs boosted-levels: out maxerr",
              float(jnp.abs(ol - ob).max()), "lse maxerr",
              float(jnp.abs(ll - lb).max()))
        # q_rows=256 vs the row-duplicated 128-row mask (exact contract)
        sc2 = scores
        if sc2.shape[-2] % 2:
            sc2 = jnp.pad(sc2, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
        sc2 = sc2.reshape(*sc2.shape[:-2], -1, 2, sc2.shape[-1]).mean(-2)
        lv256 = M.multilevel_mask(sc2)
        lv_dup = jnp.repeat(lv256, 2, axis=-2)[..., :nq, :]
        o6, l6 = jax.jit(lambda q, k, v, lv: multilevel_attention(
            q, k, v, lv, interpret=False, fused=True, q_rows=256))(
                q, k, v, lv256)
        od, ld = f_fused(q, k, v, lv_dup)
        o6, l6, od, ld = map(lambda t: jnp.asarray(t, jnp.float32), (o6, l6, od, ld))
        print("q256 vs row-dup levels: out maxerr",
              float(jnp.abs(o6 - od).max()), "lse maxerr",
              float(jnp.abs(l6 - ld).max()))
        if small:
            ro, rl = multilevel_block_attention_reference(q, k, v, levels)
            print("fused vs ref:  out maxerr",
                  float(jnp.abs(of - jnp.asarray(ro, jnp.float32)).max()),
                  "lse maxerr", float(jnp.abs(lf - rl).max()))
        return

    t_fused = bench_fn(lambda q, k, v, lv: f_fused(q, k, v, lv)[0],
                       (q, k, v, levels), iters=8)
    t_lists = bench_fn(lambda q, k, v, sc: f_lists(q, k, v, sc)[0],
                       (q, k, v, scores), iters=8)
    t_l256 = bench_fn(lambda q, k, v, sc: f_lists256(q, k, v, sc)[0],
                      (q, k, v, scores), iters=8)
    t_comp = bench_fn(lambda q, k, v, lv: f_comp(q, k, v, lv)[0],
                      (q, k, v, levels), iters=8)
    t_dense = bench_fn(f_dense, (q, k, v), iters=4)
    print(f"dense        {t_dense*1e3:8.2f} ms")
    print(f"composition  {t_comp*1e3:8.2f} ms  ({t_dense/t_comp:.2f}x)")
    print(f"fused+levels {t_fused*1e3:8.2f} ms  ({t_dense/t_fused:.2f}x)")
    print(f"fused+lists  {t_lists*1e3:8.2f} ms  ({t_dense/t_lists:.2f}x)")
    print(f"fused+l q256 {t_l256*1e3:8.2f} ms  ({t_dense/t_l256:.2f}x)")


if __name__ == "__main__":
    main(check="--check" in sys.argv, small="--small" in sys.argv)
