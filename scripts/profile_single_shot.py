"""Chip microbench: fused multilevel kernel, single-shot merged tile vs
per-level loops, at CogVideoX eval geometry (seq 17776, 48 heads, d=64).

The single-shot lane folds level-1 group 0 and all pooled levels into one
MXU tile per mask row (see multilevel_attn.py), killing the per-iteration
loop overhead that dominates after the 256-row mask change.
"""
import jax
import jax.numpy as jnp

from blade.utils.compile_cache import enable as _enable_cache
_enable_cache()

from blade.attention import masks as M
from blade.attention.asa import _fused_lane_params
from blade.kernels.multilevel_attn import multilevel_attention
from blade.utils.profiling import bench_fn


def main():
    b, h, l, d = 1, 48, 17776, 64
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 3), (b, h, l, d), jnp.bfloat16)
    nq = nk = -(-l // 128)
    scores = jax.random.uniform(jax.random.fold_in(rng, 4), (b, h, nq, nk))

    # The production lane's geometry — single source, keeps the microbench
    # measuring the configuration that actually ships.
    cap, tiles, single_shot_ok = _fused_lane_params(l)
    assert single_shot_ok, "single-shot guarantee must hold at cog geometry"
    print("tiles:", tiles)

    def run(q, k, v, sc, single_shot):
        if sc.shape[-2] % 2:
            sc = jnp.pad(sc, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
        sc = sc.reshape(*sc.shape[:-2], -1, 2, sc.shape[-1]).mean(-2)
        lists = M.multilevel_lists(sc, cap=cap)
        return multilevel_attention(
            q, k, v, None, lists=lists, interpret=False, fused=True,
            q_rows=256, pooled_tiles=tiles,
            pooled_single_shot=single_shot)[0]

    f_loop = jax.jit(lambda q, k, v, sc: run(q, k, v, sc, False))
    f_ss = jax.jit(lambda q, k, v, sc: run(q, k, v, sc, True))

    o_l = jax.device_get(f_loop(q, k, v, scores))
    o_s = jax.device_get(f_ss(q, k, v, scores))
    import numpy as np
    err = np.max(np.abs(o_l.astype(np.float32) - o_s.astype(np.float32)))
    print("max |loop - single_shot| =", err)

    t_loop = bench_fn(f_loop, (q, k, v, scores), iters=8)
    t_ss = bench_fn(f_ss, (q, k, v, scores), iters=8)
    print(f"looped     : {t_loop*1e3:8.2f} ms")
    print(f"single-shot: {t_ss*1e3:8.2f} ms  ({t_loop/t_ss:.3f}x)")


if __name__ == "__main__":
    main()
