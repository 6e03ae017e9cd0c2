"""Time the XLA glue of the fused path (lists + packing, no kernel)."""
import jax
import jax.numpy as jnp

from blade.utils.compile_cache import enable as _enable_cache
_enable_cache()

from blade.attention import masks as M
from blade.attention.masks import mask_to_block_lists, pad_to_block_multiple
from blade.kernels.ref_attention import mean_pool_kv
from blade.utils.profiling import bench_fn

b, h, l, d = 1, 48, 17776, 64
bh = b * h
rng = jax.random.PRNGKey(0)
k = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, l, d), jnp.bfloat16)
v = jax.random.normal(jax.random.fold_in(rng, 3), (b, h, l, d), jnp.bfloat16)
nq = nk = -(-l // 128)
scores = jax.random.uniform(jax.random.fold_in(rng, 4), (b, h, nq, nk))
levels = M.multilevel_mask(scores / scores.sum(-1, keepdims=True))
levels_bh = levels.reshape(bh, nq, nk)

def lists_only(levels_bh):
    outs = []
    for level in (1, 2, 4, 8):
        idx_l, cnt_l = mask_to_block_lists(levels_bh == level)
        outs += [idx_l, cnt_l]
    return outs

def pack_only(k, v):
    kp_full = pad_to_block_multiple(k, 128, axis=2)
    vp_full = pad_to_block_multiple(v, 128, axis=2)
    n_kt = kp_full.shape[2] // 128
    def lane_pack(kx, vx, sr):
        return jnp.concatenate(
            [kx.reshape(bh, n_kt, sr, d), vx.reshape(bh, n_kt, sr, d)], axis=3
        ).reshape(bh, n_kt * sr, 2 * d)
    kv1 = lane_pack(kp_full.reshape(bh, -1, d), vp_full.reshape(bh, -1, d), 128)
    pools = []
    for level in (2, 4, 8):
        pools.append(lane_pack(
            mean_pool_kv(kp_full, level).reshape(bh, -1, d),
            mean_pool_kv(vp_full, level).reshape(bh, -1, d), 128 // level))
    return [kv1, jnp.concatenate(pools, axis=1)]

def mask_gen(scores):
    return M.multilevel_mask(scores / scores.sum(-1, keepdims=True))

t_lists = bench_fn(jax.jit(lists_only), (levels_bh,), iters=8)
t_pack = bench_fn(jax.jit(pack_only), (k, v), iters=8)
t_mask = bench_fn(jax.jit(mask_gen), (scores,), iters=8)
print(f"4x mask_to_block_lists {t_lists*1e3:7.2f} ms")
print(f"kv1+pyramid packing    {t_pack*1e3:7.2f} ms")
print(f"multilevel_mask gen    {t_mask*1e3:7.2f} ms")
