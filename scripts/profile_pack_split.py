"""Split packing glue: XLA pooling vs XLA concat vs Pallas pack."""
import jax
import jax.numpy as jnp

from blade.utils.compile_cache import enable as _enable_cache
_enable_cache()

from blade.attention.masks import pad_to_block_multiple
from blade.kernels.ref_attention import mean_pool_kv
from blade.kernels.pack import pack_kv
from blade.utils.profiling import bench_fn

b, h, l, d = 1, 48, 17776, 64
bh = b * h
rng = jax.random.PRNGKey(0)
k = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, l, d), jnp.bfloat16)
v = jax.random.normal(jax.random.fold_in(rng, 3), (b, h, l, d), jnp.bfloat16)

def pools_only(k, v):
    kp = pad_to_block_multiple(k, 128, axis=2)
    vp = pad_to_block_multiple(v, 128, axis=2)
    outs = []
    for lv in (2, 4, 8):
        outs += [mean_pool_kv(kp, lv), mean_pool_kv(vp, lv)]
    return outs

def pools_chained(k, v):
    kp = pad_to_block_multiple(k, 128, axis=2)
    vp = pad_to_block_multiple(v, 128, axis=2)
    outs = []
    for _ in range(3):
        kp, vp = mean_pool_kv(kp, 2), mean_pool_kv(vp, 2)
        outs += [kp, vp]
    return outs

def concat_only(k, v):
    kp = pad_to_block_multiple(k, 128, axis=2).reshape(bh, -1, d)
    vp = pad_to_block_multiple(v, 128, axis=2).reshape(bh, -1, d)
    n_kt = kp.shape[1] // 128
    return jnp.concatenate(
        [kp.reshape(bh, n_kt, 128, d), vp.reshape(bh, n_kt, 128, d)], axis=3
    ).reshape(bh, n_kt * 128, 2 * d)

def pack_only(k, v):
    kp = pad_to_block_multiple(k, 128, axis=2).reshape(bh, -1, d)
    vp = pad_to_block_multiple(v, 128, axis=2).reshape(bh, -1, d)
    return pack_kv(kp, vp, lane_pack=True, interpret=False)

t1 = bench_fn(jax.jit(pools_only), (k, v), iters=8)
t1c = bench_fn(jax.jit(pools_chained), (k, v), iters=8)
t2 = bench_fn(jax.jit(concat_only), (k, v), iters=8)
t3 = bench_fn(jax.jit(pack_only), (k, v), iters=8)
print(f"XLA pooling (direct)  {t1*1e3:7.2f} ms")
print(f"XLA pooling (chained) {t1c*1e3:7.2f} ms")
print(f"XLA lane-concat kv1   {t2*1e3:7.2f} ms")
print(f"Pallas pack kv1       {t3*1e3:7.2f} ms")
