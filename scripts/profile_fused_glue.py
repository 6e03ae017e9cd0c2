"""Time the glue of the fused multilevel path piece by piece (chip)."""
import jax
import jax.numpy as jnp

from blade.utils.compile_cache import enable as _enable_cache
_enable_cache()

from blade.attention import masks as M
from blade.attention.masks import mask_to_block_lists
from blade.kernels.pack import pack_kv
from blade.utils.profiling import bench_fn

b, h, l, d = 1, 48, 17776, 64
bh = b * h
rng = jax.random.PRNGKey(0)
k = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, l, d), jnp.bfloat16)
v = jax.random.normal(jax.random.fold_in(rng, 3), (b, h, l, d), jnp.bfloat16)
nq = nk = -(-l // 128)
cap = -(-nk // 128) * 128
scores = jax.random.uniform(jax.random.fold_in(rng, 4), (b, h, nq, nk))
levels = M.multilevel_mask(scores / scores.sum(-1, keepdims=True))
levels_bh = levels.reshape(bh, nq, nk)

lk_pad = -(-l // 128) * 128
kf = jnp.pad(k.reshape(bh, l, d), ((0, 0), (0, lk_pad - l), (0, 0)))
vf = jnp.pad(v.reshape(bh, l, d), ((0, 0), (0, lk_pad - l), (0, 0)))

def lists_old(levels_bh):
    outs = []
    for level in (1, 2, 4, 8):
        outs += list(mask_to_block_lists(levels_bh == level))
    return outs

cases = [
    ("multilevel_mask (levels gen)", jax.jit(
        lambda s: M.multilevel_mask(s / s.sum(-1, keepdims=True))), (scores,)),
    ("4x mask_to_block_lists", jax.jit(lists_old), (levels_bh,)),
    ("multilevel_lists (fast lane)", jax.jit(
        lambda s: M.multilevel_lists(s, cap=cap)), (scores,)),
    ("argsort only [48,140,139]", jax.jit(
        lambda s: jnp.argsort(-s, axis=-1, stable=True)), (scores,)),
    ("pack_kv + pyramid kernel", jax.jit(
        lambda k, v: pack_kv(k, v, lane_pack=True, pyramid=True,
                             interpret=False)), (kf, vf)),
]
for name, f, args in cases:
    t = bench_fn(f, args, iters=8)
    print(f"{name:32s} {t*1e3:7.2f} ms")
