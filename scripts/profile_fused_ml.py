"""Attribution: time the fused multilevel kernel with single-level masks."""
import jax
import jax.numpy as jnp

from blade.utils.compile_cache import enable as _enable_cache
_enable_cache()

from blade.attention import masks as M
from blade.kernels.multilevel_attn import multilevel_attention
from blade.utils.profiling import bench_fn

b, h, l, d = 1, 48, 17776, 64
rng = jax.random.PRNGKey(0)
q = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, l, d), jnp.bfloat16)
k = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, l, d), jnp.bfloat16)
v = jax.random.normal(jax.random.fold_in(rng, 3), (b, h, l, d), jnp.bfloat16)
nq = nk = -(-l // 128)
scores = jax.random.uniform(jax.random.fold_in(rng, 4), (b, h, nq, nk))

f = jax.jit(lambda q, k, v, lv: multilevel_attention(
    q, k, v, lv, interpret=False, fused=True)[0])

def band_mask(level, frac):
    """Top-frac of each row at `level`, rest 0."""
    ratios = {level: (0.0, frac), 0: (frac, 1.0)}
    return M.multilevel_mask(scores / scores.sum(-1, keepdims=True),
                             mask_ratios=ratios, force_last2=False)

cases = [
    ("empty (pure step overhead + pyramid)", band_mask(1, 0.0)),
    ("level1 @5%", band_mask(1, 0.05)),
    ("level2 @10%", band_mask(2, 0.10)),
    ("level4 @10%", band_mask(4, 0.10)),
    ("level8 @25%", band_mask(8, 0.25)),
    ("full eval bands", M.multilevel_mask(scores / scores.sum(-1, keepdims=True))),
]
for name, lv in cases:
    t = bench_fn(f, (q, k, v, lv), iters=8)
    print(f"{name:42s} {t*1e3:8.2f} ms")
