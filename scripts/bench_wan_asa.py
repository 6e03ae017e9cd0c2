"""Chip microbench: Wan full ASA path (as bench.py headline) — quick rerun."""
import dataclasses
import jax, jax.numpy as jnp
from blade.utils.compile_cache import enable as _enable_cache
_enable_cache()
from blade.attention.asa import WAN_ASA, adaptive_sparse_attention
from blade.kernels.block_sparse_attn import block_sparse_attention, flash_attention
from blade.utils.profiling import bench_fn
import sys
sys.path.insert(0, "/root/repo")
from bench import peaked_qkv

b, h, l, d = 1, 12, 32760, 128
rng = jax.random.PRNGKey(0)
q, k, v = peaked_qkv(rng, b, h, l, d)
nq = nk = -(-l // 128)
asa_cfg = dataclasses.replace(WAN_ASA, pre_arranged=True, predictor="sum",
                              sample_tokens_per_block=16)
f_full = jax.jit(lambda r, q, k, v: adaptive_sparse_attention(r, q, k, v, asa_cfg)[0])
t_full = bench_fn(f_full, (rng, q, k, v), iters=8)
f_dense = jax.jit(lambda q, k, v: flash_attention(q, k, v, interpret=False)[0])
t_dense = bench_fn(f_dense, (q, k, v), iters=4)
mask = jax.random.uniform(jax.random.PRNGKey(3), (b, h, nq, nk)) < 0.143
mask = mask.at[..., -2:].set(True).at[..., -2:, :].set(True)
f_sparse = jax.jit(lambda q, k, v, m: block_sparse_attention(q, k, v, m, interpret=False)[0])
t_sparse = bench_fn(f_sparse, (q, k, v, mask), iters=8)
print(f"dense  {t_dense*1e3:7.2f} ms")
print(f"full asa {t_full*1e3:7.2f} ms ({t_dense/t_full:.2f}x)")
print(f"sparse@14.3% {t_sparse*1e3:7.2f} ms ({t_dense/t_sparse:.2f}x)")
