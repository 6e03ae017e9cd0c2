"""Attribute the Wan self-attention q/k lane (post RoPE-fold: 6.0 ms/layer)
between the projection matmuls, the RMS norms, the head transpose, and
rotate-half RoPE, at Wan-1.3B 480p geometry (S=32760, dim=1536, 12x128).

Run on the real chip with an idle host.
"""
import json, sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
from blade.utils.compile_cache import enable
enable()
from blade.models.layers import apply_rope_half, deinterleave_perm, rope_3d_tables
from blade.utils.profiling import bench_fn

B, S, D, H, d = 1, 32760, 1536, 12, 128
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, S, D), jnp.bfloat16)
wq = jax.random.normal(jax.random.PRNGKey(1), (D, D), jnp.bfloat16) * 0.02
wk = jax.random.normal(jax.random.PRNGKey(2), (D, D), jnp.bfloat16) * 0.02
sq = jnp.ones((D,), jnp.float32)
sk = jnp.ones((D,), jnp.float32)
cos, sin = rope_3d_tables(d, (21, 30, 52))
cos, sin = jnp.asarray(cos), jnp.asarray(sin)

def rms(t, scale):
    tf = t.astype(jnp.float32)
    var = jnp.mean(tf * tf, axis=-1, keepdims=True)
    return (tf * jax.lax.rsqrt(var + 1e-6) * scale).astype(t.dtype)

def heads(t):
    return t.reshape(B, S, H, d).transpose(0, 2, 1, 3)

def f_proj(x):
    return x @ wq, x @ wk

def f_norm(x):
    return rms(x @ wq, sq), rms(x @ wk, sk)

def f_heads(x):
    return heads(rms(x @ wq, sq)), heads(rms(x @ wk, sk))

def f_full(x):
    q = apply_rope_half(heads(rms(x @ wq, sq)), cos, sin)
    k = apply_rope_half(heads(rms(x @ wk, sk)), cos, sin)
    return q, k

from blade.kernels.norm_rope import heads_pack, heads_unpack, norm_rope_heads

def f_fused(x):
    q = norm_rope_heads(x @ wq, sq, cos, sin, H)
    k = norm_rope_heads(x @ wk, sk, cos, sin, H)
    return q, k

def f_pack_xla(x):
    return heads(x @ wq)

def f_pack_fused(x):
    return heads_pack(x @ wq, H)

def f_unpack_xla(q4):
    return q4.transpose(0, 2, 1, 3).reshape(B, S, D) @ wq

def f_unpack_fused(q4):
    return heads_unpack(q4) @ wq

q4 = jax.random.normal(rng, (B, H, S, d), jnp.bfloat16)

out = {}
for name, f in [("proj", f_proj), ("norm", f_norm), ("heads", f_heads),
                ("full", f_full), ("fused", f_fused),
                ("pack_xla", f_pack_xla), ("pack_fused", f_pack_fused)]:
    t = bench_fn(jax.jit(f), (x,), iters=8)
    out[f"{name}_ms"] = round(t * 1e3, 2)
    print(json.dumps(out), flush=True)

for name, f in [("unpack_xla", f_unpack_xla), ("unpack_fused", f_unpack_fused)]:
    t = bench_fn(jax.jit(f), (q4,), iters=8)
    out[f"{name}_ms"] = round(t * 1e3, 2)
    print(json.dumps(out), flush=True)
