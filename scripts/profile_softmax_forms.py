"""Chip microbench: dense flash softmax formulations.

The base-2 rewrite (raw scores; exp2(s*c - m*c)) sped the sparse kernels
up but slowed the DENSE kernel ~7% — compare formulations in isolation:

  A. legacy:      s' = s*scale + bias; exp(s' - m')
  B. fma-base2:   raw s; exp2(s*c - m*c)            (current)
  C. carry-base2: raw s; m tracked base-2; exp2(s*c - m2)
  D. q-prescale:  q *= scale*log2e (bf16, one extra rounding);
                  exp2(s2 - m2)  -- zero per-element multiplies

Run: python scripts/profile_softmax_forms.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blade.utils.compile_cache import enable as _enable_cache
_enable_cache()

from blade.utils.profiling import bench_fn

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def make_kernel(form, scale):
    c = scale * LOG2E

    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        j = pl.program_id(2)
        n_k = pl.num_programs(2)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, NEG_INF)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        q = q_ref[0]
        if form == "D":
            q = (q.astype(jnp.float32) * c).astype(q.dtype)
        s = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_prev = m_scr[:, 0:1]
        l_prev = l_scr[:, 0:1]
        if form == "A":
            s = s * scale
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
        elif form == "B":
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2((m_prev - m_new) * c)
            mc = m_new * c
            p = jnp.exp2(s * c - mc)
        elif form == "C":
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True) * c)
            alpha = jnp.exp2(m_prev - m_new)
            p = jnp.exp2(s * c - m_new)
        else:  # D
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2(m_prev - m_new)
            p = jnp.exp2(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + pv
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

        @pl.when(j == n_k - 1)
        def _finalize():
            l = l_scr[:, 0:1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)

    return kernel


def run(form, q, k, v, tile=1024):
    bh, l, d = q.shape
    scale = 1.0 / float(np.sqrt(d))
    n_t = l // tile
    out = pl.pallas_call(
        make_kernel(form, scale),
        grid=(bh, n_t, n_t),
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, tile, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, tile, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, l, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.VMEM((tile, d), jnp.float32),
        ],
    )(q, k, v)
    return out


def main():
    rng = jax.random.PRNGKey(0)
    for name, (h, l, d) in (("wan", (12, 32768, 128)),
                            ("cog", (48, 17408, 64))):
        q = jax.random.normal(rng, (h, l, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(rng, 1), (h, l, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(rng, 2), (h, l, d), jnp.bfloat16)
        flops = 4 * h * l * l * d
        ref = None
        for form in "ABCD":
            f = jax.jit(functools.partial(run, form))
            o = jax.device_get(f(q, k, v)[:, :4].astype(jnp.float32))
            if ref is None:
                ref = o
            err = np.abs(o - ref).max()
            t = bench_fn(f, (q, k, v), iters=4)
            print(f"{name} form {form}: {t*1e3:7.2f} ms "
                  f"({flops/t/1e12:6.1f} TF/s)  maxdiff={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
