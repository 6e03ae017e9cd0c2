"""Trace one sparse wan_stepper step on the chip and dump op durations.

The e2e sparse step runs ~2064 ms vs 858 (non-attn) + 30 x 27.2 (iid ASA)
= 1674 ms expected — this pinpoints where the extra ~390 ms lives.
"""
import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp

from blade.utils.compile_cache import enable as _enable_cache
_enable_cache()

from blade.config import WAN_480P
from blade.sampling.pipeline import wan_stepper
from blade.sampling.t2v import T2VPipeline


def main(sparse=True):
    rng = jax.random.PRNGKey(0)
    pipe = T2VPipeline.random_init(
        WAN_480P, rng, sparse=sparse, mask_mode="energy",
        with_text_encoder=False, interpret=False)
    dit_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        pipe.dit_params)
    pipe.dit_params = None
    embeds = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, WAN_480P.max_text_len, WAN_480P.text.d_model), jnp.bfloat16)

    def step_p(params, state, i, te, r):
        def mf(x, tt, tee, rr):
            return pipe.dit.apply(params, x, tt, tee, attn_kwargs={"rng": rr})

        _, st = wan_stepper(mf, num_steps=8)
        return st(state, i, te, r)

    init, _ = wan_stepper(lambda *a: None, num_steps=8)
    jstep = jax.jit(step_p)
    noise = jax.random.normal(
        jax.random.fold_in(rng, 2), pipe.latent_shape(1), jnp.float32
    ).astype(pipe.dtype)
    state = jstep(dit_params, init(noise), jnp.asarray(0), embeds, rng)
    jax.device_get(state.x)  # warm

    logdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    state = jstep(dit_params, state, jnp.asarray(1), embeds, rng)
    jax.device_get(state.x)
    jax.profiler.stop_trace()
    print("trace files:")
    for f in glob.glob(f"{logdir}/**/*", recursive=True):
        if os.path.isfile(f):
            print(" ", f, os.path.getsize(f))


if __name__ == "__main__":
    main(sparse="--dense" not in sys.argv)
