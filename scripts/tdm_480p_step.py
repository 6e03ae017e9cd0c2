"""Full-width Wan-1.3B TDM training step at the reference's 480p training
envelope (81f 480x832, 32,760-token self-attention) on ONE v5e chip
(VERDICT r3 #4: demonstrate the at-scale TDM recipe and quantify what
fits).

The reference trains this on 80 GB GPUs (train_tdm_1.sh); one 16 GB v5e
fits it because the three roles share ONE bf16 base tree (the reference
loads three full models), with:
  * bf16 base params (2.8 GB) + LoRA adapters & their Adam moments only,
  * ``optimizer_state_bf16=True`` (the reference's 8-bit-Adam analogue),
  * activation remat on the scanned block stack (``WanModel(remat=True)``),
  * ``k_step`` trimming (default 2; the trajectory scan is no-grad so
    k_step only costs time, not memory).

Prints one JSON line with s/step, the measured HBM plan, and config.

Run from the repo root:  python scripts/tdm_480p_step.py [--k_step N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from blade.utils.compile_cache import enable

enable()


def tree_bytes(t):
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(t))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k_step", type=int, default=2)
    ap.add_argument("--sparse", type=int, default=1)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    from blade.attention.integration import asa_model_kwargs
    from blade.config import WAN_480P, derive_asa_config
    from blade.models.wan_dit import WAN_1_3B, WanModel
    from blade.schedulers import unipc_flow as F
    from blade.training import tdm

    preset = WAN_480P
    mkw = {}
    if args.sparse:
        mkw = asa_model_kwargs(derive_asa_config(preset))
    model = WanModel(WAN_1_3B, dtype=jnp.bfloat16, remat=True, **mkw)

    b = 1
    lat_shape = (b, 16, 21, 60, 104)  # 81f 480x832 latents
    rng = jax.random.PRNGKey(0)
    text_s = jax.ShapeDtypeStruct((b, 512, WAN_1_3B.text_dim), jnp.bfloat16)
    lat_s = jax.ShapeDtypeStruct(lat_shape, jnp.bfloat16)

    # On-device bf16 init from an eval_shape of the real flax init (the f32
    # host init would ship 5.6 GB through the ~5 MB/s dev tunnel).
    shapes = jax.eval_shape(
        lambda r, lat, t, te: model.init(r, lat, t, te,
                                         attn_kwargs={"rng": r}),
        rng, lat_s, jax.ShapeDtypeStruct((b,), jnp.float32), text_s)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def make_params(key):
        return jax.tree_util.tree_unflatten(treedef, [
            jax.random.normal(jax.random.fold_in(key, i), s.shape,
                              jnp.bfloat16) * 0.02
            for i, s in enumerate(leaves)
        ])

    base = make_params(jax.random.fold_in(rng, 1))

    cfg = tdm.TDMConfig(
        k_step=args.k_step, lambda_reg=0.0, use_weighting_factor=False,
        fake_loss_skip_threshold=2.0,  # wan trainer settings
        lora_rank=64, lora_alpha=64.0, optimizer_state_bf16=True,
    )
    state = tdm.create_tdm_state(jax.random.fold_in(rng, 2), base, cfg)

    def apply_fn(p, x, t, txt, r):
        return model.apply(p, x, t, txt, attn_kwargs={"rng": r})

    family = tdm.flow_family(F.flow_training_sigmas(1000, 3.0))
    step = jax.jit(tdm.make_tdm_train_step(apply_fn, family, cfg))

    text = jax.random.normal(jax.random.fold_in(rng, 3),
                             (b, 512, WAN_1_3B.text_dim), jnp.bfloat16)
    batch = {
        "text_embeds": text,
        "uncond_embeds": text * 0,
        "noise": jax.random.normal(jax.random.fold_in(rng, 4), lat_shape,
                                   jnp.float32),
    }

    plan = {
        "base_params_gb": round(tree_bytes(state.base_params) / 2**30, 2),
        "lora_gb": round(
            (tree_bytes(state.lora_g) + tree_bytes(state.lora_f)) / 2**30,
            3),
        "opt_states_gb": round(
            (tree_bytes(state.opt_g) + tree_bytes(state.opt_f)) / 2**30, 3),
    }
    print(json.dumps({"plan": plan}), flush=True)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.fold_in(rng, 5))
    float(metrics["loss_du"])  # device_get forces completion (relay-safe)
    compile_s = time.perf_counter() - t0
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    print(json.dumps({"compile_plus_first_step_s": round(compile_s, 1),
                      "metrics": {k: float(v) for k, v in metrics.items()}}),
          flush=True)

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.fold_in(rng, 6 + i))
        float(metrics["loss_du"])
        times.append(time.perf_counter() - t0)

    print(json.dumps({
        "metric": "wan1.3b_tdm_480p_step_s",
        "value": round(min(times), 2),
        "unit": f"s/step (81f 480x832 b1 k{args.k_step} lora64 "
                f"{'sparse' if args.sparse else 'dense'} bf16, one v5e)",
        "plan": plan,
        "all_steps_s": [round(t, 2) for t in times],
    }))


if __name__ == "__main__":
    main()
