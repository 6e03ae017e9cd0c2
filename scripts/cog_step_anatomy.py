"""Attribute the cog e2e sparse step (2786 ms): full CogVideoX-5B forward
with (a) multilevel ASA, (b) an attention stub returning v, (c) dense."""
import json, sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from blade.utils.compile_cache import enable
enable()
from blade.attention.integration import asa_model_kwargs
from blade.config import COGVIDEOX_480P, derive_asa_config
from blade.models.cogvideox_dit import CogVideoXModel
from blade.utils.profiling import bench_fn

preset = COGVIDEOX_480P
rng = jax.random.PRNGKey(0)
b = 1
lat = jax.random.normal(rng, (b, 13, 16, 60, 90), jnp.bfloat16)
t = jnp.full((b,), 500.0, jnp.float32)
text = jax.random.normal(jax.random.PRNGKey(1), (b, preset.max_text_len, preset.text.d_model), jnp.bfloat16)

out = {}
def build(name):
    if name == "asa":
        return CogVideoXModel(preset.dit, dtype=jnp.bfloat16,
                              **asa_model_kwargs(derive_asa_config(preset, "multilevel")))
    if name == "stub":
        return CogVideoXModel(preset.dit, dtype=jnp.bfloat16,
                              attention_fn=lambda q, k, v, **kw: v)
    return CogVideoXModel(preset.dit, dtype=jnp.bfloat16)

model0 = build("dense")
shapes = jax.eval_shape(lambda r: model0.init(r, lat, t, text), rng)
leaves, treedef = jax.tree_util.tree_flatten(shapes)
params = jax.jit(lambda key: jax.tree_util.tree_unflatten(treedef, [
    jax.random.normal(jax.random.fold_in(key, i), s.shape, jnp.bfloat16) * 0.02
    for i, s in enumerate(leaves)]))(rng)

for name in ("stub", "dense", "asa"):
    model = build(name)
    akw = {"rng": rng} if name == "asa" else {}
    f = jax.jit(lambda p, x, tt, te, r, model=model, akw=akw: model.apply(
        p, x, tt, te, attn_kwargs=dict(akw)))
    tt = bench_fn(f, (params, lat, t, text, rng), iters=4)
    out[f"step_{name}_ms"] = round(tt * 1e3, 1)
    print(json.dumps(out), flush=True)
