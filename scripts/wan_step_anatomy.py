"""Attribute the wan e2e sparse step (1657 ms) between attention and the
rest of the DiT: run the full model with (a) the production ASA path,
(b) a near-free attention stub (returns v), (c) dense flash."""
import json, sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from blade.utils.compile_cache import enable
enable()
from blade.attention.integration import asa_model_kwargs
from blade.config import WAN_480P, derive_asa_config
from blade.models.wan_dit import WAN_1_3B, WanModel
from blade.utils.profiling import bench_fn

rng = jax.random.PRNGKey(0)
b = 1
lat = jax.random.normal(rng, (b, 16, 21, 60, 104), jnp.bfloat16)
t = jnp.full((b,), 500.0, jnp.float32)
text = jax.random.normal(jax.random.PRNGKey(1), (b, 512, WAN_1_3B.text_dim), jnp.bfloat16)

def stub_attn(rng_, q, k, v, **kw):
    return v, jnp.float32(0.0)

out = {}
variants = {
    "asa": asa_model_kwargs(derive_asa_config(WAN_480P)),
    "stub": {"attention_fn": None},
    "dense": {},
}
# build params once (shapes shared across attention variants)
model0 = WanModel(WAN_1_3B, dtype=jnp.bfloat16)
shapes = jax.eval_shape(lambda r: model0.init(r, lat, t, text), rng)
leaves, treedef = jax.tree_util.tree_flatten(shapes)
params = jax.jit(lambda key: jax.tree_util.tree_unflatten(treedef, [
    jax.random.normal(jax.random.fold_in(key, i), s.shape, jnp.bfloat16) * 0.02
    for i, s in enumerate(leaves)]))(rng)

for name, mkw in variants.items():
    if name == "stub":
        from blade.models import wan_dit as W
        def sfn(q, k, v, rng=None, **kw):
            return v
        model = WanModel(WAN_1_3B, dtype=jnp.bfloat16, attention_fn=sfn)
    else:
        model = WanModel(WAN_1_3B, dtype=jnp.bfloat16, **mkw)
    f = jax.jit(lambda p, x, tt, te, r: model.apply(p, x, tt, te, attn_kwargs={"rng": r} if name == "asa" else {}))
    tt = bench_fn(f, (params, lat, t, text, rng), iters=4)
    out[f"step_{name}_ms"] = round(tt * 1e3, 1)
    print(json.dumps(out), flush=True)
