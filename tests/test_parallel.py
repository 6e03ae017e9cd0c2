"""Mesh/sharding tests on the 8-virtual-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blade.models.wan_dit import WAN_TINY, WanModel
from blade.parallel import mesh as M
from blade.schedulers import unipc_flow as F
from blade.training import tdm


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_mesh_axes():
    mesh = M.make_mesh(dp=2, fsdp=2, tp=2)
    assert dict(mesh.shape) == {"dp": 2, "fsdp": 2, "tp": 2}


def test_shard_params_and_forward():
    mesh = M.make_mesh(dp=2, fsdp=2, tp=2)
    model = WanModel(WAN_TINY, dtype=jnp.float32)
    lat = jnp.zeros((2, 16, 2, 8, 8))
    text = jnp.zeros((2, 8, WAN_TINY.text_dim))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([1.0, 1.0]), text)
    sharded = M.shard_params(params, mesh)
    # At least one tensor actually sharded over fsdp or tp.
    kinds = set()
    for leaf in jax.tree_util.tree_leaves(sharded):
        spec = leaf.sharding.spec
        kinds.add(tuple(spec))
    assert any(any(a is not None for a in k) for k in kinds), kinds

    out = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c))(
        sharded, lat, jnp.array([1.0, 1.0]), text
    )
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_tdm_train_step():
    """Full TDM train step jitted over a dp x fsdp mesh (ZeRO-analogue)."""
    mesh = M.make_mesh(dp=2, fsdp=4, tp=1)
    model = WanModel(WAN_TINY, dtype=jnp.float32)
    lat_shape = (4, 16, 2, 8, 8)
    text = jax.random.normal(jax.random.PRNGKey(0), (4, 8, WAN_TINY.text_dim))
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros(lat_shape), jnp.ones((4,)), text
    )

    def apply_fn(p, x, t, txt, rng):
        return model.apply(p, x, t, txt, attn_kwargs={"rng": rng})

    family = tdm.flow_family(F.flow_training_sigmas(1000, 3.0))
    cfg = tdm.TDMConfig(k_step=2, lambda_reg=0.0, use_weighting_factor=False,
                        lora_rank=4, lora_alpha=4)
    state = tdm.create_tdm_state(jax.random.PRNGKey(2), params, cfg)
    state = state.replace(
        base_params=M.shard_params(state.base_params, mesh),
        lora_g=M.replicate(state.lora_g, mesh),
        lora_f=M.replicate(state.lora_f, mesh),
        opt_g=M.replicate(state.opt_g, mesh),
        opt_f=M.replicate(state.opt_f, mesh),
    )
    batch = M.shard_batch(
        {
            "text_embeds": text,
            "uncond_embeds": text * 0,
            "noise": jax.random.normal(jax.random.PRNGKey(3), lat_shape),
        },
        mesh,
    )
    step = jax.jit(tdm.make_tdm_train_step(apply_fn, family, cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss_fake"]))
    assert np.isfinite(float(metrics["loss_du"]))
