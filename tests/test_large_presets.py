"""Wan-14B / CogVideoX-2B preset exercise (geometry + sharded forward).

The 14B model cannot fit one v5e chip (28 GB bf16 params); the serving
plan is fsdp/tp over a pod slice.  These tests validate (a) the derived
geometry for both large presets and (b) that the sharding rules produce a
working tp/fsdp-sharded forward at the 14B layer WIDTH (dim 5120, ffn
13824, 40 heads) — depth reduced to 2 scanned layers to fit CPU; the
rules are per-layer, so the pattern transfers to the full 40-layer scan.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from blade import config as C
from blade.models.wan_dit import WAN_14B, WanModel
from blade.models.cogvideox_dit import COGVIDEOX_2B
from blade.parallel import mesh as M


def test_wan_14b_720p_geometry():
    p = C.WAN_14B_720P
    assert p.latent_grid() == (21, 45, 80)  # 81f 720x1280, vae/8, patch 2
    assert C.derive_asa_config(p).seq_len == 75_600
    assert p.dit.dim == 5120 and p.dit.num_layers == 40
    assert p.flow_shift == 5.0  # diffusers 720p recommendation


def test_cogvideox_2b_480p_geometry():
    p = C.COGVIDEOX_2B_480P
    assert p.latent_grid() == (13, 30, 45)
    cfg = C.derive_asa_config(p, "multilevel")
    assert cfg.seq_len == 17_776 and cfg.multilevel_q_rows == 256
    assert p.dit.dim == 1920 and p.dit.num_heads == 30
    assert p.snr_shift_scale == 3.0 and not p.rescale_betas_zero_snr


def test_wan_14b_width_sharded_forward():
    """tp=2/fsdp=2/dp=2 forward at full 14B layer width, 2 scanned layers."""
    mesh = M.make_mesh(dp=2, fsdp=2, tp=2)
    cfg = dataclasses.replace(WAN_14B, num_layers=2)
    model = WanModel(cfg, dtype=jnp.float32)
    lat = jnp.zeros((2, 16, 2, 8, 8))
    text = jnp.zeros((2, 8, cfg.text_dim))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.ones((2,)), text)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    # Width sanity: one 14B block is ~0.3B params (x40 layers ~> 12B core).
    assert n_params > 500e6, n_params
    sharded = M.shard_params(params, mesh)
    # The big matmul weights must actually shard (not replicate).
    sharded_leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(sharded)
        if any(a is not None for a in leaf.sharding.spec)
    ]
    assert sum(x.size for x in sharded_leaves) > 0.9 * n_params

    out = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c))(
        sharded, lat, jnp.ones((2,)), text)
    assert np.isfinite(np.asarray(out)).all()
