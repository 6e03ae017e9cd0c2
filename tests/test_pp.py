"""Pipeline parallelism (`pp`): the GPipe schedule over scan-stacked block
params must reproduce the serial layer scan exactly (same per-microbatch
math, different placement).  Runs on the 8-virtual-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from blade.parallel.pipeline import make_wan_block_fn, pipeline_blocks


def _toy_stack(rng, L, D):
    kw, kb = jax.random.split(rng)
    return {
        "w": jax.random.normal(kw, (L, D, D), jnp.float32) * 0.3,
        "b": jax.random.normal(kb, (L, D), jnp.float32) * 0.1,
    }


def _toy_block(p, i, x, t):
    # Nonlinear, layer-index-dependent so ordering mistakes show up.
    return jnp.tanh(x @ p["w"] + p["b"] + t * (i.astype(jnp.float32) + 1.0))


def _serial(params, x, t):
    def step(carry, pi):
        p, i = pi
        return _toy_block(p, i, carry, t), None

    L = params["w"].shape[0]
    y, _ = jax.lax.scan(step, x, (params, jnp.arange(L, dtype=jnp.int32)))
    return y


def test_pp4_matches_serial():
    L, B, T, D = 8, 8, 4, 16
    params = _toy_stack(jax.random.PRNGKey(0), L, D)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.float32)
    t = jnp.float32(0.25)
    want = _serial(params, x, t)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("pp",))
    got = pipeline_blocks(_toy_block, params, x, (t,), mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_pp_more_microbatches_than_stages():
    L, B, T, D = 4, 8, 4, 16
    params = _toy_stack(jax.random.PRNGKey(2), L, D)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, D), jnp.float32)
    t = jnp.float32(-0.5)
    want = _serial(params, x, t)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("pp",))
    got = pipeline_blocks(_toy_block, params, x, (t,), mesh=mesh,
                          num_microbatches=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_pp_fewer_microbatches_than_stages():
    L, B, T, D = 4, 2, 4, 16
    params = _toy_stack(jax.random.PRNGKey(4), L, D)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, T, D), jnp.float32)
    t = jnp.float32(1.0)
    want = _serial(params, x, t)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("pp",))
    got = pipeline_blocks(_toy_block, params, x, (t,), mesh=mesh,
                          num_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_dp_x_pp_composition():
    L, B, T, D = 4, 8, 4, 16
    params = _toy_stack(jax.random.PRNGKey(6), L, D)
    x = jax.random.normal(jax.random.PRNGKey(7), (B, T, D), jnp.float32)
    t = jnp.float32(0.0)
    want = _serial(params, x, t)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "pp"))
    got = pipeline_blocks(_toy_block, params, x, (t,), mesh=mesh,
                          batch_axis="dp", num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_pp_gradients_match_serial():
    """AD through the shard_map pipeline (ppermute reverses to ppermute)
    must give the serial scan's param/input grads — pp is train-capable."""
    L, B, T, D = 4, 8, 4, 16
    params = _toy_stack(jax.random.PRNGKey(9), L, D)
    x = jax.random.normal(jax.random.PRNGKey(10), (B, T, D), jnp.float32)
    t = jnp.float32(0.1)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("pp",))

    def loss_pp(p, xx):
        y = pipeline_blocks(_toy_block, p, xx, (t,), mesh=mesh,
                            num_microbatches=4)
        return jnp.sum(y * y)

    def loss_serial(p, xx):
        y = _serial(p, xx, t)
        return jnp.sum(y * y)

    gp, gx = jax.grad(loss_pp, argnums=(0, 1))(params, x)
    sp, sx = jax.grad(loss_serial, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(sx),
                               rtol=1e-5, atol=1e-5)


def test_pp_wan_blocks_match_model_scan():
    """Pipelining the real WanBlock stack == the model's nn.scan forward
    over the same stacked params (embed/head excluded on both sides)."""
    from blade.models.layers import rope_3d_tables
    from blade.models.wan_dit import WAN_TINY, WanBlock

    cfg = dataclasses.replace(WAN_TINY, num_layers=4)
    grid = (2, 4, 4)
    ltok = grid[0] * grid[1] * grid[2]
    b = 4
    rng = jax.random.PRNGKey(8)
    kx, kc, ke, kp = jax.random.split(rng, 4)
    x = jax.random.normal(kx, (b, ltok, cfg.dim), jnp.float32)
    ctx = jax.random.normal(kc, (b, 8, cfg.dim), jnp.float32)
    temb6 = jax.random.normal(ke, (b, 6, cfg.dim), jnp.float32) * 0.1
    cos, sin = rope_3d_tables(cfg.head_dim, grid)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    blk = WanBlock(cfg, jnp.float32)
    stacked = jax.vmap(
        lambda k: blk.init(k, x, jnp.int32(0), ctx, temb6, cos, sin, {})[
            "params"
        ]
    )(jax.random.split(kp, cfg.num_layers))

    ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)

    def serial(xx):
        def step(carry, pi):
            p, i = pi
            y, _ = blk.apply({"params": p}, carry, i, ctx, temb6, cos, sin, {})
            return y, None

        y, _ = jax.lax.scan(step, xx, (stacked, ids))
        return y

    want = serial(x)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("pp",))
    block_fn = make_wan_block_fn(cfg, jnp.float32)
    got = pipeline_blocks(block_fn, stacked, x, (cos, sin),
                          per_sample=(ctx, temb6),
                          mesh=mesh, num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pp_cog_blocks_tuple_carry():
    """The CogVideoX block carries (hidden, enc) — pipeline a pytree carry
    through the real joint-attention stack and match the serial scan."""
    from blade.models.cogvideox_dit import COGVIDEOX_TINY, CogVideoXBlock
    from blade.models.layers import rope_3d_tables
    from blade.parallel.pipeline import make_cog_block_fn

    cfg = COGVIDEOX_TINY
    grid, text_len, b = (2, 4, 4), 8, 4
    ltok = grid[0] * grid[1] * grid[2]
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    hidden = jax.random.normal(ks[0], (b, ltok, cfg.dim), jnp.float32)
    enc = jax.random.normal(ks[1], (b, text_len, cfg.dim), jnp.float32)
    temb = jax.random.normal(ks[2], (b, cfg.time_embed_dim), jnp.float32)
    cos, sin = rope_3d_tables(cfg.head_dim, grid, dims_thw=cfg.rope_dims)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    blk = CogVideoXBlock(cfg, jnp.float32)
    stacked = jax.vmap(
        lambda k: blk.init(k, (hidden, enc), jnp.int32(0), temb, cos, sin,
                           {})["params"]
    )(jax.random.split(ks[3], cfg.num_layers))
    ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)

    def serial(carry):
        def step(c, pi):
            p, i = pi
            out, _ = blk.apply({"params": p}, c, i, temb, cos, sin, {})
            return out, None

        out, _ = jax.lax.scan(step, carry, (stacked, ids))
        return out

    want_h, want_e = serial((hidden, enc))
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("pp",))
    block_fn = make_cog_block_fn(cfg, jnp.float32)
    got_h, got_e = pipeline_blocks(
        block_fn, stacked, (hidden, enc), (cos, sin), per_sample=(temb,),
        mesh=mesh, num_microbatches=4,
    )
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               rtol=2e-5, atol=2e-5)
