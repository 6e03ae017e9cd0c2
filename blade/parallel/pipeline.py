"""GPipe-style pipeline parallelism (``pp``) over scan-stacked DiT blocks.

Beyond-reference capability: the reference scales with ZeRO data
parallelism only (``cogvideox/train/config.yaml``; SURVEY §2.6) — models
that do not fit one accelerator are out of its scope.  TPU-native design:

  * the block stack already lives as ONE scan-stacked parameter tree
    (leading layer axis ``L``, from ``nn.scan`` — wan_dit.py /
    cogvideox_dit.py), so sharding it over a ``pp`` mesh axis with
    ``PartitionSpec('pp', ...)`` gives each stage a contiguous slice of
    ``L/S`` layers with no re-packing;
  * inside one ``jax.shard_map`` the classic GPipe schedule runs as a
    single ``lax.scan`` over ``M + S - 1`` ticks: every tick each stage
    applies its resident layers to its current microbatch activation and
    forwards the result to the next stage with ``lax.ppermute`` — the
    activation hop rides the ICI ring and overlaps with the next tick's
    compute under XLA's latency-hiding scheduler;
  * static shapes throughout (bubble ticks compute on don't-care data and
    their outputs are never committed), so the whole pipeline is one XLA
    program with no host round-trips.

Bubble fraction is the textbook ``(S-1)/(M+S-1)``; pick
``num_microbatches >= 4*S`` for <20% bubble.  Composes with ``dp`` (shard
the microbatch batch dim over a second mesh axis) and with tensor
parallelism inside ``block_fn``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_blocks", "make_wan_block_fn", "make_cog_block_fn"]


def _leading_dim(tree, label: str = "layer axis") -> int:
    sizes = {leaf.shape[0] for leaf in jax.tree_util.tree_leaves(tree)}
    assert len(sizes) == 1, f"tree leaves disagree on {label}: {sizes}"
    return sizes.pop()


def pipeline_blocks(
    block_fn: Callable,
    stacked_params: Any,
    x: jnp.ndarray,
    broadcast: Sequence[Any] = (),
    *,
    per_sample: Sequence[jnp.ndarray] = (),
    mesh: Mesh,
    axis: str = "pp",
    batch_axis: Optional[str] = None,
    num_microbatches: Optional[int] = None,
) -> jnp.ndarray:
    """Apply ``L`` stacked layers to ``x`` as a pipeline over mesh ``axis``.

    ``block_fn(layer_params, layer_idx, x, *per_sample, *broadcast) -> x``
    is one block; ``stacked_params`` is a pytree whose leaves carry a
    leading layer axis ``L`` (exactly what ``nn.scan`` produces).  ``x``
    is the scan carry — an array or a pytree of arrays (the CogVideoX
    block carries ``(hidden, enc)``), every leaf ``[B, ...]``; it is
    split into ``num_microbatches`` (default: the stage count ``S``)
    along axis 0.  ``broadcast`` args are replicated
    to every stage (rope tables); ``per_sample`` args carry a leading
    batch dim (text context, time modulation) and are microbatched like
    ``x`` — each stage indexes the slice matching the microbatch it is
    processing this tick (``t - stage``), so conditioning stays aligned
    with its activation without riding the ring.

    With ``batch_axis`` set, ``x``'s batch dim is additionally sharded
    over that mesh axis (pp x dp).  Exactness: each microbatch traverses
    the layers in the same order as the serial ``nn.scan``, so the result
    matches the unpipelined forward up to matmul batch-tiling noise.

    Memory note: activations are *replicated* over the pp axis (only the
    params are sharded), and the final masked-psum broadcast moves ``S``
    copies of the output around the ring where only the last stage holds
    real data.  That is fine at current scales (the point of pp here is
    sharding the PARAM stack); if pp is ever used because activations
    don't fit, shard ``x`` over ``batch_axis`` too and replace the psum
    with a one-hop ``ppermute`` broadcast from the last stage.
    """
    tmap = jax.tree_util.tree_map
    S = mesh.shape[axis]
    L = _leading_dim(stacked_params)
    assert L % S == 0, f"num_layers {L} must divide over {S} pipeline stages"
    B = _leading_dim(x, "batch axis")
    for j, p in enumerate(per_sample):
        assert p.shape[0] == B, (
            f"per_sample[{j}] leading dim {p.shape[0]} != batch {B}")
    M = num_microbatches or S
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"
    layer_ids = jnp.arange(L, dtype=jnp.int32)
    x_m = tmap(lambda l: l.reshape((M, B // M) + l.shape[1:]), x)
    ps_m = tuple(
        p.reshape((M, B // M) + p.shape[1:]) for p in per_sample
    )

    def _pp(params_loc, ids_loc, xmb, psmb, *bcast):
        stage = jax.lax.axis_index(axis)
        last = S - 1
        perm = [(i, (i + 1) % S) for i in range(S)]

        def _stage(x_in, ps_in):
            def step(carry, pi):
                p, i = pi
                return block_fn(p, i, carry, *ps_in, *bcast), None

            y, _ = jax.lax.scan(step, x_in, (params_loc, ids_loc))
            return y

        def tick(carry, t):
            buf, outs = carry
            # Microbatch this stage works on at tick t (clamped on bubble
            # ticks, whose results are never committed).
            mb = jnp.clip(t - stage, 0, M - 1)
            feed = tmap(
                lambda l: jax.lax.dynamic_index_in_dim(
                    l, jnp.minimum(t, M - 1), 0, keepdims=False
                ),
                xmb,
            )
            ps_in = tuple(
                jax.lax.dynamic_index_in_dim(p, mb, 0, keepdims=False)
                for p in psmb
            )
            y = _stage(
                tmap(lambda f, b: jnp.where(stage == 0, f, b), feed, buf),
                ps_in,
            )
            # Commit on the last stage once the first microbatch arrives;
            # bubble-tick outputs are computed but never written.
            oidx = jnp.clip(t - last, 0, M - 1)
            commit = (stage == last) & (t >= last)
            outs = tmap(
                lambda o, yl: jnp.where(
                    commit,
                    jax.lax.dynamic_update_index_in_dim(o, yl, oidx, 0),
                    o,
                ),
                outs, y,
            )
            buf = tmap(lambda yl: jax.lax.ppermute(yl, axis, perm), y)
            return (buf, outs), None

        buf0 = tmap(lambda l: jnp.zeros(l.shape[1:], l.dtype), xmb)
        outs0 = tmap(jnp.zeros_like, xmb)
        (_, outs), _ = jax.lax.scan(
            tick, (buf0, outs0), jnp.arange(M + S - 1)
        )
        # Only the last stage holds real outputs; replicate over the ring.
        return tmap(
            lambda o: jax.lax.psum(
                jnp.where(stage == last, o, jnp.zeros_like(o)), axis
            ),
            outs,
        )

    pspec = tmap(
        lambda l: P(axis, *([None] * (l.ndim - 1))), stacked_params
    )
    xspec = tmap(lambda _: P(None, batch_axis), x)
    psspec = tuple(P(None, batch_axis) for _ in ps_m)
    bspecs = tuple(tmap(lambda _: P(), b) for b in broadcast)
    fn = jax.shard_map(
        _pp,
        mesh=mesh,
        in_specs=(pspec, P(axis), xspec, psspec) + bspecs,
        out_specs=xspec,
        check_vma=False,
    )
    out = fn(stacked_params, layer_ids, x_m, ps_m, *broadcast)
    return tmap(lambda l: l.reshape((B,) + l.shape[2:]), out)


def make_wan_block_fn(cfg, dtype=jnp.float32, attention_fn=None,
                      attn_kwargs=None):
    """``block_fn`` adapter for the Wan DiT block stack.

    Returns ``block_fn(p, i, x, ctx, temb6, cos, sin)`` applying one
    ``WanBlock`` functionally from its per-layer param slice — the shape
    ``nn.scan`` stacks under ``params['blocks']``.  Use with
    ``per_sample=(ctx, temb6)`` and ``broadcast=(cos, sin)``.

    ``attn_kwargs`` (static pytree, e.g. ``{"rng": key}``) is forwarded to
    every block's attention call; the default ``None`` → ``{}`` suits the
    dense path.  ASA variants needing per-step kwargs (rng, mask lists)
    should pass them here — they are closed over, not pipelined, so they
    must be microbatch-invariant.
    """
    from blade.models.wan_dit import WanBlock, dense_attention_fn

    attn = attention_fn or dense_attention_fn
    blk = WanBlock(cfg, dtype, attn)
    akw = attn_kwargs or {}

    def block_fn(p, i, x, ctx, temb6, cos, sin):
        y, _ = blk.apply({"params": p}, x, i, ctx, temb6, cos, sin, akw)
        return y

    return block_fn


def make_cog_block_fn(cfg, dtype=jnp.float32, attention_fn=None,
                      text_last=False, attn_kwargs=None):
    """``block_fn`` adapter for the CogVideoX joint-attention block stack.

    The carry is the pytree ``(hidden, enc)`` (video and text streams).
    Returns ``block_fn(p, i, (hidden, enc), temb, cos, sin)``; use with
    ``per_sample=(temb,)`` and ``broadcast=(cos, sin)``.  ``attn_kwargs``
    as in :func:`make_wan_block_fn`.
    """
    from blade.models.cogvideox_dit import CogVideoXBlock, dense_attention_fn

    attn = attention_fn or dense_attention_fn
    blk = CogVideoXBlock(cfg, dtype, attn, text_last)
    akw = attn_kwargs or {}

    def block_fn(p, i, carry, temb, cos, sin):
        out, _ = blk.apply({"params": p}, carry, i, temb, cos, sin, akw)
        return out

    return block_fn
