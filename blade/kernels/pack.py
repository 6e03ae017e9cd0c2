"""Single-pass K/V record packing (+ pooled pyramid) for the gather kernels.

The block-gather attention kernels DMA one *record* per selected 128-block:
K and V of the block packed together — side by side in lanes for d == 64
(``[128, 2d]``) or stacked in rows for d == 128 (``[2*128, d]``).  Building
these records with XLA concat/reshape costs ~12 ms at CogVideoX geometry
(the interleaved layout defeats XLA's copy emitter); this kernel produces
them — and the 2/4/8x mean-pooled pyramids of the multilevel path — in ONE
pipelined pass over K/V (read 2·L·D, write ≤ 3.75·L·D, bandwidth-bound).

Pooling runs in f32 and chains (pool8 = pool2(pool4)), which is exact in
f32 and matches ``mean_pool_kv`` to rounding in bf16.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blade.kernels.block_sparse_attn import KV_BLOCK, _interpret_default

__all__ = ["pack_kv"]

PACK_CHUNK = 16  # 128-blocks packed per grid step


def _pack_kernel(k_ref, v_ref, kv1_ref, *rest, lane_pack, pyramid):
    k = k_ref[0]
    v = v_ref[0]
    d = k.shape[-1]
    if lane_pack:
        kv = jnp.concatenate([k, v], axis=-1)  # [rows, 2d]
    else:
        rows = k.shape[0]
        blocks = rows // KV_BLOCK
        kv = jnp.concatenate(
            [k.reshape(blocks, KV_BLOCK, d), v.reshape(blocks, KV_BLOCK, d)],
            axis=1,
        ).reshape(2 * rows, d)
    kv1_ref[0] = kv.astype(kv1_ref.dtype)
    if pyramid:
        # Pair-pooling the PACKED tile is exact for both layouts: lane-packed
        # rows hold K|V side by side; row-packed records pool their K rows
        # and V rows independently (region sizes stay even).  128-lane f32
        # keeps the reshape+mean on Mosaic's happy path (64-lane vectors hit
        # a relayout bug).
        p = kv.astype(jnp.float32)
        for ref in rest:
            r, c = p.shape
            y = p.reshape(r // 2, 2, c)
            # indexed sum instead of mean(axis=1): the reduction form hits a
            # Mosaic relayout bug when the source came through a concat
            p = (y[:, 0, :] + y[:, 1, :]) * 0.5
            ref[0] = p.astype(ref.dtype)


def pack_kv(
    k: jnp.ndarray,  # [BH, Lk_pad, D]  (Lk_pad % 128 == 0)
    v: jnp.ndarray,
    *,
    lane_pack: bool,
    pyramid: bool = False,
    interpret: Optional[bool] = None,
):
    """Pack K/V into gather records (and optionally pooled pyramids).

    Returns ``kv1`` (``[BH, L, 2D]`` lane-packed or ``[BH, 2L, D]``
    row-packed) and, with ``pyramid=True``, ``(kv1, pyr2, pyr4, pyr8)``
    where ``pyrL`` holds the L-times mean-pooled records in the same
    packing.  Row layout: record of block ``b`` starts at row
    ``b * rec_rows`` with ``rec_rows = (1 if lane_pack else 2) * 128 / L``.
    """
    if interpret is None:
        interpret = _interpret_default()
    bh, lk_pad, d = k.shape
    assert lk_pad % KV_BLOCK == 0
    n_kt = lk_pad // KV_BLOCK
    chunk = min(PACK_CHUNK, n_kt)
    if n_kt % chunk:
        pad_blocks = chunk - n_kt % chunk
        padn = pad_blocks * KV_BLOCK
        k = jnp.pad(k, ((0, 0), (0, padn), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, padn), (0, 0)))
        n_kt += pad_blocks
        lk_pad += padn
    rows = chunk * KV_BLOCK

    def out_spec(pool):
        r = rows // pool if lane_pack else 2 * rows // pool
        c = 2 * d if lane_pack else d
        return (
            pl.BlockSpec((1, r, c), lambda b, i: (b, i, 0)),
            jax.ShapeDtypeStruct(
                (bh, (lk_pad if lane_pack else 2 * lk_pad) // pool, c), k.dtype
            ),
        )

    pools = (1, 2, 4, 8) if pyramid else (1,)
    specs, shapes = zip(*(out_spec(p) for p in pools))
    outs = pl.pallas_call(
        functools.partial(_pack_kernel, lane_pack=lane_pack, pyramid=pyramid),
        grid=(bh, n_kt // chunk),
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, rows, d), lambda b, i: (b, i, 0)),
        ],
        out_specs=list(specs),
        out_shape=list(shapes),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=(16 + (15 if pyramid else 8))
            * k.size * k.dtype.itemsize // 8,
            transcendentals=0,
        ),
    )(k, v)
    return outs if pyramid else outs[0]
