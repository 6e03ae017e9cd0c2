"""Density/recall telemetry (VERDICT r2 item 8): validate the headline
density assumption on structured (non-iid) inputs and bound predictor
recall — the fraction of true attention mass the retained blocks keep."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from blade.attention.asa import ASAConfig
from blade.attention.telemetry import (
    mask_density_stats,
    predictor_recall,
    true_block_mass,
)


def _cfg(**kw):
    # 16 blocks of 128 = 2048 tokens (telemetry-scale O(L^2) is fine)
    base = ASAConfig(
        latent_width=16, latent_height=16, latent_frames=8,
        text_length=0, use_rearrange=False, sample_gap=8,
        min_retain_ratio=0.05, max_retain_ratio=0.2,
        sample_tokens_per_block=16, predictor="sum",
    )
    return dataclasses.replace(base, **kw)


def _clustered_qk(key, b, h, l, d, n_clusters=16, strength=1.6):
    """Shared low-rank cluster structure (bench.py peaked inputs)."""
    cid = (jnp.arange(l) * n_clusters) // l
    cvecs = jax.random.normal(jax.random.fold_in(key, 1), (n_clusters, d))
    base = cvecs[cid] * strength
    q = base + jax.random.normal(jax.random.fold_in(key, 2), (b, h, l, d))
    k = base + jax.random.normal(jax.random.fold_in(key, 3), (b, h, l, d))
    return q.astype(jnp.float32), k.astype(jnp.float32)


def test_true_block_mass_rows_sum_to_one():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 2, 300, 32))  # non-multiple of 128
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 300, 32))
    mass = true_block_mass(q, k, 128)
    assert mass.shape == (1, 2, 3, 3)
    np.testing.assert_allclose(np.asarray(mass.sum(-1)), 1.0, atol=1e-5)


def test_recall_on_clustered_inputs():
    """Structured inputs: the energy mask at ~6-20% density must capture
    the bulk of true attention mass (this is the claim the 3x headline
    rests on)."""
    key = jax.random.PRNGKey(42)
    q, k = _clustered_qk(key, 1, 4, 2048, 64)
    r = predictor_recall(jax.random.fold_in(key, 9), q, k, _cfg())
    # At this 16x16 block grid the forced last-2 rows/cols add a ~12%
    # density floor on top of the <=20% retain clamp; real Wan 480p runs
    # at a 256-block grid where the forced floor is <1% (bench: 6.2%).
    assert 0.03 <= r["density"] <= 0.33, r
    assert r["recall"] >= 0.95, r
    assert r["covered"] == 1.0  # pooled branch spans every key


def test_recall_iid_saturates_at_clamp():
    """iid inputs have flat attention: the mask saturates at the
    max_retain clamp and recall ~= density x uniform mass (no structure
    to find) — documents the honest worst case."""
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (1, 4, 2048, 64))
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 2048, 64))
    r = predictor_recall(jax.random.fold_in(key, 9), q, k, _cfg())
    # max_retain clamp (0.2) + the forced last-2 rows/cols floor, which at
    # this coarse 16x16 grid adds ~0.19 (it is <1% at the real 256-grid)
    assert r["density"] <= 0.42, r
    assert r["recall"] <= 0.5, r
    # flat attention: retained mass ~= retained fraction (no structure)
    assert abs(r["recall"] - r["density"]) < 0.05, r


def test_multilevel_recall_and_density():
    key = jax.random.PRNGKey(3)
    q, k = _clustered_qk(key, 1, 2, 2048, 64)
    cfg = _cfg(mask_mode="multilevel")
    r = predictor_recall(jax.random.fold_in(key, 9), q, k, cfg)
    # Band integerization at the 16-block grid: l1 width 0, l2/l4 2 blocks,
    # l8 4 blocks -> 0.125 effective, plus the forced last-2 rows/cols
    # floor (~0.2 here, <1% at the real 139/256-block grids where the
    # 15.6% nominal figure holds)
    assert 0.12 <= r["density"] <= 0.36, r
    # levels>0 span the top 50% of ranked blocks: recall well above density
    assert r["recall"] >= 0.95, r


def test_mask_density_stats_shapes():
    masks_bool = np.random.default_rng(0).random((3, 1, 2, 16, 16)) < 0.1
    s = mask_density_stats(masks_bool)
    assert 0.05 <= s["mean"] <= 0.15
    assert len(s["per_layer_mean"]) == 3
    levels = np.random.default_rng(1).choice(
        [0, 1, 2, 4, 8], size=(2, 1, 2, 16, 16))
    s2 = mask_density_stats(levels)
    assert 0.0 < s2["mean"] < 1.0
    assert s2["min"] <= s2["p50"] <= s2["max"]
