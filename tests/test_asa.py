"""End-to-end ASA module tests (small geometry, interpret-mode kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blade.attention.asa import ASAConfig, adaptive_sparse_attention, asa_attention
from blade.kernels.ref_attention import dense_attention_with_lse

# Tiny geometry: 8x4x2 = 64 video tokens + 64 text = 128 -> 1 block... use
# bigger: 16x8x4 = 512 video + 0 text, blocks = 4.
TINY = ASAConfig(
    latent_width=16, latent_height=8, latent_frames=4,
    text_length=0, sample_gap=4,
    min_retain_ratio=0.25, max_retain_ratio=1.0,
    sample_tokens_per_block=32,
)


def _qkv(rng, cfg, b=1, h=2, d=32):
    l = cfg.seq_len
    kq, kk, kv = jax.random.split(rng, 3)
    return (
        jax.random.normal(kq, (b, h, l, d)),
        jax.random.normal(kk, (b, h, l, d)),
        jax.random.normal(kv, (b, h, l, d)),
    )


def test_asa_shapes_and_finite():
    q, k, v = _qkv(jax.random.PRNGKey(0), TINY)
    out, sparsity = asa_attention(jax.random.PRNGKey(1), q, k, v, TINY, interpret=True)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()
    s = float(sparsity)
    assert -1.0 <= s <= 1.0


def test_asa_full_retention_close_to_dense():
    """With max_retain=1.0 and threshold 1.0 the mask keeps everything; the
    pooled branch adds only a small low-res correction, so the result must
    be close to dense attention (identical up to the pooled branch mass)."""
    cfg = ASAConfig(
        latent_width=16, latent_height=8, latent_frames=4,
        text_length=0, sample_gap=4,
        min_retain_ratio=1.0, max_retain_ratio=1.0,
        energy_threshold=2.0,  # never reached -> keep all
    )
    q, k, v = _qkv(jax.random.PRNGKey(2), cfg)
    out, sparsity = adaptive_sparse_attention(
        jax.random.PRNGKey(3), q, k, v, cfg, interpret=True
    )
    ref, _ = dense_attention_with_lse(q, k, v)
    # Pooled branch weight ~ gap/(L+gap) per row; small but nonzero.
    err = np.abs(np.asarray(out) - np.asarray(ref)).mean()
    assert err < 0.05, err
    assert float(sparsity) <= 0.0  # full mask => sparsity = -1/gap


def test_asa_gradients_flow():
    q, k, v = _qkv(jax.random.PRNGKey(4), TINY)

    def loss(q, k, v):
        out, _ = adaptive_sparse_attention(
            jax.random.PRNGKey(5), q, k, v, TINY, interpret=True
        )
        return jnp.sum(out**2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for name, arr in zip("qkv", g):
        a = np.asarray(arr)
        assert np.isfinite(a).all(), name
        assert np.abs(a).max() > 0, name


def test_asa_with_text_and_rearrange():
    cfg = ASAConfig(
        latent_width=8, latent_height=8, latent_frames=4,
        text_length=64, sample_gap=4,
        min_retain_ratio=0.5, max_retain_ratio=1.0,
    )
    q, k, v = _qkv(jax.random.PRNGKey(6), cfg)
    out, _ = asa_attention(jax.random.PRNGKey(7), q, k, v, cfg, interpret=True)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


def test_asa_multilevel_mode():
    cfg = ASAConfig(
        latent_width=16, latent_height=8, latent_frames=8,
        text_length=0, sample_gap=4, mask_mode="multilevel",
    )
    q, k, v = _qkv(jax.random.PRNGKey(8), cfg)
    out, sparsity = adaptive_sparse_attention(
        jax.random.PRNGKey(9), q, k, v, cfg, interpret=True
    )
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(float(sparsity), 1 - 0.15625, atol=1e-6)


def test_pre_arranged_matches_per_call():
    """Model-level gilbert arrangement is exact: permuting inputs once and
    running pre_arranged equals the per-call rearrange path."""
    import dataclasses

    from blade.attention import gilbert

    q, k, v = _qkv(jax.random.PRNGKey(10), TINY)
    rng = jax.random.PRNGKey(11)
    ref, _ = asa_attention(rng, q, k, v, TINY, interpret=True)

    perm, inv = TINY.permutations()
    cfg = dataclasses.replace(TINY, pre_arranged=True)
    qa = gilbert.rearrange_tokens(q, perm, 0)
    ka = gilbert.rearrange_tokens(k, perm, 0)
    va = gilbert.rearrange_tokens(v, perm, 0)
    out, _ = asa_attention(rng, qa, ka, va, cfg, interpret=True)
    out = gilbert.unrearrange_tokens(out, inv, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.slow
def test_wan_model_level_arrangement_exact():
    """WanModel.token_perm + ASAConfig.pre_arranged (via asa_model_kwargs)
    produces bit-identical outputs to the per-call attention_fn."""
    from blade.attention.integration import asa_model_kwargs, make_asa_attention_fn
    from blade.models.wan_dit import WAN_TINY, WanModel

    rng = jax.random.PRNGKey(12)
    lat = jax.random.normal(rng, (1, 16, 4, 16, 32))
    t = jnp.ones((1,))
    txt = jax.random.normal(rng, (1, 7, WAN_TINY.text_dim))

    m1 = WanModel(WAN_TINY, dtype=jnp.float32,
                  attention_fn=make_asa_attention_fn(TINY, interpret=True))
    params = m1.init(rng, lat, t, txt, attn_kwargs={"rng": rng})
    ref = m1.apply(params, lat, t, txt, attn_kwargs={"rng": rng})

    kwargs = asa_model_kwargs(TINY, interpret=True)
    assert "token_perm" in kwargs
    m2 = WanModel(WAN_TINY, dtype=jnp.float32, **kwargs)
    out = m2.apply(params, lat, t, txt, attn_kwargs={"rng": rng})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_sum_predictor_normalized_and_selective():
    """Sum predictor rows are exact softmax-mass distributions (sum to 1)
    and rank a planted hot block first."""
    import dataclasses

    from blade.attention.asa import predict_block_scores

    cfg = dataclasses.replace(TINY, predictor="sum", sample_tokens_per_block=16)
    rng = jax.random.PRNGKey(13)
    b, h, d = 1, 2, 32
    l = cfg.seq_len
    q = jax.random.normal(rng, (b, h, l, d))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, l, d)) * 0.05
    # plant block 2 as globally hot for every query
    k = k.at[:, :, 2 * 128:3 * 128].add(q.mean(axis=2, keepdims=True) * 3.0)
    s = predict_block_scores(rng, q, k, cfg)
    np.testing.assert_allclose(np.asarray(s.sum(-1)), 1.0, atol=1e-3)
    assert int(jnp.argmax(s.mean((0, 1, 2)))) == 2


def test_sum_and_max_predictors_agree_on_selection():
    """Both predictors must keep the same dominant blocks (mask IoU high on
    structured inputs)."""
    import dataclasses

    from blade.attention import masks as M
    from blade.attention.asa import predict_block_scores

    rng = jax.random.PRNGKey(14)
    b, h, d = 1, 2, 32
    l = TINY.seq_len
    cid = (jnp.arange(l) * 4) // l
    cvecs = jax.random.normal(jax.random.fold_in(rng, 2), (4, d))
    base = cvecs[cid] * 1.5
    q = base + jax.random.normal(rng, (b, h, l, d))
    k = base + jax.random.normal(jax.random.fold_in(rng, 3), (b, h, l, d))
    masks = {}
    for pred in ("max", "sum"):
        cfg = dataclasses.replace(TINY, predictor=pred)
        s = predict_block_scores(rng, q, k, cfg)
        masks[pred] = np.asarray(M.energy_mask(
            s, min_retain_ratio=0.25, max_retain_ratio=0.75))
    inter = (masks["max"] & masks["sum"]).sum()
    union = (masks["max"] | masks["sum"]).sum()
    assert inter / union > 0.7, (inter, union)


@pytest.mark.slow
def test_cog_model_level_arrangement_exact():
    """CogVideoXModel.token_perm + text_last + pre_arranged ASA equals the
    per-call rearrangement path bit-for-bit."""
    from blade.attention.integration import asa_model_kwargs, make_asa_attention_fn
    from blade.models.cogvideox_dit import COGVIDEOX_TINY, CogVideoXModel

    cfg = ASAConfig(
        latent_width=16, latent_height=8, latent_frames=4, text_length=16,
        sample_gap=4, min_retain_ratio=0.25, max_retain_ratio=1.0,
        sample_tokens_per_block=16,
    )
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(rng, (1, 4, 16, 16, 32))
    t = jnp.ones((1,))
    txt = jax.random.normal(rng, (1, 16, COGVIDEOX_TINY.text_embed_dim))

    m1 = CogVideoXModel(COGVIDEOX_TINY, dtype=jnp.float32,
                        attention_fn=make_asa_attention_fn(cfg, interpret=True))
    params = m1.init(rng, lat, t, txt, attn_kwargs={"rng": rng})
    ref = m1.apply(params, lat, t, txt, attn_kwargs={"rng": rng})

    kwargs = asa_model_kwargs(cfg, interpret=True)
    assert "token_perm" in kwargs
    m2 = CogVideoXModel(COGVIDEOX_TINY, dtype=jnp.float32, **kwargs)
    out = m2.apply(params, lat, t, txt, attn_kwargs={"rng": rng})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.slow
def test_multilevel_lists_artifact_replay_exact():
    """On the fused multilevel lane the reusable mask artifact is the
    (idx, counts) lists tuple; replaying it (different rng, so the
    predictor would pick different samples) reproduces the fresh output
    bit-for-bit and never rebuilds lists from a level mask."""
    cfg = ASAConfig(
        latent_width=16, latent_height=8, latent_frames=8,
        text_length=0, sample_gap=4, mask_mode="multilevel",
        sample_tokens_per_block=16,
    )
    q, k, v = _qkv(jax.random.PRNGKey(20), cfg, d=64)
    out1, _, art = asa_attention(
        jax.random.PRNGKey(21), q, k, v, cfg, interpret=True,
        return_mask=True)
    assert isinstance(art, tuple) and len(art) == 2, type(art)
    idx, cnt = art
    assert idx.dtype == jnp.int32 and cnt.dtype == jnp.int32

    out2, _ = asa_attention(
        jax.random.PRNGKey(999), q, k, v, cfg, interpret=True, mask=art)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    # density telemetry understands the lists artifact (stacked per-layer)
    from blade.attention.telemetry import mask_density_stats

    stacked = jax.tree_util.tree_map(lambda a: a[None], art)
    stats = mask_density_stats(stacked)
    assert 0.0 < stats["mean"] <= 1.0


def test_extract_attn_aux_scan_and_unscanned():
    """extract_attn_aux: nn.scan's single stacked sow site passes through;
    scan_layers=False sows one site per layer (blocks_0, blocks_1, ...,
    blocks_10) which must stack in NUMERIC layer order to the same [L, ...]
    contract — including tuple (lists) artifacts."""
    from blade.attention.integration import extract_attn_aux

    # scanned: one site, already [L, ...]
    stacked = jnp.arange(6).reshape(3, 2)
    assert (extract_attn_aux({"blocks": {"attn_aux": (stacked,)}})
            == stacked).all()

    # unscanned: 11 sites so lexicographic order ("blocks_10" < "blocks_2")
    # would misplace layers
    tree = {
        f"blocks_{i}": {"attn_aux": ((jnp.full((2,), i),
                                      jnp.full((1,), 10 * i)),)}
        for i in range(11)
    }
    idx, cnt = extract_attn_aux(tree)
    assert idx.shape == (11, 2) and cnt.shape == (11, 1)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(11))
    np.testing.assert_array_equal(np.asarray(cnt[:, 0]), 10 * np.arange(11))
