"""Family-specific VAE parity scaffolding: module graphs mirroring
diffusers AutoencoderKLWan / AutoencoderKLCogVideoX, the state-dict
converter (torch-layout round-trip), and exact streaming decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blade.convert.vae_convert import (
    convert_cogvideox_vae,
    convert_wan_vae,
    fake_torch_state_dict,
)
from blade.models.vae_cogvideox import (
    COGVIDEOX_VAE_FULL,
    CogVideoXVAE,
    CogVideoXVAEConfig,
    chunked_decode,
)
from blade.models.vae_wan import (
    WAN21_VAE,
    WanVAE,
    WanVAEConfig,
    streaming_decode,
)

WAN_SMALL = WanVAEConfig(
    base_dim=8, dim_mult=(1, 2, 4, 4), num_res_blocks=1,
    temporal_downsample=(False, True, True),
    latents_mean=None, latents_std=None,
)
COG_SMALL = CogVideoXVAEConfig(
    block_out_channels=(8, 16, 16, 32), layers_per_block=1, norm_groups=4,
)


@pytest.fixture(scope="module")
def wan_setup():
    vae = WanVAE(WAN_SMALL)
    video = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), video)
    return vae, params, video


@pytest.fixture(scope="module")
def cog_setup():
    vae = CogVideoXVAE(COG_SMALL)
    video = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), video)
    return vae, params, video


def test_wan_shapes(wan_setup):
    vae, params, video = wan_setup
    z = vae.apply(params, video, method=vae.encode)
    # 4k+1 frames -> k+1 latents, 8x spatial, 16 channels
    assert z.shape == (1, 3, 4, 4, 16)
    frames = vae.apply(params, z, method=vae.decode)
    assert frames.shape == video.shape
    assert bool(jnp.isfinite(frames).all())


def test_wan_streaming_decode_exact(wan_setup):
    """Latent-frame-by-frame decode with conv caches must equal whole-clip
    decode exactly (the feat_cache mechanism as a pure function)."""
    vae, params, video = wan_setup
    z = vae.apply(params, video, method=vae.encode)
    whole = vae.apply(params, z, method=vae.decode)
    for chunk in (1, 2):
        stream = streaming_decode(vae, params, z, chunk_latents=chunk)
        np.testing.assert_allclose(
            np.asarray(stream), np.asarray(whole), atol=1e-5
        )


def test_wan_bf16_decode_close_to_f32(wan_setup):
    """The bf16 serving decode (computation dtype only; params stay f32)
    must track the reference-parity f32 decode closely — output range is
    [-1, 1], so 0.05 absolute is ~2.5 8-bit pixel levels."""
    vae, params, video = wan_setup
    z = vae.apply(params, video, method=vae.encode)
    f32 = vae.apply(params, z, method=vae.decode)
    vae16 = WanVAE(WAN_SMALL, dtype=jnp.bfloat16)
    b16 = vae16.apply(params, z, method=vae16.decode)
    assert b16.dtype == jnp.bfloat16
    err = np.abs(np.asarray(b16, np.float32) - np.asarray(f32))
    assert err.mean() < 0.02 and err.max() < 0.2, (err.mean(), err.max())
    # Streamed bf16 decode re-rounds at every conv-cache boundary, so it is
    # not elementwise-tight vs whole-clip bf16 — hold it to the same
    # perceptual budget vs the f32 reference instead.
    stream16 = streaming_decode(vae16, params, z, chunk_latents=1)
    serr = np.abs(np.asarray(stream16, np.float32) - np.asarray(f32))
    assert serr.mean() < 0.02 and serr.max() < 0.2, (serr.mean(), serr.max())


def test_wan_published_latent_stats():
    assert WAN21_VAE.latents_mean is not None
    assert len(WAN21_VAE.latents_mean) == WAN21_VAE.z_dim
    assert len(WAN21_VAE.latents_std) == WAN21_VAE.z_dim
    assert all(s > 0 for s in WAN21_VAE.latents_std)


def test_cog_shapes(cog_setup):
    vae, params, video = cog_setup
    z = vae.apply(params, video, method=vae.encode)
    assert z.shape == (1, 3, 4, 4, 16)
    frames = vae.apply(params, z, method=vae.decode)
    assert frames.shape == video.shape
    assert bool(jnp.isfinite(frames).all())


def test_cog_chunked_decode(cog_setup):
    """diffusers-parity conv-cache chunked decode: right frame count and
    finite output; chunk 0 carries the image-coded first frame."""
    vae, params, video = cog_setup
    z = vae.apply(params, video, method=vae.encode)
    z5 = jnp.concatenate([z, z[:, :2]], axis=1)  # 5 latents
    out = chunked_decode(vae, params, z5, frame_batch=2)
    assert out.shape[1] == 1 + 4 * 4  # 1 + (5-1)*temporal_factor
    assert bool(jnp.isfinite(out).all())
    # frame_batch is part of the SEMANTICS, not just a memory knob: the
    # temporal upsample treats the first latent frame of each chunk as
    # image-coded (diffusers parity), so 1-frame chunks never expand
    # temporally at all (5 latents -> 5 frames instead of 17).  Pin that
    # so nobody "optimizes" the 480p path by shrinking chunks — the
    # memory fix is spatial tiling (t2v.py::decode_latents).
    out1 = chunked_decode(vae, params, z5, frame_batch=1)
    assert out1.shape[1] == 5 != out.shape[1]


def test_cog_tiled_chunked_decode(cog_setup):
    """The 480p serving path (t2v.py::decode_latents): spatial tiles,
    each temporally chunked at the SAME fb=2 boundaries, overlap-blended
    — full output grid covered, finite, and tile interiors match the
    untiled decode away from blend seams (GroupNorm stats are per-tile,
    so seams and tile-global shifts are the diffusers-parity
    approximation, not an error)."""
    from blade.models.vae import tiled_decode, uniform_tiling

    vae, params, _ = cog_setup
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 8, 8, 16)) * 0.3
    out_full = chunked_decode(vae, params, z, frame_batch=2)
    th, oh = uniform_tiling(8, 6)
    tw, ow = uniform_tiling(8, 6)
    assert (th, oh) == (6, 4)  # 2 equal tiles: [0:6], [2:8]
    out_tiled = tiled_decode(
        lambda zz: chunked_decode(vae, params, zz, frame_batch=2),
        z, tile_latent=(th, tw), overlap=(oh, ow), spatial_factor=8)
    assert out_tiled.shape == out_full.shape
    assert bool(jnp.isfinite(out_tiled).all())


def test_uniform_tiling_covers_exactly():
    """Equal tiles, last tile ends exactly at dim, overlap in bounds."""
    from blade.models.vae import uniform_tiling

    for dim in (13, 20, 21, 30, 34, 45, 60, 90):
        tile, ov = uniform_tiling(dim, 20)
        assert tile <= max(20, dim if dim <= 20 else 0) or tile <= 20
        if ov == 0:
            assert tile == dim
            continue
        stride = tile - ov
        starts = list(range(0, max(dim - ov, 1), stride))
        assert starts[-1] + tile == dim, (dim, tile, ov)
        assert all(s + tile <= dim for s in starts)


@pytest.mark.parametrize("family", ["wan", "cogvideox"])
def test_converter_roundtrip(family, wan_setup, cog_setup):
    """torch-layout state dict -> flax params reproduces the init tree
    exactly (structure and values)."""
    vae, params, _ = wan_setup if family == "wan" else cog_setup
    convert = convert_wan_vae if family == "wan" else convert_cogvideox_vae
    sd = fake_torch_state_dict(params, family)
    # every key is a torch-style dotted path with torch-shaped tensors
    for k, v in sd.items():
        assert " " not in k and k == k.strip(".")
        assert isinstance(v, np.ndarray)
    back = convert(sd)
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_full_config_param_count():
    """Full-size Wan VAE builds with the published ladder (eval_shape only:
    no giant CPU allocs) and the decoder consumes 16-ch latents."""
    vae = WanVAE(WAN21_VAE)
    z = jax.ShapeDtypeStruct((1, 3, 8, 8, 16), jnp.float32)
    shapes = jax.eval_shape(
        lambda zz: vae.init(jax.random.PRNGKey(0), zz, method=vae.decode), z
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    # AutoencoderKLWan decoder-side is ~half of the ~127M total params.
    assert 30e6 < n < 200e6


def test_cog_full_config_structure():
    vae = CogVideoXVAE(COGVIDEOX_VAE_FULL)
    z = jax.ShapeDtypeStruct((1, 2, 8, 8, 16), jnp.float32)
    shapes = jax.eval_shape(
        lambda zz: vae.init(jax.random.PRNGKey(0), zz, method=vae.decode), z
    )
    dec = shapes["params"]["decoder"]
    assert set(f"up_blocks_{i}" for i in range(4)) <= set(dec)
    assert "norm_layer" in dec["norm_out"]  # SpatialNorm3D at the output
