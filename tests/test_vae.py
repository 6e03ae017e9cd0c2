"""Causal 3D VAE tests: shapes, causality, tiled decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from blade.models.vae import TINY_VAE, CausalVAE, tiled_decode


def _vae():
    model = CausalVAE(TINY_VAE)
    video = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), video)
    return model, params, video


def test_encode_decode_shapes():
    model, params, video = _vae()
    z = model.apply(params, video, method=model.encode)
    # 5 frames -> 1 + 4/2 = 3 latent frames; 16 -> 8 spatial.
    assert z.shape == (1, 3, 8, 8, TINY_VAE.latent_channels)
    out = model.apply(params, z, method=model.decode)
    assert out.shape == video.shape
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_encoder_causality():
    """Changing future frames must not affect past latent frames."""
    model, params, video = _vae()
    z1 = model.apply(params, video, method=model.encode)
    v2 = video.at[:, -1].add(10.0)  # perturb last frame only
    z2 = model.apply(params, v2, method=model.encode)
    # first latent frame (pure image code) unchanged
    np.testing.assert_allclose(
        np.asarray(z1[:, 0]), np.asarray(z2[:, 0]), atol=1e-5
    )
    # last latent frame changed
    assert np.abs(np.asarray(z1[:, -1] - z2[:, -1])).max() > 1e-4


def test_first_frame_image_code():
    """A single-frame video must encode/decode standalone (image mode)."""
    model, params, _ = _vae()
    img = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 16, 16, 3))
    z = model.apply(params, img, method=model.encode)
    assert z.shape[1] == 1
    out = model.apply(params, z, method=model.decode)
    assert out.shape == img.shape


def test_tiled_decode_matches_full():
    model, params, video = _vae()
    z = model.apply(params, video, method=model.encode)
    full = model.apply(params, z, method=model.decode)
    decode_fn = lambda t: model.apply(params, t, method=model.decode)
    # Degenerate case: one tile covering everything is exactly the full decode.
    whole = tiled_decode(decode_fn, z, tile_latent=8, overlap=2,
                         spatial_factor=TINY_VAE.spatial_factor)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(full), atol=1e-5)
    # Real tiling: bounded seam error (tiny latents exaggerate receptive-field
    # truncation; production tiles are 32+ latent pixels).
    tiled = tiled_decode(decode_fn, z, tile_latent=6, overlap=2,
                         spatial_factor=TINY_VAE.spatial_factor)
    assert tiled.shape == full.shape
    err = np.abs(np.asarray(tiled) - np.asarray(full)).mean()
    assert err < 0.5, err


def test_vae_trainable():
    model, params, video = _vae()

    def loss(p, rng):
        rec = model.apply(p, video, rng)
        return jnp.mean((rec - video) ** 2)

    g = jax.grad(loss)(params, jax.random.PRNGKey(3))
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g)
    )


def test_sliced_decode_close_to_full():
    from blade.models.vae import sliced_decode

    model, params, video = _vae()
    z = model.apply(params, video, method=model.encode)  # [1, 3, 8, 8, C]
    full = model.apply(params, z, method=model.decode)
    decode_fn = lambda zz: model.apply(params, zz, method=model.decode)
    sliced = sliced_decode(decode_fn, z, chunk_frames=2, context_frames=1)
    assert sliced.shape == full.shape
    err = np.abs(np.asarray(sliced) - np.asarray(full)).mean()
    assert err < 0.2, err
