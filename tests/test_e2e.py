"""Minimum end-to-end slice: tokens -> T5 -> 8-step DiT (sparse ASA) -> VAE
-> exported mp4, per family, on CPU with tiny presets (the reference's
"config 1" CPU-runnable parity target from BASELINE.json)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blade.config import COGVIDEOX_TINY_PRESET, WAN_TINY_PRESET
from blade.sampling.t2v import T2VPipeline
from blade.utils.video_io import export_video, save_videos_grid


@pytest.mark.parametrize("preset", [WAN_TINY_PRESET, COGVIDEOX_TINY_PRESET],
                         ids=["wan", "cog"])
def test_full_text_to_video(preset, tmp_path):
    pipe = T2VPipeline.random_init(
        preset, jax.random.PRNGKey(0), sparse=True, mask_mode="energy",
        dtype=jnp.float32, interpret=True,
    )
    ids = jnp.array([[3, 17, 4, 1] + [0] * (preset.max_text_len - 4)])
    mask = (ids > 0).astype(jnp.int32)
    text = pipe.encode_prompts(ids, mask)
    frames = pipe.generate(text, rng=jax.random.PRNGKey(1), num_steps=2)
    v = preset.video
    assert frames.shape == (1, v.num_frames, v.height, v.width, 3)
    arr = np.asarray(frames)
    assert np.isfinite(arr).all()
    out = export_video(arr[0], str(tmp_path / "clip.mp4"), fps=v.fps)
    assert os.path.getsize(out) > 0


def test_latent_shapes_match_reference_geometry():
    from blade.config import COGVIDEOX_480P, WAN_480P

    t, h, w = WAN_480P.latent_grid()
    assert (t, h, w) == (21, 30, 52)  # 32760 tokens (SURVEY geometry)
    t, h, w = COGVIDEOX_480P.latent_grid()
    assert (t, h, w) == (13, 30, 45)  # 17550 video tokens + 226 text


def test_grid_export(tmp_path):
    vids = np.random.uniform(-1, 1, (3, 4, 16, 16, 3)).astype(np.float32)
    out = save_videos_grid(vids, str(tmp_path / "grid.mp4"), fps=4)
    assert os.path.getsize(out) > 0


def test_generate_batch_seed_independence():
    """Batched generation must reproduce single-seed results per position."""
    from blade.config import WAN_TINY_PRESET
    from blade.sampling.t2v import T2VPipeline

    pipe = T2VPipeline.random_init(
        WAN_TINY_PRESET, jax.random.PRNGKey(0), sparse=False,
        dtype=jnp.float32, with_text_encoder=False, interpret=True,
    )
    d = WAN_TINY_PRESET.text.d_model
    text = jax.random.normal(jax.random.PRNGKey(1), (2, 16, d))
    both = pipe.generate_batch(text, [7, 9], num_steps=2)
    solo = pipe.generate_batch(text[1:2], [9], num_steps=2)
    # Same seed + same prompt embedding -> identical clip regardless of
    # batch composition (the eval sampler's reproducibility contract).
    np.testing.assert_allclose(
        np.asarray(both[1]), np.asarray(solo[0]), atol=1e-5, rtol=1e-5
    )
    # Different seeds differ.
    assert np.abs(np.asarray(both[0]) - np.asarray(both[1])).max() > 1e-3


@pytest.mark.slow
def test_wan_mask_reuse_across_steps():
    """Opt-in VSA-style mask reuse: masks predicted on refresh steps are
    replayed in between.  With a full-retention config the mask is constant,
    so reuse must match per-step prediction exactly; with the normal config
    it must stay finite and differ from baseline only moderately."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from blade import config as C
    from blade.sampling.t2v import T2VPipeline

    preset = dataclasses.replace(C.WAN_TINY_PRESET, min_retain_ratio=1.0,
                                 max_retain_ratio=1.0)
    pipe = T2VPipeline.random_init(
        preset, jax.random.PRNGKey(0), sparse=True, mask_mode="energy",
        dtype=jnp.float32, with_text_encoder=False,
    )
    text = jax.random.normal(
        jax.random.PRNGKey(1), (1, preset.max_text_len, preset.text.d_model)
    )
    base = pipe.sample_latents(text, rng=jax.random.PRNGKey(2), num_steps=4)
    reused = pipe.sample_latents(
        text, rng=jax.random.PRNGKey(2), num_steps=4, mask_refresh_every=2
    )
    np.testing.assert_allclose(np.asarray(reused), np.asarray(base),
                               atol=1e-5)

    pipe2 = T2VPipeline.random_init(
        C.WAN_TINY_PRESET, jax.random.PRNGKey(0), sparse=True,
        mask_mode="energy", dtype=jnp.float32, with_text_encoder=False,
    )
    out = pipe2.sample_latents(
        text, rng=jax.random.PRNGKey(2), num_steps=4, mask_refresh_every=4
    )
    assert np.isfinite(np.asarray(out)).all()


def test_bench_e2e_reuse_glue_runs_tiny():
    """bench.py's mask-reuse e2e helper (explicit-params collect/replay
    wrappers around the flax intermediates protocol) must run end-to-end on
    the tiny preset and return a finite timing."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bench
    from blade import config as C
    from blade.sampling.pipeline import wan_stepper
    from blade.sampling.t2v import T2VPipeline

    pipe = T2VPipeline.random_init(
        C.WAN_TINY_PRESET, jax.random.PRNGKey(0), sparse=True,
        mask_mode="energy", with_text_encoder=False,
    )
    embeds = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, C.WAN_TINY_PRESET.max_text_len, C.WAN_TINY_PRESET.text.d_model),
        jnp.bfloat16)
    init, _ = wan_stepper(lambda *a: None, num_steps=8)
    noise = jax.random.normal(
        jax.random.PRNGKey(2), pipe.latent_shape(1), jnp.float32
    ).astype(pipe.dtype)
    out = bench._bench_e2e_reuse(
        pipe, pipe.dit_params, init, noise, embeds, jax.random.PRNGKey(3))
    (key, val), = out.items()
    assert key == "e2e_denoise8_sparse_reuse4_s" and val > 0
