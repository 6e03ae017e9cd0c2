"""Full text-to-video pipeline: tokens -> T5 -> 8-step DiT -> VAE -> frames.

The on-device analogue of the reference's diffusers pipeline usage
(``cogvideox/train/inference.py``, ``wanx/train/inference.py``): the whole
path runs under jit on the TPU; prompt embeddings may also be precomputed
offline (the TDM data-free path) and passed directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from blade.config import FamilyPreset, derive_asa_config
from blade.models.cogvideox_dit import CogVideoXModel
from blade.models.t5 import T5Encoder
from blade.models.vae import build_vae, tiled_decode
from blade.models.wan_dit import WanModel
from blade.sampling.pipeline import sample_cogvideox, sample_wan
from blade.schedulers.ddpm import make_ddpm_schedule

__all__ = ["T2VPipeline"]


@dataclasses.dataclass
class T2VPipeline:
    """Bundles modules + params for one family preset."""

    preset: FamilyPreset
    dit_params: Any
    vae_params: Any
    text_params: Optional[Any] = None
    sparse: bool = True
    mask_mode: str = "multilevel"  # inference default; "energy" for training
    dtype: Any = jnp.bfloat16
    # VAE *computation* dtype (params stay f32).  f32 default = reference
    # parity (the reference runs the Wan VAE in fp32,
    # wanx/train/inference.py); bf16 roughly halves decode time on TPU and
    # is the usual serving choice there.
    vae_dtype: Any = jnp.float32
    interpret: Optional[bool] = None

    def __post_init__(self):
        p = self.preset
        kwargs = {}
        if self.sparse:
            from blade.attention.integration import asa_model_kwargs

            asa_cfg = derive_asa_config(p, self.mask_mode)
            kwargs = asa_model_kwargs(asa_cfg, interpret=self.interpret)
        if p.name == "wan":
            self.dit = WanModel(p.dit, dtype=self.dtype, **kwargs)
        else:
            self.dit = CogVideoXModel(p.dit, dtype=self.dtype, **kwargs)
        self.vae = build_vae(p.vae, dtype=self.vae_dtype)
        self.text_encoder = T5Encoder(p.text, dtype=self.dtype)

    # ------------------------------------------------------------- helpers
    def latent_shape(self, batch: int):
        p = self.preset
        t, h, w = p.latent_grid()
        if p.name == "wan":
            pt, ph, pw = p.dit.patch_size
            return (batch, p.dit.in_channels, t * pt, h * ph, w * pw)
        ps = p.dit.patch_size
        return (batch, t, p.dit.in_channels, h * ps, w * ps)

    def encode_prompts(self, input_ids, attention_mask=None):
        assert self.text_params is not None, "text encoder weights not loaded"
        return self.text_encoder.apply(self.text_params, input_ids, attention_mask)

    # ------------------------------------------------------------ sampling
    def model_fn(self):
        def fn(latents, timestep, text_embeds, rng, masks=None,
               collect_mask=False):
            attn_kwargs = {"rng": rng}
            if masks is not None:
                attn_kwargs["masks"] = masks
            if collect_mask:
                from blade.attention.integration import extract_attn_aux

                out, state = self.dit.apply(
                    self.dit_params, latents, timestep, text_embeds,
                    attn_kwargs=dict(attn_kwargs, collect_mask=True),
                    mutable=["intermediates"],
                )
                return out, extract_attn_aux(state["intermediates"])
            return self.dit.apply(
                self.dit_params, latents, timestep, text_embeds,
                attn_kwargs=attn_kwargs,
            )

        return fn

    def sample_latents(
        self,
        text_embeds,
        *,
        rng,
        num_steps: int = 8,
        guidance_scale: float = 1.0,
        neg_text_embeds=None,
        mask_refresh_every: int = 0,
    ):
        b = text_embeds.shape[0]
        noise = jax.random.normal(
            jax.random.fold_in(rng, 0), self.latent_shape(b), jnp.float32
        ).astype(self.dtype)
        if self.preset.name == "wan":
            return sample_wan(
                self.model_fn(), noise, text_embeds, rng=rng,
                num_steps=num_steps, flow_shift=self.preset.flow_shift or 3.0,
                guidance_scale=guidance_scale, neg_text_embeds=neg_text_embeds,
                mask_refresh_every=mask_refresh_every if self.sparse else 0,
            )
        return sample_cogvideox(
            self.model_fn(), noise, text_embeds, rng=rng, num_steps=num_steps,
            guidance_scale=guidance_scale, neg_text_embeds=neg_text_embeds,
            ddpm_schedule=make_ddpm_schedule(
                snr_shift_scale=self.preset.snr_shift_scale,
                rescale_betas_zero_snr=self.preset.rescale_betas_zero_snr,
            ),
        )

    def decode_latents(self, latents, *, tiled: bool = False, tile_latent: int = 32):
        """Model-layout latents -> [B, T, H, W, 3] float in [-1, 1]."""
        p = self.preset

        # Prologue/epilogue run as ONE jitted program each (cached on the
        # pipeline): eagerly dispatched transposes/denorm/clip each pay an
        # RPC + tiny-program compile on the relay runtime.
        if not hasattr(self, "_decode_prep"):
            def _prep(lat):
                if p.name == "wan":
                    z = jnp.transpose(lat, (0, 2, 3, 4, 1))  # BCTHW -> BTHWC
                else:
                    z = jnp.transpose(lat, (0, 1, 3, 4, 2))  # BTCHW -> BTHWC
                z = z.astype(jnp.float32) / p.vae.scaling_factor
                if p.vae.latents_mean is not None:
                    z = z * jnp.asarray(p.vae.latents_std) + jnp.asarray(
                        p.vae.latents_mean)
                return z

            self._decode_prep = jax.jit(_prep)
            self._decode_clip = jax.jit(lambda o: jnp.clip(o, -1.0, 1.0))
        z = self._decode_prep(latents)
        decode = lambda zz: self.vae.apply(self.vae_params, zz, method=self.vae.decode)
        if tiled:
            out = tiled_decode(
                decode, z, tile_latent=tile_latent,
                spatial_factor=p.vae.spatial_factor,
            )
        else:
            # Full-size whole-clip decode OOMs a single chip (a 480p Wan
            # clip peaks at ~6 GB f32 per decoder stage); the family VAEs
            # decode latent-frame chunks with exact conv-state carry.
            from blade.models.vae_cogvideox import CogVideoXVAE, chunked_decode
            from blade.models.vae_wan import WanVAE, streaming_decode

            if isinstance(self.vae, WanVAE) and z.shape[1] > 2:
                out = streaming_decode(self.vae, self.vae_params, z,
                                       chunk_latents=1)
            elif isinstance(self.vae, CogVideoXVAE) and z.shape[1] > 3:
                # frame_batch=2 (+remainder in chunk 0) is part of the
                # numerics contract (the temporal upsample is chunk-
                # boundary-sensitive; tests/test_vae_families.py pins it),
                # but at 480p the 3-latent-frame first chunk compiles to a
                # 31 GB program and OOMs the 16 GB chip.  diffusers' own
                # answer is enable_tiling: spatial tiles, each temporally
                # chunked at the SAME fb=2 boundaries, overlap-blended.
                # uniform_tiling picks equal tiles (30x45 -> 2x3 tiles of
                # 18x21-class) so ONE decoder program serves every tile.
                if z.shape[2] * z.shape[3] >= 1024:
                    from blade.models.vae import uniform_tiling

                    th, oh = uniform_tiling(z.shape[2], 20)
                    tw, ow = uniform_tiling(z.shape[3], 20)
                    out = tiled_decode(
                        lambda zz: chunked_decode(
                            self.vae, self.vae_params, zz, frame_batch=2),
                        z, tile_latent=(th, tw), overlap=(oh, ow),
                        spatial_factor=p.vae.spatial_factor)
                else:
                    out = chunked_decode(self.vae, self.vae_params, z,
                                         frame_batch=2)
            else:
                out = decode(z)
        # Family decoders emit raw values (diffusers clamps in the pipeline).
        return self._decode_clip(out)

    def frames_to_uint8(self, frames):
        """[-1, 1] float frames -> uint8 ON DEVICE (matches
        ``blade.utils.video_io.to_uint8_frames``).  Convert before pulling
        frames to the host: a 480p clip is 370 MB as f32 vs 92 MB as uint8
        — on the tunneled dev runtime (~5 MB/s) that is the difference
        between 80 s and 20 s; on production PCIe it still quarters the
        transfer."""
        if not hasattr(self, "_to_u8"):
            self._to_u8 = jax.jit(lambda f: jnp.clip(
                (f.astype(jnp.float32) + 1.0) * 127.5, 0, 255
            ).astype(jnp.uint8))
        return self._to_u8(frames)

    def generate(
        self,
        text_embeds,
        *,
        rng,
        num_steps: int = 8,
        guidance_scale: float = 1.0,
        neg_text_embeds=None,
        tiled_vae: bool = False,
        mask_refresh_every: int = 0,
    ):
        latents = self.sample_latents(
            text_embeds, rng=rng, num_steps=num_steps,
            guidance_scale=guidance_scale, neg_text_embeds=neg_text_embeds,
            mask_refresh_every=mask_refresh_every,
        )
        return self.decode_latents(latents, tiled=tiled_vae)

    def generate_batch(
        self,
        text_embeds,
        seeds,
        *,
        num_steps: int = 8,
        guidance_scale: float = 1.0,
        neg_text_embeds=None,
        tiled_vae: bool = False,
    ):
        """Batched generation with independent per-sample seeds (the eval
        sampler's contract: seed = base + prompt_idx*1000 + video_idx).

        The initial noise is drawn per sample from its own key; the sampler
        itself is deterministic given the noise (the ASA subsampling uses a
        key folded from seed 0 — shared across the batch, matching the
        reference where torch's global RNG is shared too)."""
        seeds = jnp.asarray(seeds, jnp.uint32)
        b = text_embeds.shape[0]
        single = self.latent_shape(1)[1:]

        def one_noise(seed):
            return jax.random.normal(
                jax.random.PRNGKey(seed), single, jnp.float32
            )

        noise = jax.vmap(one_noise)(seeds).astype(self.dtype)
        from blade.sampling.pipeline import sample_cogvideox, sample_wan
        from blade.schedulers.ddpm import make_ddpm_schedule

        rng = jax.random.PRNGKey(jnp.asarray(seeds)[0])
        if self.preset.name == "wan":
            latents = sample_wan(
                self.model_fn(), noise, text_embeds, rng=rng,
                num_steps=num_steps, flow_shift=self.preset.flow_shift or 3.0,
                guidance_scale=guidance_scale, neg_text_embeds=neg_text_embeds,
            )
        else:
            latents = sample_cogvideox(
                self.model_fn(), noise, text_embeds, rng=rng,
                num_steps=num_steps, guidance_scale=guidance_scale,
                neg_text_embeds=neg_text_embeds,
                ddpm_schedule=make_ddpm_schedule(
                    snr_shift_scale=self.preset.snr_shift_scale,
                    rescale_betas_zero_snr=self.preset.rescale_betas_zero_snr,
                ),
            )
        return self.decode_latents(latents, tiled=tiled_vae)

    def make_dp_generate(
        self,
        mesh,
        *,
        num_steps: int = 8,
        guidance_scale: float = 1.0,
        tiled_vae: bool = False,
    ):
        """Jitted, data-parallel ``(embeds, seeds) -> frames`` over a mesh.

        The eval sampler's TPU answer to the reference's one-process-per-GPU
        workers (``simple_multiprocess_sampler.py:296-309``): params are
        replicated over the ``dp`` axis, the batch (prompt embeddings and
        per-sample seeds) is sharded over it, and XLA partitions the whole
        batched sampler.  Per-sample seed reproducibility is unchanged —
        noise is derived per sample from its own seed.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from blade.parallel import mesh as M

        self.dit_params = M.replicate(self.dit_params, mesh)
        self.vae_params = M.replicate(self.vae_params, mesh)
        if self.text_params is not None:
            self.text_params = M.replicate(self.text_params, mesh)

        batch_sharding = NamedSharding(mesh, P("dp"))

        @jax.jit
        def _generate(embeds, seeds):
            return self.generate_batch(
                embeds, seeds, num_steps=num_steps,
                guidance_scale=guidance_scale, tiled_vae=tiled_vae,
            )

        def generate_fn(embeds, seeds):
            embeds = jax.device_put(
                embeds, NamedSharding(mesh, P("dp", None, None))
            )
            seeds = jax.device_put(jnp.asarray(seeds, jnp.uint32),
                                   batch_sharding)
            return _generate(embeds, seeds)

        return generate_fn

    # ---------------------------------------------------------- init utils
    @classmethod
    def random_init(
        cls, preset: FamilyPreset, rng, *, sparse=True, mask_mode="multilevel",
        dtype=jnp.bfloat16, vae_dtype=jnp.float32, with_text_encoder=True,
        interpret=None,
    ):
        """Random-weight pipeline (smoke tests / benchmarking without ckpts)."""
        self = cls(
            preset=preset, dit_params=None, vae_params=None, text_params=None,
            sparse=sparse, mask_mode=mask_mode, dtype=dtype,
            vae_dtype=vae_dtype, interpret=interpret,
        )
        r1, r2, r3 = jax.random.split(rng, 3)
        lat = jnp.zeros(self.latent_shape(1), dtype)
        text = jnp.zeros((1, preset.max_text_len, preset.text.d_model), dtype)
        self.dit_params = self.dit.init(
            r1, lat, jnp.ones((1,)), text, attn_kwargs={"rng": r1}
        )
        t, h, w = preset.latent_grid()
        if preset.name == "wan":
            pt, ph, pw = preset.dit.patch_size
            zt = t * pt
        else:
            zt = t
        sf = preset.vae.spatial_factor
        # Init on a tiny latent: conv/norm params are shape-independent, and
        # tracing a full-size 480p decode would OOM the chip (VERDICT: the
        # real path decodes in streamed latent-frame chunks).
        z = jnp.zeros(
            (1, min(zt, 1), min(preset.video.height // sf, 8),
             min(preset.video.width // sf, 8), preset.vae.latent_channels),
            jnp.float32,
        )
        self.vae_params = self.vae.init(r2, z, method=self.vae.decode)
        if with_text_encoder:
            ids = jnp.zeros((1, preset.max_text_len), jnp.int32)
            self.text_params = self.text_encoder.init(r3, ids)
        return self
