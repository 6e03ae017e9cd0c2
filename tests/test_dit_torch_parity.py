"""Numerical converter validation: tiny torch models with the exact
diffusers state-dict layout (tests/torch_dit_ref.py) are converted by
``blade.convert.dit_convert`` and must agree with the Flax DiTs forward —
this pins every transpose, QK-norm placement, RoPE convention, AdaLN
chunk order, and the un-patchify feature order (VERDICT r1 item 6).

Tolerance note (ADVICE r4): the fused norm+rope lane (kernels/norm_rope.py)
keeps f32 through RoPE while the torch reference casts to bf16 between norm
and rope — in bf16 runs that is a real (precision-IMPROVING) drift of up to
~4e-2 (see tests/test_norm_rope.py).  These parity tests run in f32 where
both lanes agree to 2e-4; don't tighten the bf16 tolerances elsewhere and
misattribute the cast-point difference to a bug."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from blade.convert.dit_convert import (
    convert_cogvideox_transformer,
    convert_wan_transformer,
)
from blade.models.cogvideox_dit import COGVIDEOX_TINY, CogVideoXModel
from blade.models.wan_dit import WAN_TINY, WanModel

from tests.torch_dit_ref import TorchCogRef, TorchWanRef


def test_wan_converter_forward_parity():
    torch.manual_seed(0)
    ref = TorchWanRef(WAN_TINY).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_wan_transformer(sd, WAN_TINY)

    b = 2
    latents = torch.randn(b, 16, 2, 8, 8)
    timestep = torch.tensor([100.0, 700.0])
    text = torch.randn(b, 7, WAN_TINY.text_dim)
    with torch.no_grad():
        want = ref(latents, timestep, text).numpy()

    model = WanModel(WAN_TINY, dtype=jnp.float32)
    got = model.apply(
        params, jnp.asarray(latents.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(text.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_wan_i2v_converter_forward_parity():
    """I2V image branch active (VERDICT r2 item 10): image-context tokens
    prepended to the text context, added K/V cross-attention branch
    (reference modify_wan.py:88-91,118-135)."""
    import dataclasses

    cfg = dataclasses.replace(WAN_TINY, image_dim=48, image_context_tokens=5)
    torch.manual_seed(3)
    ref = TorchWanRef(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    assert "blocks.0.attn2.add_k_proj.weight" in sd
    assert "condition_embedder.image_embedder.norm1.weight" in sd
    params = convert_wan_transformer(sd, cfg)

    b = 2
    latents = torch.randn(b, 16, 2, 8, 8)
    timestep = torch.tensor([100.0, 700.0])
    text = torch.randn(b, 7, cfg.text_dim)
    img = torch.randn(b, cfg.image_context_tokens, cfg.image_dim)
    with torch.no_grad():
        want = ref(latents, timestep, text, image_embeds=img).numpy()
        want_no_equal = ref(latents, timestep, text,
                            image_embeds=torch.zeros_like(img)).numpy()
    assert np.abs(want - want_no_equal).max() > 1e-5  # branch is live

    model = WanModel(cfg, dtype=jnp.float32)
    got = model.apply(
        params, jnp.asarray(latents.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(text.numpy()), image_embeds=jnp.asarray(img.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_cogvideox_converter_forward_parity():
    torch.manual_seed(1)
    ref = TorchCogRef(COGVIDEOX_TINY).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_cogvideox_transformer(sd, COGVIDEOX_TINY)

    b = 2
    latents = torch.randn(b, 3, 16, 8, 8)  # [B, T, C, H, W]
    timestep = torch.tensor([100.0, 700.0])
    text = torch.randn(b, 5, COGVIDEOX_TINY.text_embed_dim)
    with torch.no_grad():
        want = ref(latents, timestep, text).numpy()

    model = CogVideoXModel(COGVIDEOX_TINY, dtype=jnp.float32)
    got = model.apply(
        params, jnp.asarray(latents.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(text.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_wan_parity_is_sensitive_to_transposes():
    """Sanity: a deliberately transposed q-projection must break parity
    (guards against a test that would pass vacuously)."""
    torch.manual_seed(2)
    ref = TorchWanRef(WAN_TINY).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd["blocks.0.attn1.to_q.weight"] = sd["blocks.0.attn1.to_q.weight"].T
    params = convert_wan_transformer(sd, WAN_TINY)
    latents = torch.randn(1, 16, 2, 8, 8)
    timestep = torch.tensor([500.0])
    text = torch.randn(1, 7, WAN_TINY.text_dim)
    with torch.no_grad():
        want = ref(latents, timestep, text).numpy()
    model = WanModel(WAN_TINY, dtype=jnp.float32)
    got = model.apply(
        params, jnp.asarray(latents.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(text.numpy()),
    )
    assert np.abs(np.asarray(got) - want).max() > 1e-3
