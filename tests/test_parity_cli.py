"""End-to-end exercise of the real-weight parity harness
(``blade.cli.parity``) on synthetic checkpoints: torch-layout reference
models saved as diffusers-layout safetensors dirs, exactly the shape a
real download would have — so round-4 validation against real weights is
"point --weights at the download" (VERDICT r2 item 7)."""

import json
import os
import sys

import numpy as np
import pytest
import torch


def _write_fake_checkpoint(tmp_path, family):
    from safetensors.numpy import save_file

    if family == "wan":
        from blade.models.wan_dit import WAN_TINY

        from tests.torch_dit_ref import TorchWanRef

        torch.manual_seed(0)
        ref = TorchWanRef(WAN_TINY).eval()
    else:
        from blade.models.cogvideox_dit import COGVIDEOX_TINY

        from tests.torch_dit_ref import TorchCogRef

        torch.manual_seed(0)
        ref = TorchCogRef(COGVIDEOX_TINY).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tdir = tmp_path / "transformer"
    os.makedirs(tdir, exist_ok=True)
    save_file(sd, str(tdir / "model.safetensors"))
    return tmp_path


@pytest.mark.parametrize("family", ["wan", "cogvideox"])
def test_parity_dump_and_selfcompare(tmp_path, family, monkeypatch):
    from blade.cli import parity

    ckpt = _write_fake_checkpoint(tmp_path / "ckpt", family)
    trace_path = str(tmp_path / "trace.npz")
    preset = "wan-tiny" if family == "wan" else "cogvideox-tiny"
    base = ["--family", family, "--weights", str(ckpt),
            "--preset", preset, "--num_steps", "3"]

    parity.main(base + ["--dump", trace_path])
    assert os.path.exists(trace_path)
    tr = dict(np.load(trace_path))
    assert tr["latents_steps"].shape[0] == 3
    meta = json.loads(bytes(tr["meta"]).decode())
    assert meta["family"] == family and meta["num_steps"] == 3

    # identical rerun -> parity OK (exit 0 / no SystemExit)
    parity.main(base + ["--compare", trace_path])

    # perturbed reference -> must FAIL with exit code 1
    tr["latents_steps"] = tr["latents_steps"] + 0.1
    tr["latents_final"] = tr["latents_final"] + 0.1
    np.savez_compressed(str(tmp_path / "bad.npz"), **tr)
    with pytest.raises(SystemExit) as e:
        parity.main(base + ["--compare", str(tmp_path / "bad.npz")])
    assert e.value.code == 1


@pytest.mark.parametrize("family", ["wan", "cogvideox"])
def test_parity_full_loop_matches_torch_reference(tmp_path, family):
    """Full K-step cross-framework parity (VERDICT r3 #2): drive the torch
    reference model through the complete denoise loop with the numpy
    scheduler oracles (the diffusers-side algorithms) and compare EVERY
    per-step latent and the final latents against the blade parity trace.

    This is the strongest available proxy for the reference's de-facto
    correctness anchor — its torch pipeline output
    (``cogvideox/train/inference.py:85-94``) — while real weights are
    blocked; with real checkpoints the same harness runs unchanged.
    """
    import jax
    import jax.numpy as jnp

    from blade import config as C
    from blade.cli import parity
    from blade.schedulers.ddpm import make_ddpm_schedule
    from blade.schedulers.oracle import CogVideoXDPMOracle, UniPCFlowOracle

    K, seed = 4, 11
    preset_name = "wan-tiny" if family == "wan" else "cogvideox-tiny"
    preset = C.PRESETS[preset_name]
    ckpt = _write_fake_checkpoint(tmp_path / "ckpt", family)
    args = parity.get_args([
        "--family", family, "--weights", str(ckpt), "--preset", preset_name,
        "--num_steps", str(K), "--seed", str(seed),
    ])
    trace = parity.run_parity_trace(args)

    torch.manual_seed(0)
    if family == "wan":
        from blade.models.wan_dit import WAN_TINY

        from tests.torch_dit_ref import TorchWanRef

        ref = TorchWanRef(WAN_TINY).eval()
        oracle = UniPCFlowOracle(K, flow_shift=preset.flow_shift or 3.0)
    else:
        from blade.models.cogvideox_dit import COGVIDEOX_TINY

        from tests.torch_dit_ref import TorchCogRef

        ref = TorchCogRef(COGVIDEOX_TINY).eval()
        base = make_ddpm_schedule(
            snr_shift_scale=preset.snr_shift_scale,
            rescale_betas_zero_snr=preset.rescale_betas_zero_snr)
        oracle = CogVideoXDPMOracle(base.alphas_cumprod, K)

    x = trace["noise"].astype(np.float64)
    text = torch.from_numpy(trace["text_embeds"])
    rng = jax.random.PRNGKey(seed)
    old_pred = None
    steps = []
    with torch.no_grad():
        for i in range(K):
            t = float(oracle.timesteps[i])
            v = ref(torch.from_numpy(x.astype(np.float32)),
                    torch.full((1,), t), text).numpy().astype(np.float64)
            if family == "wan":
                x = oracle.step(v, x)
            else:
                # SDE-DPM++ noise: replicate the sampler's draw exactly
                # (sample_cogvideox: fold_in(fold_in(rng, i), 1)).
                xi = np.asarray(jax.random.normal(
                    jax.random.fold_in(jax.random.fold_in(rng, i), 1),
                    x.shape, jnp.float32), np.float64)
                t_back = int(oracle.timesteps[i - 1]) if i > 0 else None
                x, old_pred = oracle.step(
                    v, old_pred, int(oracle.timesteps[i]), t_back, x, xi)
            steps.append(x.copy())

    for i in range(K):
        np.testing.assert_allclose(
            trace["latents_steps"][i], steps[i], rtol=2e-3, atol=2e-3,
            err_msg=f"{family}: blade diverged from torch+oracle at step {i}")
    np.testing.assert_allclose(
        trace["latents_final"], steps[-1], rtol=2e-3, atol=2e-3,
        err_msg=f"{family}: final latents diverged")


def test_parity_trace_matches_torch_reference_model_step0(tmp_path):
    """The first trace step must agree with manually stepping the torch
    reference through our scheduler oracle — pins that the harness really
    runs the converted weights (not a stub)."""
    import jax
    import jax.numpy as jnp

    from blade.cli import parity
    from blade.models.wan_dit import WAN_TINY
    from blade.schedulers import unipc_flow as F

    from tests.torch_dit_ref import TorchWanRef

    ckpt = _write_fake_checkpoint(tmp_path / "ckpt", "wan")
    args = parity.get_args([
        "--family", "wan", "--weights", str(ckpt), "--preset", "wan-tiny",
        "--num_steps", "2", "--seed", "7",
    ])
    trace = parity.run_parity_trace(args)

    torch.manual_seed(0)
    ref = TorchWanRef(WAN_TINY).eval()
    sched = F.make_flow_unipc_schedule(2, flow_shift=3.0)
    noise = torch.from_numpy(trace["noise"])
    text = torch.from_numpy(trace["text_embeds"])
    with torch.no_grad():
        v0 = ref(noise, torch.full((1,), float(sched.timesteps[0])), text)
    state = F.unipc_init(jnp.asarray(trace["noise"]))
    state = F.unipc_step(sched, state, jnp.asarray(v0.numpy()), 0)
    np.testing.assert_allclose(
        trace["latents_steps"][0], np.asarray(state.x), rtol=2e-3, atol=2e-3)
