"""One-command real-weight parity harness (VERDICT r2 item 7).

Loads a diffusers-layout checkpoint dir (``transformer/ text_encoder/
vae/`` safetensors) through the converters, runs DENSE 8-step generation
at reference settings, and dumps a latent trace — or compares against a
previously dumped trace (ours, or one exported from the CUDA reference
stack with the companion script printed by ``--print-ref-script``).

Reference anchors: ``wanx/train/inference.py:49-50,88-97`` (flow UniPC,
shift 3.0, 8 steps, CFG 1.0), ``cogvideox/train/inference.py:64-90``
(trailing SDE-DPM++, 8 steps).

Examples:

  # dump a trace from a checkpoint (fake or real)
  python -m blade.cli.parity --family wan --weights /ckpts/wan \
      --dump /tmp/wan_trace.npz --tiny-geometry

  # compare a fresh run against a stored trace
  python -m blade.cli.parity --family wan --weights /ckpts/wan \
      --compare /tmp/wan_trace.npz --rtol 2e-3 --atol 2e-3

Exit code 0 = within tolerance, 1 = mismatch (prints a per-step table).
Without real checkpoints (zero-egress), tests exercise this end-to-end
via torch-layout reference models saved as synthetic safetensors dirs
(tests/test_parity_cli.py).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

__all__ = ["main", "run_parity_trace"]


def get_args(argv=None):
    p = argparse.ArgumentParser(description="BLADE-TPU dense parity harness")
    p.add_argument("--family", choices=["wan", "cogvideox"], default="wan")
    p.add_argument("--weights", required=True,
                   help="diffusers-layout dir with transformer/ [text_encoder/ vae/]")
    p.add_argument("--preset", default=None,
                   help="named preset (default: family 480p)")
    p.add_argument("--num_steps", type=int, default=8)
    p.add_argument("--guidance_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=8888)
    p.add_argument("--prompt_embeds", default=None,
                   help=".npy text embeddings [1, L, D]; default: "
                        "deterministic random embeds from --seed")
    p.add_argument("--dump", default=None, help="write trace .npz here")
    p.add_argument("--compare", default=None, help="compare against this .npz")
    p.add_argument("--rtol", type=float, default=2e-3)
    p.add_argument("--atol", type=float, default=2e-3)
    p.add_argument("--tiny-geometry", action="store_true",
                   help="9f 64x64 latents (CI-speed runs; the full 81f/49f "
                        "grids need a TPU)")
    p.add_argument("--decode", action="store_true",
                   help="also decode + include frames in the trace "
                        "(needs vae/ under --weights)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="f32 default: parity traces compare solver math, "
                        "not mixed-precision noise")
    return p.parse_args(argv)


def run_parity_trace(args):
    """Returns dict of numpy arrays: noise, per-step latents, final."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from blade import config as C
    from blade.convert.load import load_dit_params, load_vae_params
    from blade.sampling.pipeline import sample_cogvideox, sample_wan
    from blade.schedulers.ddpm import make_ddpm_schedule

    if args.preset:
        preset = C.PRESETS[args.preset]
    else:
        preset = C.WAN_480P if args.family == "wan" else C.COGVIDEOX_480P
    if args.tiny_geometry:
        preset = dataclasses.replace(
            preset, video=C.VideoSpec(9, 64, 64, preset.video.fps))

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    if args.family == "wan":
        from blade.models.wan_dit import WanModel

        model = WanModel(preset.dit, dtype=dtype)
    else:
        from blade.models.cogvideox_dit import CogVideoXModel

        model = CogVideoXModel(preset.dit, dtype=dtype)
    params = load_dit_params(args.weights, preset)

    t, h, w = preset.latent_grid()
    if preset.name == "wan":
        pt, ph, pw = preset.dit.patch_size
        lat_shape = (1, preset.dit.in_channels, t * pt, h * ph, w * pw)
    else:
        ps = preset.dit.patch_size
        lat_shape = (1, t, preset.dit.in_channels, h * ps, w * ps)

    rng = jax.random.PRNGKey(args.seed)
    noise = jax.random.normal(jax.random.fold_in(rng, 0), lat_shape,
                              jnp.float32)
    if args.prompt_embeds:
        text = jnp.asarray(np.load(args.prompt_embeds), dtype)
        assert text.ndim == 3 and text.shape[0] == 1, text.shape
    else:
        text_dim = getattr(preset.dit, "text_dim",
                           getattr(preset.dit, "text_embed_dim", None))
        text = jax.random.normal(
            jax.random.fold_in(rng, 1),
            (1, preset.max_text_len, text_dim), dtype)

    def model_fn(x, tt, txt, r):
        return model.apply(params, x, tt, txt)

    if preset.name == "wan":
        final, traj = jax.jit(lambda n, te: sample_wan(
            model_fn, n, te, rng=rng, num_steps=args.num_steps,
            flow_shift=preset.flow_shift or 3.0,
            guidance_scale=args.guidance_scale,
            return_trajectory=True))(noise, text)
    else:
        final, traj = jax.jit(lambda n, te: sample_cogvideox(
            model_fn, n, te, rng=rng, num_steps=args.num_steps,
            guidance_scale=args.guidance_scale,
            ddpm_schedule=make_ddpm_schedule(
                snr_shift_scale=preset.snr_shift_scale,
                rescale_betas_zero_snr=preset.rescale_betas_zero_snr),
            return_trajectory=True))(noise, text)

    trace = {
        "noise": np.asarray(noise, np.float32),
        "text_embeds": np.asarray(text, np.float32),
        "latents_steps": np.asarray(traj, np.float32),
        "latents_final": np.asarray(final, np.float32),
        "meta": np.frombuffer(json.dumps({
            "family": preset.name, "num_steps": args.num_steps,
            "seed": args.seed, "guidance": args.guidance_scale,
            "lat_shape": list(lat_shape), "dtype": args.dtype,
        }).encode(), np.uint8),
    }
    if args.decode:
        from blade.sampling.t2v import T2VPipeline

        pipe = T2VPipeline(
            preset=preset, dit_params=params,
            vae_params=load_vae_params(args.weights, preset),
            sparse=False, dtype=dtype)
        trace["frames"] = np.asarray(
            pipe.decode_latents(final.astype(dtype)), np.float32)
    return trace


def compare_traces(got, ref, rtol, atol, log=print):
    """Per-step diff table; returns True when every step is in tolerance."""
    ok = True
    gs, rs = got["latents_steps"], ref["latents_steps"]
    if gs.shape != rs.shape:
        log(f"SHAPE MISMATCH: {gs.shape} vs {rs.shape}")
        return False
    log(f"{'step':>4} {'max_abs':>12} {'mean_abs':>12} {'rel@max':>12}")
    for i in range(gs.shape[0]):
        d = np.abs(gs[i] - rs[i])
        scale = np.abs(rs[i]).max() + 1e-12
        step_ok = np.allclose(gs[i], rs[i], rtol=rtol, atol=atol)
        log(f"{i:>4} {d.max():>12.3e} {d.mean():>12.3e} "
            f"{d.max() / scale:>12.3e} {'' if step_ok else '  <-- FAIL'}")
        ok = ok and step_ok
    d = np.abs(got["latents_final"] - ref["latents_final"])
    log(f"final max_abs={d.max():.3e} mean_abs={d.mean():.3e}")
    ok = ok and np.allclose(got["latents_final"], ref["latents_final"],
                            rtol=rtol, atol=atol)
    return ok


def main(argv=None):
    from blade.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    args = get_args(argv)
    trace = run_parity_trace(args)
    if args.dump:
        np.savez_compressed(args.dump, **trace)
        print(f"wrote trace ({trace['latents_steps'].shape[0]} steps, "
              f"shape {trace['latents_final'].shape}) -> {args.dump}")
    if args.compare:
        ref = dict(np.load(args.compare))
        ok = compare_traces(trace, ref, args.rtol, args.atol)
        print("PARITY OK" if ok else "PARITY FAIL")
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
