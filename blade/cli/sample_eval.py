"""VBench evaluation sampler CLI (reference
``simple_multiprocess_sampler.py`` — JSON-config driven batch sampler with
the VBench filename contract, per-video seeds, and skip-existing resume).

  python -m blade.cli.sample_eval --config configs/eval.json \
      --family wan --weights /ckpts/wan --lora /ckpts/tdm_lora.npz \
      --prompts all_dimension.txt
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, help="sampler JSON config")
    p.add_argument("--prompts", type=str, required=True)
    p.add_argument("--naming_prompts", type=str,
                   help="optional parallel file for output names")
    p.add_argument("--family", choices=["wan", "cogvideox"], default="wan")
    p.add_argument("--weights", type=str)
    p.add_argument("--tokenizer_dir", type=str, default=None)
    p.add_argument("--lora", type=str)
    p.add_argument("--output_dir", type=str)
    p.add_argument("--sparse", action="store_true", default=True)
    p.add_argument("--dense", dest="sparse", action="store_false")
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel devices for batched generation "
                        "(0 = all local devices, 1 = off)")
    return p.parse_args()


def main():
    from blade.parallel.launch import maybe_initialize_distributed

    maybe_initialize_distributed()
    from blade.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    args = get_args()
    from blade.cli.inference import build_pipeline
    from blade.evalsuite.sampler import SamplerConfig, run_sampler

    if args.config:
        cfg = SamplerConfig.from_json(args.config)
    else:
        cfg = SamplerConfig(output_dir=args.output_dir or "eval_out")
    if args.output_dir:
        cfg.output_dir = args.output_dir

    pipe = build_pipeline(args)
    preset = pipe.preset
    cfg.fps = preset.video.fps

    with open(args.prompts) as f:
        prompts = [l.strip() for l in f if l.strip()]

    if args.random_init:
        def embeds_fn(batch):
            ids = jnp.asarray(np.stack([
                np.random.default_rng(abs(hash(p)) % 2**31)
                .integers(1, 100, preset.max_text_len) for p in batch
            ]))
            return pipe.encode_prompts(ids, jnp.ones_like(ids))
    else:
        from blade.cli.inference import resolve_tokenizer_dir, tokenize

        tok_dir = resolve_tokenizer_dir(args)

        def embeds_fn(batch):
            ids, mask = tokenize(preset, batch, tok_dir)
            return pipe.encode_prompts(ids, mask)

    # Batched generation jitted over a local dp mesh: every local chip
    # works on a slice of the batch (the reference used one worker process
    # per GPU; here XLA partitions one program).
    dp = args.dp or jax.local_device_count()
    if dp > 1:
        from blade.parallel import mesh as M

        if cfg.batch_size % dp:
            cfg.batch_size = -(-cfg.batch_size // dp) * dp
            print(f"batch_size rounded up to {cfg.batch_size} (dp={dp})")
        mesh = M.make_mesh(dp=dp, devices=jax.local_devices()[:dp])
        dp_generate = pipe.make_dp_generate(
            mesh, num_steps=cfg.num_steps,
            guidance_scale=cfg.guidance_scale,
        )

        def generate_fn(embeds, seeds):
            return np.asarray(dp_generate(embeds, seeds))
    else:
        def generate_fn(embeds, seeds):
            frames = pipe.generate_batch(
                embeds, seeds, num_steps=cfg.num_steps,
                guidance_scale=cfg.guidance_scale,
            )
            return np.asarray(frames)

    stats = run_sampler(generate_fn, embeds_fn, prompts, cfg)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
