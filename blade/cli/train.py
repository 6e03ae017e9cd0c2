"""TDM distillation training CLI (mirrors the reference
``train_cogvideo_tdm.py`` / ``train_wanx_tdm.py`` launch surface).

Data-free: consumes a directory of precomputed prompt embeddings (see
``blade.cli.process_prompts``).  Example:

  python -m blade.cli.train --family wan --weights /ckpts/wan \
      --prompt_embeds prompts/ --max_train_steps 300 --batch_size 5 \
      --k_step 8 --cfg 5.0 --eta 0.9 --lambda_reg 0 \
      --checkpointing_steps 50 --output_dir runs/wan_tdm

  python -m blade.cli.train --family wan --tiny --random-init \
      --max_train_steps 2 --batch_size 2 --output_dir /tmp/tdm  # smoke
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def get_args():
    p = argparse.ArgumentParser(description="BLADE-TPU TDM distillation")
    p.add_argument("--family", choices=["wan", "cogvideox"], default="wan")
    p.add_argument("--weights", type=str)
    p.add_argument("--prompt_embeds", type=str,
                   help="dir with individual_embeddings/*.npy + uncond.npy")
    p.add_argument("--output_dir", type=str, required=True)
    # TDM hparams (reference train_tdm_1.sh defaults)
    p.add_argument("--k_step", type=int, default=8)
    p.add_argument("--eta", type=float, default=0.9)
    p.add_argument("--cfg", type=float, default=3.5)
    p.add_argument("--lambda_reg", type=float, default=0.5)
    p.add_argument("--learning_rate_g", type=float, default=1e-4)
    p.add_argument("--learning_rate_fake", type=float, default=5e-4)
    p.add_argument("--adam_beta1", type=float, default=0.0)
    p.add_argument("--adam_beta2", type=float, default=0.95)
    p.add_argument("--adam_weight_decay", type=float, default=1e-4)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    # Generator LR schedule (reference get_scheduler surface; the launch
    # recipe uses cosine_with_restarts + 5 warmup steps, train_tdm_1.sh).
    p.add_argument("--lr_scheduler", default="constant",
                   choices=["constant", "constant_with_warmup", "linear",
                            "cosine", "cosine_with_restarts", "polynomial"])
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--lr_num_cycles", type=int, default=1)
    p.add_argument("--lr_power", type=float, default=1.0)
    # Prodigy sub-knobs (reference train_cogvideo_tdm.py:475-511).
    p.add_argument("--prodigy_beta3", type=float, default=None)
    p.add_argument("--prodigy_decouple", action="store_true", default=True)
    p.add_argument("--no_prodigy_decouple", dest="prodigy_decouple",
                   action="store_false")
    p.add_argument("--prodigy_use_bias_correction", action="store_true",
                   default=True)
    p.add_argument("--prodigy_safeguard_warmup", action="store_true",
                   default=False)
    p.add_argument("--rank", type=int, default=64)
    p.add_argument("--lora_alpha", type=float, default=64)
    p.add_argument("--optimizer", choices=["adamw", "adam", "prodigy"],
                   default="adamw",
                   help="optimizer family (reference --optimizer; prodigy "
                        "via optax.contrib)")
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="low-memory optimizer state (bf16 moments on TPU — "
                        "the int8 bitsandbytes analogue)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="gradient accumulation steps (reference x4)")
    p.add_argument("--report_to", choices=["none", "tensorboard"],
                   default="none",
                   help="offline tensorboard event files in "
                        "<output_dir>/tb (metrics.jsonl is always written)")
    p.add_argument("--batch_size", type=int, default=5)
    p.add_argument("--max_train_steps", type=int, default=None,
                   help="total optimizer steps; overrides --num_train_epochs"
                        " (default: epochs x prompts/batch, or 300 without"
                        " a prompt store)")
    p.add_argument("--num_train_epochs", type=int, default=1,
                   help="epochs over the prompt-embedding store "
                        "(reference train_cogvideo_tdm.py:331,1558)")
    p.add_argument("--use_sparsity", action="store_true", default=True)
    p.add_argument("--dense", dest="use_sparsity", action="store_false")
    # checkpointing
    p.add_argument("--checkpointing_steps", type=int, default=50)
    p.add_argument("--sample_at_checkpoint", action="store_true",
                   help="decode fixed-prompt validation videos at each "
                        "checkpoint (reference train_cogvideo_tdm.py:1742)")
    p.add_argument("--checkpoints_total_limit", type=int, default=5)
    p.add_argument("--resume_from_checkpoint", type=str, default=None,
                   help='"latest" or a step number')
    # mesh
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--video", type=int, nargs=3, metavar=("F", "H", "W"),
                   default=None,
                   help="override frames/height/width (e.g. 17 240 416 for "
                        "memory-constrained single-chip runs)")
    p.add_argument("--remat", action="store_true", default=None,
                   help="activation rematerialization in the DiT blocks "
                        "(default: on for full-size presets)")
    return p.parse_args()


def main():
    from blade.parallel.launch import maybe_initialize_distributed

    maybe_initialize_distributed()
    from blade.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    args = get_args()
    from blade import config as C
    from blade.config import derive_asa_config
    from blade.models.cogvideox_dit import CogVideoXModel
    from blade.models.wan_dit import WanModel
    from blade.parallel import mesh as M
    from blade.schedulers import ddpm as D
    from blade.schedulers import unipc_flow as F
    from blade.training import tdm
    from blade.training.checkpointing import CheckpointManager

    if args.tiny:
        preset = C.WAN_TINY_PRESET if args.family == "wan" else C.COGVIDEOX_TINY_PRESET
        dtype = jnp.float32
    else:
        preset = C.WAN_480P if args.family == "wan" else C.COGVIDEOX_480P
        dtype = jnp.bfloat16
    if args.video:
        import dataclasses as _dc

        f_, h_, w_ = args.video
        preset = _dc.replace(
            preset, video=C.VideoSpec(f_, h_, w_, preset.video.fps)
        )

    kwargs = {}
    if args.use_sparsity:
        from blade.attention.integration import asa_model_kwargs

        kwargs = asa_model_kwargs(derive_asa_config(preset, "energy"))
    remat = args.remat if args.remat is not None else not args.tiny
    kwargs["remat"] = remat
    if preset.name == "wan":
        model = WanModel(preset.dit, dtype=dtype, **kwargs)
        family = tdm.flow_family(
            F.flow_training_sigmas(1000, preset.flow_shift or 3.0)
        )
    else:
        model = CogVideoXModel(preset.dit, dtype=dtype, **kwargs)
        family = tdm.ddpm_family(D.make_ddpm_schedule(
            snr_shift_scale=preset.snr_shift_scale,
            rescale_betas_zero_snr=preset.rescale_betas_zero_snr,
        ))

    t, h, w = preset.latent_grid()
    if preset.name == "wan":
        pt, ph, pw = preset.dit.patch_size
        lat_shape = (args.batch_size, preset.dit.in_channels, t * pt, h * ph, w * pw)
    else:
        p_ = preset.dit.patch_size
        lat_shape = (args.batch_size, t, preset.dit.in_channels, h * p_, w * p_)

    rng = jax.random.PRNGKey(args.seed)
    text_dim = preset.text.d_model
    dummy_text = jnp.zeros((args.batch_size, preset.max_text_len, text_dim), dtype)

    if args.random_init or not args.weights:
        if not args.random_init:
            raise SystemExit("--weights required (or --random-init)")
        base_params = model.init(
            rng, jnp.zeros(lat_shape, dtype), jnp.ones((args.batch_size,)),
            dummy_text, attn_kwargs={"rng": rng},
        )
    else:
        from blade.convert.load import load_dit_params

        base_params = load_dit_params(args.weights, preset)
    if not args.tiny:
        # Frozen base lives in bf16: three merged roles of a 1.3B+ model in
        # f32 would exhaust single-chip HBM (LoRA factors/optimizer stay f32).
        base_params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            base_params,
        )

    # Prompt embedding source: precomputed dir (data-free) or random smoke.
    # A packed native store (with background prefetch) is built on first use;
    # the reference reloads a pickle per sample per step instead.
    store = None
    uncond_np = None
    if args.prompt_embeds:
        from blade import native

        base = args.prompt_embeds
        packed = os.path.join(base, "store.bin")
        if not os.path.exists(packed):
            native.pack_embeddings(
                os.path.join(base, "individual_embeddings"), packed
            )
        store = native.EmbedStore(packed)
        uncond_np = np.load(os.path.join(base, "uncond.npy"))

    if args.max_train_steps is None:
        # Reference epoch semantics (train_cogvideo_tdm.py:1278,1558):
        # max_train_steps = num_train_epochs x optimizer steps per pass
        # over the prompt store (per-process batch x process count stride).
        if store is not None:
            steps_per_epoch = -(-len(store) // (
                args.batch_size * jax.process_count() * args.grad_accum))
        else:
            steps_per_epoch = 300
        args.max_train_steps = args.num_train_epochs * steps_per_epoch

    cfg = tdm.TDMConfig(
        k_step=args.k_step, eta=args.eta, cfg=args.cfg,
        lambda_reg=args.lambda_reg, lr_generator=args.learning_rate_g,
        lr_fake=args.learning_rate_fake, adam_b1=args.adam_beta1,
        adam_b2=args.adam_beta2, max_grad_norm=args.max_grad_norm,
        lora_rank=args.rank, lora_alpha=args.lora_alpha,
        use_weighting_factor=preset.name == "cogvideox",
        fake_loss_skip_threshold=2.0 if preset.name == "wan" else None,
        optimizer=args.optimizer,
        optimizer_state_bf16=args.use_8bit_adam,
        grad_accum=args.grad_accum,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        lr_num_cycles=args.lr_num_cycles,
        lr_power=args.lr_power,
        max_train_steps=args.max_train_steps,
        weight_decay=args.adam_weight_decay,
        adam_eps=args.adam_epsilon,
        prodigy_beta3=args.prodigy_beta3,
        prodigy_decouple=args.prodigy_decouple,
        prodigy_use_bias_correction=args.prodigy_use_bias_correction,
        prodigy_safeguard_warmup=args.prodigy_safeguard_warmup,
    )

    def apply_fn(p, x, tt, txt, r):
        return model.apply(p, x, tt, txt, attn_kwargs={"rng": r})

    state = tdm.create_tdm_state(jax.random.fold_in(rng, 1), base_params, cfg)
    mesh = M.make_mesh(dp=args.dp, fsdp=args.fsdp, tp=args.tp)
    if args.dp * args.fsdp * args.tp > 1:
        state = state.replace(
            base_params=M.shard_params(state.base_params, mesh),
            lora_g=M.replicate(state.lora_g, mesh),
            lora_f=M.replicate(state.lora_f, mesh),
            opt_g=M.replicate(state.opt_g, mesh),
            opt_f=M.replicate(state.opt_f, mesh),
        )

    ckpt = CheckpointManager(
        os.path.join(args.output_dir, "checkpoints"),
        max_to_keep=args.checkpoints_total_limit,
    )
    if args.resume_from_checkpoint:
        step = (None if args.resume_from_checkpoint == "latest"
                else int(args.resume_from_checkpoint))
        state = ckpt.restore(state, step)
        print(f"resumed from step {int(state.step)}")

    def load_batch(step_idx, r):
        if store is not None:
            # Globally strided, non-overlapping shards (the reference's
            # `rank*600 + step` hardcode breaks past 600 steps; SURVEY §7
            # lists it as a quirk not to replicate).
            idx0 = (step_idx * jax.process_count()
                    + jax.process_index()) * args.batch_size
            idxs = [(idx0 + i) % len(store) for i in range(args.batch_size)]
            # warm the page cache for the NEXT step while this one computes
            store.prefetch([(i + args.batch_size) % len(store) for i in idxs])
            text = jnp.asarray(
                np.concatenate([store.get(i) for i in idxs], 0), dtype
            )
            uncond = jnp.broadcast_to(jnp.asarray(uncond_np, dtype), text.shape)
        else:
            text = jax.random.normal(
                jax.random.fold_in(r, 1),
                (args.batch_size, preset.max_text_len, text_dim), dtype,
            )
            uncond = jnp.zeros_like(text)
        noise = jax.random.normal(jax.random.fold_in(r, 2), lat_shape, dtype)
        return {"text_embeds": text, "uncond_embeds": uncond, "noise": noise}

    train_step = jax.jit(tdm.make_tdm_train_step(apply_fn, family, cfg))
    os.makedirs(args.output_dir, exist_ok=True)
    metrics_log = open(os.path.join(args.output_dir, "metrics.jsonl"), "a")
    tb_writer = None
    if args.report_to == "tensorboard":
        # tensorboardX writes event files locally — no egress required
        # (reference --report_to, train_cogvideo_tdm.py:562-570).
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(os.path.join(args.output_dir, "tb"))
    print(f"training {args.max_train_steps} steps, batch {args.batch_size}, "
          f"mesh dp={args.dp} fsdp={args.fsdp} tp={args.tp}")
    t0 = time.time()
    steps_done = 0
    for step_idx in range(int(state.step), args.max_train_steps):
        r = jax.random.fold_in(rng, 1000 + step_idx)
        batch = load_batch(step_idx, r)
        if args.dp * args.fsdp * args.tp > 1:
            batch = M.shard_batch(batch, mesh)
        state, metrics = train_step(state, batch, r)
        steps_done += 1
        lf, lg = float(metrics["loss_fake"]), float(metrics["loss_du"])
        rec = {"step": step_idx, "loss_fake": lf, "loss_du": lg,
               "t": time.time()}
        lr_str = ""
        if "lr" in metrics:
            rec["lr"] = float(metrics["lr"])
            lr_str = f" lr={rec['lr']:.2e}"
        print(f"step {step_idx}: loss_fake={lf:.4f} loss_du={lg:.4f}{lr_str} "
              f"({(time.time() - t0) / steps_done:.1f}s/step)")
        import json as _json

        metrics_log.write(_json.dumps(rec) + "\n")
        metrics_log.flush()
        if tb_writer is not None:
            tb_writer.add_scalar("loss_fake", lf, step_idx)
            tb_writer.add_scalar("loss_du", lg, step_idx)
        if (step_idx + 1) % args.checkpointing_steps == 0:
            ckpt.save(step_idx + 1, state)
            print(f"saved checkpoint @ {step_idx + 1}")
            if args.sample_at_checkpoint:
                sample_validation_videos(
                    args, preset, model, family, cfg, state, batch, r, step_idx
                )

    # Final: export merged-ready LoRA adapter.

    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, "tdm_lora.npz")
    np.savez(out, lora=np.asarray(
        jax.tree_util.tree_map(np.asarray, state.lora_g), dtype=object
    ))
    if tb_writer is not None:
        tb_writer.close()
    print(f"wrote {out}")


if __name__ == "__main__":
    main()


def sample_validation_videos(args, preset, model, family, cfg, state, batch,
                             rng, step_idx):
    """Decode K-step student samples at a checkpoint (reference behavior:
    fixed + batch prompts, VAE decode, grid mp4 — train_cogvideo_tdm.py:
    1742-1762).  Uses a random-init VAE when no weights are given (smoke)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from blade.models.vae import build_vae
    from blade.training import lora as lora_lib
    from blade.training import tdm as tdm_lib
    from blade.utils.video_io import save_videos_grid

    if cfg.train_full_model:
        student = state.lora_g
    else:
        student = lora_lib.merge_lora(
            state.base_params, state.lora_g, alpha=cfg.lora_alpha,
            rank=cfg.lora_rank,
        )

    def apply_fn(p, x, tt, txt, r):
        return model.apply(p, x, tt, txt, attn_kwargs={"rng": r})

    noise = batch["noise"]
    x0s, _ = tdm_lib.k_step_trajectory(
        apply_fn, student, family, noise, batch["text_embeds"], rng,
        k_step=cfg.k_step, eta=cfg.eta,
    )
    latents = x0s[-1]

    vae = build_vae(preset.vae)
    if preset.name == "wan":
        z = jnp.transpose(latents, (0, 2, 3, 4, 1)).astype(jnp.float32)
    else:
        z = jnp.transpose(latents, (0, 1, 3, 4, 2)).astype(jnp.float32)
    z = z / preset.vae.scaling_factor
    if getattr(preset.vae, "latents_mean", None) is not None:
        # Wan latent de-normalization before decode
        # (train_wanx_tdm.py:1822-1829).
        z = z * jnp.asarray(preset.vae.latents_std) \
            + jnp.asarray(preset.vae.latents_mean)
    if getattr(args, "weights", None) and not args.random_init:
        from blade.convert.load import load_vae_params

        vae_params = load_vae_params(args.weights, preset)
    else:
        # Shape-independent init on a tiny latent (full-size traces OOM).
        vae_params = vae.init(
            jax.random.PRNGKey(0), z[:, :1, :8, :8], method=vae.decode
        )
    from blade.models.vae_wan import WanVAE, streaming_decode

    if isinstance(vae, WanVAE) and z.shape[1] > 2:
        frames = streaming_decode(vae, vae_params, z, chunk_latents=1)
    else:
        frames = vae.apply(vae_params, z, method=vae.decode)
    frames = np.clip(frames, -1.0, 1.0)
    import os

    out = os.path.join(args.output_dir, f"videos_{step_idx + 1}.mp4")
    path = save_videos_grid(np.asarray(frames), out, fps=preset.video.fps)
    print(f"validation videos -> {path}")
