"""Prompt-embedding preprocessing CLI (reference
``utils/process_prompts_cogvideox.py`` / ``process_prompts_wanx.py``).

Reads a prompt text file, shuffles with seed 42, encodes with the on-device
T5/UMT5 encoder in batches, and writes the data-free training layout:

  <out>/individual_embeddings/{i}.npy   per-prompt [1, L, D]
  <out>/shuffled_prompts.json
  <out>/uncond.npy                      empty-prompt embedding (" ")
  <out>/fixed.npy                       fixed validation prompt embedding
  <out>/negative.npy                    (wan) default negative prompt

Smoke mode (--random-init --tiny) uses random encoder weights and a trivial
hash tokenizer so the full layout can be produced without checkpoints.
"""

from __future__ import annotations

import argparse
import json
import os
import random

import jax
import jax.numpy as jnp
import numpy as np

FIXED_PROMPT = (
    "A panda, dressed in a small, red jacket and a tiny hat, sits on a wooden"
    " stool in a serene bamboo forest playing a miniature acoustic guitar."
)
WAN_NEGATIVE = (
    "bright colors, overexposed, static, blurred details, subtitles, style,"
    " artwork, painting, picture, still, overall gray, worst quality, low"
    " quality, JPEG artifacts, ugly, deformed, extra fingers, poorly drawn"
    " hands, poorly drawn face, malformed limbs, fused fingers, cluttered"
    " background, three legs, many people in the background, walking backwards"
)


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--input_file", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--family", choices=["wan", "cogvideox"], default="cogvideox")
    p.add_argument("--weights", type=str, help="HF-layout dir w/ text_encoder/")
    p.add_argument("--tokenizer_dir", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--tiny", action="store_true")
    return p.parse_args()


def main():
    args = get_args()
    from blade import config as C
    from blade.models.t5 import T5Encoder

    if args.tiny:
        preset = C.WAN_TINY_PRESET if args.family == "wan" else C.COGVIDEOX_TINY_PRESET
    else:
        preset = C.WAN_480P if args.family == "wan" else C.COGVIDEOX_480P

    with open(args.input_file) as f:
        prompts = [l.strip() for l in f if l.strip()]
    random.Random(args.seed).shuffle(prompts)

    enc = T5Encoder(preset.text, dtype=jnp.float32 if args.tiny else jnp.bfloat16)
    if args.random_init or not args.weights:
        if not args.random_init:
            raise SystemExit("--weights required (or --random-init)")
        params = enc.init(
            jax.random.PRNGKey(0), jnp.zeros((1, preset.max_text_len), jnp.int32)
        )

        def tokenize(batch):
            ids = np.stack([
                np.random.default_rng(abs(hash(p)) % 2**31)
                .integers(1, min(100, preset.text.vocab_size), preset.max_text_len)
                for p in batch
            ])
            return jnp.asarray(ids), jnp.ones_like(jnp.asarray(ids))
    else:
        from blade.convert.load import load_text_params

        params = load_text_params(args.weights, preset)
        from transformers import AutoTokenizer

        from blade.cli.inference import resolve_tokenizer_dir

        name = resolve_tokenizer_dir(args) or (
            "google/umt5-xxl" if preset.name == "wan" else "google/t5-v1_1-xxl"
        )
        tok = AutoTokenizer.from_pretrained(name)

        def tokenize(batch):
            e = tok(list(batch), padding="max_length", truncation=True,
                    max_length=preset.max_text_len, return_tensors="np")
            return jnp.asarray(e["input_ids"]), jnp.asarray(e["attention_mask"])

    encode = jax.jit(lambda ids, mask: enc.apply(params, ids, mask))

    out = args.output_dir
    os.makedirs(os.path.join(out, "individual_embeddings"), exist_ok=True)
    for i0 in range(0, len(prompts), args.batch_size):
        batch = prompts[i0 : i0 + args.batch_size]
        ids, mask = tokenize(batch)
        emb = np.asarray(encode(ids, mask), np.float32)
        for j, _ in enumerate(batch):
            np.save(os.path.join(out, "individual_embeddings", f"{i0 + j}.npy"),
                    emb[j : j + 1])
        print(f"encoded {min(i0 + args.batch_size, len(prompts))}/{len(prompts)}")

    with open(os.path.join(out, "shuffled_prompts.json"), "w") as f:
        json.dump(prompts, f)

    for name, text in [("uncond", " "), ("fixed", FIXED_PROMPT)] + (
        [("negative", WAN_NEGATIVE)] if preset.name == "wan" else []
    ):
        ids, mask = tokenize([text])
        np.save(os.path.join(out, f"{name}.npy"),
                np.asarray(encode(ids, mask), np.float32))
    print(f"wrote embeddings for {len(prompts)} prompts -> {out}")


if __name__ == "__main__":
    main()
