"""Learning-rate schedules matching HuggingFace ``get_scheduler`` semantics.

The reference trainer builds its generator LR schedule through
``diffusers.optimization.get_scheduler`` (train_cogvideo_tdm.py:1291-1297)
and steps it once per optimizer step (:1739); the launch recipe uses
``--lr_scheduler cosine_with_restarts --lr_warmup_steps 5 --lr_num_cycles 1``
(train_tdm_1.sh:23-25).  Only the generator optimizer is scheduled — the
fake-score optimizer runs at a constant LR (no scheduler is ever created
for ``optimizer_d``).

These are transcriptions of the HF lambda formulas (linear warmup in all
warmup-capable variants; LambdaLR multiplies the base LR), exposed as optax
schedules (step -> lr).
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_lr_schedule", "SCHEDULE_NAMES"]

SCHEDULE_NAMES = (
    "constant",
    "constant_with_warmup",
    "linear",
    "cosine",
    "cosine_with_restarts",
    "polynomial",
)


def make_lr_schedule(
    name: str,
    base_lr: float,
    *,
    warmup_steps: int = 0,
    total_steps: int = 1,
    num_cycles: int = 1,
    power: float = 1.0,
):
    """Return ``schedule(step) -> lr`` (optax-compatible, traceable).

    ``total_steps`` is the number of optimizer steps (the reference's
    ``max_train_steps``); warmup is linear from 0 over ``warmup_steps``.
    """
    import jax.numpy as jnp

    if name not in SCHEDULE_NAMES:
        raise ValueError(f"unknown lr_scheduler {name!r}; one of {SCHEDULE_NAMES}")
    w = max(int(warmup_steps), 0)
    total = max(int(total_steps), 1)
    decay_span = max(total - w, 1)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = s / max(w, 1)
        if name == "constant":
            mult = jnp.ones_like(s)
        elif name == "constant_with_warmup":
            mult = jnp.where(s < w, warm, 1.0)
        elif name == "linear":
            post = jnp.maximum(0.0, (total - s) / decay_span)
            mult = jnp.where(s < w, warm, post)
        elif name == "cosine":
            progress = (s - w) / decay_span
            post = jnp.maximum(
                0.0,
                0.5 * (1.0 + jnp.cos(np.pi * float(num_cycles) * 2.0 * progress)),
            )
            mult = jnp.where(s < w, warm, post)
        elif name == "cosine_with_restarts":
            progress = (s - w) / decay_span
            frac = jnp.mod(float(num_cycles) * progress, 1.0)
            post = jnp.where(
                progress >= 1.0,
                0.0,
                jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(np.pi * frac))),
            )
            mult = jnp.where(s < w, warm, post)
        else:  # polynomial (HF: decays base_lr -> lr_end=1e-7)
            lr_end = 1e-7
            pct = 1.0 - jnp.clip((s - w) / decay_span, 0.0, 1.0)
            decayed = (base_lr - lr_end) * pct**power + lr_end
            post = decayed / base_lr if base_lr else 0.0
            mult = jnp.where(s < w, warm, jnp.where(s > total, lr_end / base_lr if base_lr else 0.0, post))
        return base_lr * mult

    return schedule
