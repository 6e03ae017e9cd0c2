"""Jit-scanned denoising loops (the reference's 8-step distilled samplers).

The reference drives sampling through diffusers pipelines
(``cogvideox/train/inference.py``: 8 steps, CFG 1.0, trailing DPM;
``wanx/train/inference.py``: 8 steps, flow UniPC, shift 3.0).  Here each
sampler is a single ``lax.scan`` over the step index with the model applied
functionally — one XLA compilation for the whole loop, donated carries, no
host round trips.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from blade.schedulers import ddpm as D
from blade.schedulers import unipc_flow as F
from blade.schedulers.cogvideox_dpm import (
    DPMSchedule,
    dpm_init,
    dpm_step,
    make_dpm_schedule,
)

__all__ = ["sample_wan", "sample_cogvideox", "ddim_trajectory_sampler",
           "wan_stepper", "cog_stepper", "wan_stepper_reuse",
           "cog_stepper_reuse"]

ModelFn = Callable[..., jnp.ndarray]  # (latents, timestep[B], rng) -> prediction


def _with_cfg(model_fn, guidance_scale, text_embeds, neg_text_embeds):
    """Classifier-free guidance wrapper; no-op at scale 1 (distilled models)."""

    def fn(x, t, rng):
        cond = model_fn(x, t, text_embeds, rng)
        if guidance_scale is None or guidance_scale == 1.0:
            return cond
        uncond = model_fn(x, t, neg_text_embeds, rng)
        return uncond + guidance_scale * (cond - uncond)

    return fn


def sample_wan(
    model_fn: ModelFn,
    noise: jnp.ndarray,
    text_embeds: jnp.ndarray,
    *,
    rng: jax.Array,
    num_steps: int = 8,
    flow_shift: float = 3.0,
    guidance_scale: float = 1.0,
    neg_text_embeds: Optional[jnp.ndarray] = None,
    solver: str = "unipc",
    mask_refresh_every: int = 0,
    return_trajectory: bool = False,
):
    """Flow-matching sampling for Wan: noise -> clean latents.

    ``model_fn(latents, timestep, text_embeds, rng) -> velocity``.

    ``mask_refresh_every > 1`` enables VSA-style ASA mask reuse: the
    per-layer block masks are predicted on refresh steps (via the model's
    ``collect_mask`` protocol) and replayed on the steps in between —
    skipping the predictor+mask cost for those steps.  0/1 = off (reference
    parity: masks are data-dependent every call).
    """
    sched = F.make_flow_unipc_schedule(num_steps, flow_shift=flow_shift)
    timesteps = jnp.asarray(sched.timesteps, jnp.float32)
    fn = _with_cfg(model_fn, guidance_scale, text_embeds, neg_text_embeds)
    # Solver state runs in f32 regardless of model dtype (the UniPC linear
    # combinations lose too much in bf16; the model casts internally).
    noise = noise.astype(jnp.float32)

    if solver == "euler":
        def body(carry, i):
            x = carry
            v = fn(x, jnp.full(noise.shape[:1], timesteps[i]), jax.random.fold_in(rng, i))
            nxt = F.euler_step(sched, x, v, i)
            return nxt, (nxt if return_trajectory else None)

        x, traj = jax.lax.scan(body, noise, jnp.arange(num_steps))
        return (x, traj) if return_trajectory else x

    if mask_refresh_every and mask_refresh_every > 1:
        if guidance_scale and guidance_scale != 1.0:
            raise NotImplementedError(
                "mask reuse is wired for the distilled CFG=1 path; "
                "guided sampling recomputes masks per call"
            )
        # The mask stack's shape/dtype via an abstract trace of one
        # collecting call (no FLOPs).
        def _collect(x, t, r):
            return model_fn(x, t, text_embeds, r, collect_mask=True)

        _, mask_sd = jax.eval_shape(
            _collect, noise, jnp.full(noise.shape[:1], timesteps[0]), rng
        )

        def body(carry, i):
            state, masks = carry
            t = jnp.full(noise.shape[:1], timesteps[i])
            r = jax.random.fold_in(rng, i)

            def refresh(_):
                v, new_masks = model_fn(state.x, t, text_embeds, r,
                                        collect_mask=True)
                return v.astype(jnp.float32), new_masks

            def reuse(_):
                v = model_fn(state.x, t, text_embeds, r, masks=masks)
                return v.astype(jnp.float32), masks

            v, masks = jax.lax.cond(
                i % mask_refresh_every == 0, refresh, reuse, None
            )
            nxt = F.unipc_step(sched, state, v, i)
            return (nxt, masks), (nxt.x if return_trajectory else None)

        masks0 = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype), mask_sd)
        (state, _), traj = jax.lax.scan(
            body, (F.unipc_init(noise), masks0), jnp.arange(num_steps)
        )
        return (state.x, traj) if return_trajectory else state.x

    def body(carry, i):
        state = carry
        v = fn(
            state.x,
            jnp.full(noise.shape[:1], timesteps[i]),
            jax.random.fold_in(rng, i),
        )
        nxt = F.unipc_step(sched, state, v, i)
        return nxt, (nxt.x if return_trajectory else None)

    state, traj = jax.lax.scan(body, F.unipc_init(noise), jnp.arange(num_steps))
    return (state.x, traj) if return_trajectory else state.x


def wan_stepper(
    model_fn: ModelFn,
    *,
    num_steps: int = 8,
    flow_shift: float = 3.0,
    guidance_scale: float = 1.0,
):
    """Host-driven decomposition of :func:`sample_wan`: returns
    ``(init, step)`` where ``step(state, i, text_embeds, rng)`` is ONE
    jittable UniPC step with a *traced* step index — compile once, call N
    times from a host loop.

    Math-identical to the ``lax.scan`` sampler (``scan(body) ==
    fold(step)``; exactness-tested in tests/test_pipeline.py).  The point
    is compile-unit size: the monolithic 8-step scan program exceeds the
    remote-compile relay's tolerance at full 480p geometry, while one step
    compiles in minutes and is what bench.py's e2e measurement drives
    (VERDICT r2 item 1: split the program per stage).
    """
    sched = F.make_flow_unipc_schedule(num_steps, flow_shift=flow_shift)
    timesteps = jnp.asarray(sched.timesteps, jnp.float32)
    if guidance_scale not in (None, 1.0):
        raise NotImplementedError(
            "the host-loop stepper targets the distilled CFG=1 path")

    def init(noise):
        return F.unipc_init(noise.astype(jnp.float32))

    def step(state, i, text_embeds, rng):
        t = jnp.full(state.x.shape[:1], timesteps[i])
        v = model_fn(state.x, t, text_embeds, jax.random.fold_in(rng, i))
        return F.unipc_step(sched, state, v.astype(jnp.float32), i)

    return init, step


def wan_stepper_reuse(
    model_fn: ModelFn,
    *,
    num_steps: int = 8,
    flow_shift: float = 3.0,
):
    """Mask-reuse variant of :func:`wan_stepper`: returns
    ``(init, refresh, reuse)``.

    ``refresh(state, i, text_embeds, rng) -> (state, masks)`` predicts the
    per-layer ASA masks at step ``i`` (the model's ``collect_mask``
    protocol) alongside the velocity; ``reuse(state, masks, i, ...)``
    replays them, skipping the predictor+mask build for that step.  The
    host loop picks refresh/reuse per step, so each variant stays its own
    one-forward compile unit (the ``lax.cond`` pair in :func:`sample_wan`'s
    scan-path would double the unit — too big for the remote-compile
    relay at full geometry).

    Math matches ``sample_wan(mask_refresh_every=n)`` when the host calls
    refresh at ``i % n == 0`` (exactness-tested in tests/test_pipeline.py).
    """
    sched = F.make_flow_unipc_schedule(num_steps, flow_shift=flow_shift)
    timesteps = jnp.asarray(sched.timesteps, jnp.float32)

    def init(noise):
        return F.unipc_init(noise.astype(jnp.float32))

    def refresh(state, i, text_embeds, rng):
        t = jnp.full(state.x.shape[:1], timesteps[i])
        v, masks = model_fn(state.x, t, text_embeds,
                            jax.random.fold_in(rng, i), collect_mask=True)
        return F.unipc_step(sched, state, v.astype(jnp.float32), i), masks

    def reuse(state, masks, i, text_embeds, rng):
        t = jnp.full(state.x.shape[:1], timesteps[i])
        v = model_fn(state.x, t, text_embeds, jax.random.fold_in(rng, i),
                     masks=masks)
        return F.unipc_step(sched, state, v.astype(jnp.float32), i)

    return init, refresh, reuse


def cog_stepper(
    model_fn: ModelFn,
    *,
    num_steps: int = 8,
    guidance_scale: float = 1.0,
    ddpm_schedule: Optional[D.DDPMSchedule] = None,
):
    """Host-driven decomposition of :func:`sample_cogvideox`: returns
    ``(init, step)`` where ``step(state, i, text_embeds, rng)`` is ONE
    jittable SDE-DPM++(2M) step with a traced step index — same rationale
    as :func:`wan_stepper` (the monolithic 8-step scan over the 42-block
    CogVideoX-5B DiT exceeds the remote-compile relay's tolerance; one
    step compiles in minutes).  Math-identical to the scan sampler
    (exactness-tested in tests/test_pipeline.py)."""
    base = ddpm_schedule or D.make_ddpm_schedule()
    sched = make_dpm_schedule(base, num_steps)
    timesteps = jnp.asarray(sched.timesteps, jnp.float32)
    if guidance_scale not in (None, 1.0):
        raise NotImplementedError(
            "the host-loop stepper targets the distilled CFG=1 path")

    def init(noise):
        return dpm_init(noise.astype(jnp.float32))

    def step(state, i, text_embeds, rng):
        krng = jax.random.fold_in(rng, i)
        t = jnp.full(state.x.shape[:1], timesteps[i])
        v = model_fn(state.x, t, text_embeds, krng)
        xi = jax.random.normal(
            jax.random.fold_in(krng, 1), state.x.shape, state.x.dtype
        )
        return dpm_step(sched, state, v, i, xi)

    return init, step


def cog_stepper_reuse(
    model_fn: ModelFn,
    *,
    num_steps: int = 8,
    ddpm_schedule: Optional[D.DDPMSchedule] = None,
):
    """Mask-reuse variant of :func:`cog_stepper`: returns
    ``(init, refresh, reuse)`` — same protocol and rationale as
    :func:`wan_stepper_reuse` (each variant is one one-forward compile
    unit; the host loop picks refresh/reuse per step).  Math matches
    ``sample_cogvideox(mask_refresh_every=n)`` when the host calls
    refresh at ``i % n == 0`` (exactness-tested in
    tests/test_pipeline.py)."""
    base = ddpm_schedule or D.make_ddpm_schedule()
    sched = make_dpm_schedule(base, num_steps)
    timesteps = jnp.asarray(sched.timesteps, jnp.float32)

    def init(noise):
        return dpm_init(noise.astype(jnp.float32))

    def refresh(state, i, text_embeds, rng):
        krng = jax.random.fold_in(rng, i)
        t = jnp.full(state.x.shape[:1], timesteps[i])
        v, masks = model_fn(state.x, t, text_embeds, krng,
                            collect_mask=True)
        xi = jax.random.normal(
            jax.random.fold_in(krng, 1), state.x.shape, state.x.dtype
        )
        return dpm_step(sched, state, v.astype(jnp.float32), i, xi), masks

    def reuse(state, masks, i, text_embeds, rng):
        krng = jax.random.fold_in(rng, i)
        t = jnp.full(state.x.shape[:1], timesteps[i])
        v = model_fn(state.x, t, text_embeds, krng, masks=masks)
        xi = jax.random.normal(
            jax.random.fold_in(krng, 1), state.x.shape, state.x.dtype
        )
        return dpm_step(sched, state, v.astype(jnp.float32), i, xi)

    return init, refresh, reuse


def sample_cogvideox(
    model_fn: ModelFn,
    noise: jnp.ndarray,
    text_embeds: jnp.ndarray,
    *,
    rng: jax.Array,
    num_steps: int = 8,
    guidance_scale: float = 1.0,
    neg_text_embeds: Optional[jnp.ndarray] = None,
    ddpm_schedule: Optional[D.DDPMSchedule] = None,
    mask_refresh_every: int = 0,
    return_trajectory: bool = False,
):
    """v-prediction DPM++(2M) sampling with trailing spacing (CogVideoX).

    ``mask_refresh_every > 1`` enables VSA-style ASA mask reuse, same
    semantics as :func:`sample_wan` (predict per-layer masks on refresh
    steps via ``collect_mask``, replay in between)."""
    base = ddpm_schedule or D.make_ddpm_schedule()
    sched = make_dpm_schedule(base, num_steps)
    timesteps = jnp.asarray(sched.timesteps, jnp.float32)
    fn = _with_cfg(model_fn, guidance_scale, text_embeds, neg_text_embeds)
    noise = noise.astype(jnp.float32)

    if mask_refresh_every and mask_refresh_every > 1:
        if guidance_scale and guidance_scale != 1.0:
            raise NotImplementedError(
                "mask reuse is wired for the distilled CFG=1 path; "
                "guided sampling recomputes masks per call"
            )
        _, mask_sd = jax.eval_shape(
            lambda x, t, r: model_fn(x, t, text_embeds, r,
                                     collect_mask=True),
            noise, jnp.full(noise.shape[:1], timesteps[0]), rng,
        )

        def body(carry, i):
            state, masks = carry
            t = jnp.full(noise.shape[:1], timesteps[i])
            krng = jax.random.fold_in(rng, i)

            def refresh(_):
                v, new_masks = model_fn(state.x, t, text_embeds, krng,
                                        collect_mask=True)
                return v.astype(jnp.float32), new_masks

            def reuse(_):
                v = model_fn(state.x, t, text_embeds, krng, masks=masks)
                return v.astype(jnp.float32), masks

            v, masks = jax.lax.cond(
                i % mask_refresh_every == 0, refresh, reuse, None
            )
            xi = jax.random.normal(
                jax.random.fold_in(krng, 1), state.x.shape, state.x.dtype
            )
            nxt = dpm_step(sched, state, v, i, xi)
            return (nxt, masks), (nxt.x if return_trajectory else None)

        masks0 = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype), mask_sd)
        (state, _), traj = jax.lax.scan(
            body, (dpm_init(noise), masks0), jnp.arange(num_steps)
        )
        return (state.x, traj) if return_trajectory else state.x

    def body(carry, i):
        state = carry
        krng = jax.random.fold_in(rng, i)
        v = fn(state.x, jnp.full(noise.shape[:1], timesteps[i]), krng)
        # SDE-DPM++ injects fresh noise each step (diffusers parity).
        xi = jax.random.normal(
            jax.random.fold_in(krng, 1), state.x.shape, state.x.dtype
        )
        nxt = dpm_step(sched, state, v, i, xi)
        return nxt, (nxt.x if return_trajectory else None)

    state, traj = jax.lax.scan(body, dpm_init(noise), jnp.arange(num_steps))
    return (state.x, traj) if return_trajectory else state.x


def ddim_trajectory_sampler(
    model_fn: ModelFn,
    noise: jnp.ndarray,
    text_embeds: jnp.ndarray,
    sched: D.DDPMSchedule,
    *,
    rng: jax.Array,
    steps: int = 8,
    eta: float = 1.0,
    total_steps: int = 1000,
    return_trajectory: bool = False,
):
    """The reference trainer's K-step stochastic DDIM simulator
    (``generate_new``, ``train_cogvideo_tdm.py:1415-1449``): at each step,
    predict x0, form ``eps_mix = eta * eps_hat + sqrt(1-eta^2) * xi`` and
    re-noise to ``t - total/steps``.

    Returns final x0, or (x0_list [K, ...], noisy_list [K+1, ...]) when
    ``return_trajectory`` — noisy_list[k] is the sample *fed to* step k
    (noisy_list[K] is the final x0, matching the reference's append).
    """
    b = noise.shape[0]
    t0 = jnp.full((b,), total_steps - 1, jnp.int32)
    step_delta = total_steps // steps

    def body(carry, k):
        x_t, t = carry
        krng = jax.random.fold_in(rng, k)
        v = model_fn(x_t, t.astype(jnp.float32), text_embeds, krng)
        x0 = D.pred_x0_from_v(sched, v, x_t, t)
        eps_hat = D.pred_eps_from_x0(sched, x0, x_t, t)
        t_next = t - step_delta
        xi = jax.random.normal(jax.random.fold_in(krng, 1), x_t.shape, x_t.dtype)
        eps_mix = eta * eps_hat + jnp.sqrt(max(1.0 - eta**2, 0.0)) * xi
        # Clamp for the final iteration (t_next < 0 is never *used*: the last
        # x0 is the output, but scan still gathers tables with it).
        x_next = D.add_noise(sched, x0, eps_mix, jnp.maximum(t_next, 0))
        x_next = x_next.astype(x_t.dtype)
        return (x_next, t_next), (x0.astype(x_t.dtype), x_t)

    (x_last, _), (x0s, noisys) = jax.lax.scan(
        body, (noise, t0), jnp.arange(steps)
    )
    if return_trajectory:
        noisy_list = jnp.concatenate([noisys, x0s[-1:]], axis=0)
        return x0s, noisy_list
    return x0s[-1]
