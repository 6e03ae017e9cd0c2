"""TDM — Trajectory Distribution Matching step distillation (data-free).

Functional rebuild of the reference trainers (``train_cogvideo_tdm.py:901-
1798``, ``train_wanx_tdm.py``) with one loop for both model families:

  * three roles share ONE base parameter tree: student = base + LoRA_g,
    fake-score = base + LoRA_f, frozen teacher = base.  (The reference loads
    three full 5B replicas; sharing the base is a ~3x parameter-memory win.)
  * the DDPM (CogVideoX, v-pred) and flow-matching (Wan) math collapse into
    a :class:`DiffusionFamily` of five pure functions; in particular both
    fake-score losses are the same x0-space MSE weighted by 1/sigma_t^2
    (cog writes it as 1/(1-abar) on x0, wan as velocity MSE — identical).
  * one ``train_step`` = K-step stochastic-DDIM trajectory simulation
    (no grad) -> fake-score update (grad wrt LoRA_f) -> generator update
    (grad wrt LoRA_g, pseudo-Huber against the revised target
    ``model + real(cfg) - fake``), all jittable and shardable.

Randomness is fully keyed; gradient accumulation/DP sharding live in
``blade.parallel`` and wrap this step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from blade.schedulers import ddpm as D
from blade.schedulers import unipc_flow as F
from blade.training import lora as lora_lib

__all__ = [
    "DiffusionFamily",
    "ddpm_family",
    "flow_family",
    "TDMConfig",
    "TDMState",
    "create_tdm_state",
    "make_tdm_train_step",
    "k_step_trajectory",
]

ModelApply = Callable[..., jnp.ndarray]
# model_apply(params, latents, timestep_f32[B], text_embeds, rng) -> prediction


@dataclasses.dataclass(frozen=True)
class DiffusionFamily:
    """The five conversions TDM needs, per diffusion formulation."""

    pred_x0: Callable  # (model_out, x_t, t) -> x0
    pred_eps: Callable  # (x0, x_t, t) -> eps
    add_noise: Callable  # (x0, eps, t) -> x_t
    renoise: Callable  # (x_t1, xi, t1, t2>t1) -> x_t2
    sigma_at: Callable  # (t, ndim) -> sigma_t broadcastable


def ddpm_family(sched: D.DDPMSchedule) -> DiffusionFamily:
    def sigma_at(t, ndim):
        s = jnp.asarray(sched.sigma)[t]
        return s.reshape(s.shape + (1,) * (ndim - s.ndim))

    return DiffusionFamily(
        pred_x0=lambda out, x_t, t: D.pred_x0_from_v(sched, out, x_t, t),
        pred_eps=lambda x0, x_t, t: D.pred_eps_from_x0(sched, x0, x_t, t),
        add_noise=lambda x0, eps, t: D.add_noise(sched, x0, eps, t),
        renoise=lambda x, xi, t1, t2: D.renoise(sched, x, xi, t1, t2),
        sigma_at=sigma_at,
    )


def flow_family(sigma_table: np.ndarray) -> DiffusionFamily:
    def sigma_at(t, ndim):
        s = jnp.asarray(sigma_table)[t]
        return s.reshape(s.shape + (1,) * (ndim - s.ndim))

    return DiffusionFamily(
        pred_x0=lambda out, x_t, t: F.flow_pred_x0(sigma_table, out, x_t, t),
        pred_eps=lambda x0, x_t, t: F.flow_pred_eps(sigma_table, x0, x_t, t),
        add_noise=lambda x0, eps, t: F.flow_add_noise(sigma_table, x0, eps, t),
        renoise=lambda x, xi, t1, t2: F.flow_renoise(sigma_table, x, xi, t1, t2),
        sigma_at=sigma_at,
    )


@dataclasses.dataclass(frozen=True)
class TDMConfig:
    k_step: int = 8
    eta: float = 0.9
    cfg: float = 3.5  # teacher CFG (3.5 cog / 5.0 wan)
    lambda_reg: float = 0.5  # 0 for wan
    total_steps: int = 1000
    t_max: int = 980  # upper bound (exclusive) of the random distill t
    lr_generator: float = 1e-4
    lr_fake: float = 5e-4
    adam_b1: float = 0.0
    adam_b2: float = 0.95
    max_grad_norm: float = 1.0
    lora_rank: int = 64
    lora_alpha: float = 64.0
    # Pseudo-Huber c; None -> reference formula 1e-3 / (128 * sqrt(numel)).
    huber_c: Optional[float] = None
    # Gradient accumulation: each optimizer applies every N train_step calls
    # (reference: accelerate grad-accum x4, train_tdm_1.sh).
    grad_accum: int = 1
    # Divide generator loss by clamp(mean|model-real|, max=5) (cog yes/wan no)
    use_weighting_factor: bool = True
    # Train the full student/fake models instead of LoRA adapters (the Wan
    # trainer's `--use_lora false` mode, train_wanx_tdm.py).
    train_full_model: bool = False
    # Skip the fake update when loss_fake explodes (wan guard; None = off).
    fake_loss_skip_threshold: Optional[float] = None
    # Optimizer family: "adamw" | "adam" | "prodigy" (optax.contrib; the
    # reference's --optimizer flag, train_cogvideo_tdm.py:450-503).
    optimizer: str = "adamw"
    # Keep Adam moments in bf16 — the TPU analogue of the reference's
    # --use_8bit_adam memory saving (no int8 optimizer states in optax).
    optimizer_state_bf16: bool = False
    # Generator LR schedule (HF get_scheduler semantics; the reference
    # recipe runs cosine_with_restarts + 5 warmup steps, train_tdm_1.sh:
    # 23-25, applied only to the generator optimizer at
    # train_cogvideo_tdm.py:1291-1297,1739).  The fake optimizer is always
    # constant-LR.
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 500
    lr_num_cycles: int = 1
    lr_power: float = 1.0
    max_train_steps: int = 300  # num_training_steps fed to the schedule
    # AdamW/prodigy shared knobs (reference --adam_weight_decay/epsilon).
    weight_decay: float = 1e-4
    adam_eps: float = 1e-8
    # Prodigy sub-knobs (train_cogvideo_tdm.py:888-896).  optax's prodigy
    # is always bias-corrected and decoupled-WD by construction; `decouple=
    # False` (coupled L2) is expressed by zeroing the decoupled term.
    prodigy_beta3: Optional[float] = None
    prodigy_decouple: bool = True
    prodigy_use_bias_correction: bool = True  # accepted; optax always does
    prodigy_safeguard_warmup: bool = False


class TDMState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    base_params: Any  # frozen teacher / shared base
    lora_g: Any  # student adapter
    lora_f: Any  # fake-score adapter
    opt_g: Any
    opt_f: Any


def _optimizer(lr, cfg: TDMConfig, *, scheduled: bool = False):
    """Build one optimizer.  ``scheduled=True`` (generator only) wraps the
    base LR in the configured HF-style schedule; the fake optimizer is
    always constant-LR (the reference never schedules ``optimizer_d``)."""
    if scheduled and cfg.lr_scheduler != "constant":
        from blade.training.lr_schedules import make_lr_schedule

        lr = make_lr_schedule(
            cfg.lr_scheduler, lr,
            warmup_steps=cfg.lr_warmup_steps,
            total_steps=cfg.max_train_steps,
            num_cycles=cfg.lr_num_cycles,
            power=cfg.lr_power,
        )
    accum_dtype = jnp.bfloat16 if cfg.optimizer_state_bf16 else None
    if cfg.optimizer == "prodigy":
        import optax.contrib as contrib

        inner = contrib.prodigy(
            lr, betas=(max(cfg.adam_b1, 0.9), max(cfg.adam_b2, 0.99)),
            beta3=cfg.prodigy_beta3,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay if cfg.prodigy_decouple else 0.0,
            safeguard_warmup=cfg.prodigy_safeguard_warmup,
        )
        # prodigy's d-estimate is 0/0 on all-zero grads (which the
        # fake-loss skip guard emits); skip non-finite updates instead.
        inner = optax.apply_if_finite(inner, max_consecutive_errors=10**6)
    elif cfg.optimizer == "adam":
        inner = optax.adam(
            lr, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            mu_dtype=accum_dtype,
        )
    else:
        inner = optax.adamw(
            lr, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay, mu_dtype=accum_dtype,
        )
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), inner)
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def create_tdm_state(rng, base_params, cfg: TDMConfig) -> TDMState:
    rg, rf = jax.random.split(rng)
    if cfg.train_full_model:
        # Student/fake start as copies of the teacher; `merge` is identity.
        copy = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        lora_g = copy(base_params)
        lora_f = copy(base_params)
        opt_g = _optimizer(cfg.lr_generator, cfg, scheduled=True).init(lora_g)
        opt_f = _optimizer(cfg.lr_fake, cfg).init(lora_f)
        return TDMState(
            step=jnp.zeros((), jnp.int32), base_params=base_params,
            lora_g=lora_g, lora_f=lora_f, opt_g=opt_g, opt_f=opt_f,
        )
    lora_g = lora_lib.init_lora(rg, base_params, rank=cfg.lora_rank)
    lora_f = lora_lib.init_lora(rf, base_params, rank=cfg.lora_rank)
    opt_g = _optimizer(cfg.lr_generator, cfg, scheduled=True).init(lora_g)
    opt_f = _optimizer(cfg.lr_fake, cfg).init(lora_f)
    return TDMState(
        step=jnp.zeros((), jnp.int32),
        base_params=base_params,
        lora_g=lora_g,
        lora_f=lora_f,
        opt_g=opt_g,
        opt_f=opt_f,
    )


def k_step_trajectory(
    model_apply: ModelApply,
    params,
    family: DiffusionFamily,
    noise: jnp.ndarray,
    text_embeds: jnp.ndarray,
    rng: jax.Array,
    *,
    k_step: int,
    eta: float,
    total_steps: int = 1000,
):
    """Reference ``generate_new`` (train_cogvideo_tdm.py:1415-1449): K-step
    stochastic DDIM rollout.  Returns ``(x0s [K, B, ...], noisy [K+1, B, ...])``
    where ``noisy[k]`` is the input to step k and ``noisy[K]`` the final x0.
    """
    b = noise.shape[0]
    delta = total_steps // k_step
    t0 = jnp.full((b,), total_steps - 1, jnp.int32)

    def body(carry, k):
        x_t, t = carry
        krng = jax.random.fold_in(rng, k)
        out = model_apply(params, x_t, t.astype(jnp.float32), text_embeds, krng)
        x0 = family.pred_x0(out, x_t, t)
        eps_hat = family.pred_eps(x0, x_t, t)
        xi = jax.random.normal(jax.random.fold_in(krng, 1), x_t.shape, jnp.float32)
        eps_mix = eta * eps_hat + np.sqrt(max(1.0 - eta**2, 0.0)) * xi.astype(
            eps_hat.dtype
        )
        t_next = jnp.maximum(t - delta, 0)
        # keep the scan carry dtype stable (f32 sigma tables promote bf16)
        x_next = family.add_noise(x0, eps_mix, t_next).astype(x_t.dtype)
        return (x_next, t - delta), (x0.astype(x_t.dtype), x_t)

    (_, _), (x0s, noisys) = jax.lax.scan(body, (noise, t0), jnp.arange(k_step))
    noisy_full = jnp.concatenate([noisys, x0s[-1:]], axis=0)
    return x0s, noisy_full


def _batch_gather(stacked, idx):
    """stacked [K, B, ...], idx [B] -> [B, ...] picking per-sample slices."""
    return jax.vmap(lambda s, i: s[i], in_axes=(1, 0))(stacked, idx)


def make_tdm_train_step(
    model_apply: ModelApply,
    family: DiffusionFamily,
    cfg: TDMConfig,
):
    """Build the jittable ``train_step(state, batch, rng) -> (state, metrics)``.

    ``batch``: dict with ``text_embeds`` [B, Lt, Dt], ``uncond_embeds``
    (same shape), and ``noise`` [B, *latent_shape].
    """
    opt_g = _optimizer(cfg.lr_generator, cfg, scheduled=True)
    opt_f = _optimizer(cfg.lr_fake, cfg)
    if cfg.train_full_model:
        merge = lambda base, l: l  # adapters ARE the full parameters
    else:
        merge = lambda base, l: lora_lib.merge_lora(
            base, l, alpha=cfg.lora_alpha, rank=cfg.lora_rank
        )

    def predict_x0(params, x_t, t, text, rng, guidance=None, uncond=None):
        out = model_apply(params, x_t, t.astype(jnp.float32), text, rng)
        x0 = family.pred_x0(out, x_t, t)
        if guidance is not None:
            out_u = model_apply(params, x_t, t.astype(jnp.float32), uncond, rng)
            x0_u = family.pred_x0(out_u, x_t, t)
            x0 = x0_u + guidance * (x0 - x0_u)
        return x0

    def train_step(state: TDMState, batch, rng):
        text = batch["text_embeds"]
        uncond = batch["uncond_embeds"]
        noise = batch["noise"]
        b = noise.shape[0]
        ndim = noise.ndim
        rngs = jax.random.split(jax.random.fold_in(rng, state.step), 12)
        delta = cfg.total_steps // cfg.k_step

        student = merge(state.base_params, state.lora_g)

        # ---- (1) trajectory simulation (no grad) --------------------------
        x0s, noisy = k_step_trajectory(
            model_apply, student, family, noise, text, rngs[0],
            k_step=cfg.k_step, eta=cfg.eta, total_steps=cfg.total_steps,
        )
        x0s = jax.lax.stop_gradient(x0s)
        noisy = jax.lax.stop_gradient(noisy)
        # Reference reverses noisy list so index Ind_t counts from the end
        # (train_cogvideo_tdm.py:1634: noisy_imgs_list.reverse()).
        noisy_rev = noisy[::-1]

        def distill_points(r1, r2):
            """Sample (noisy latents at segment boundary, t_g, t_mid, t)."""
            ind = jax.random.randint(r1, (b,), 1, cfg.k_step + 1)
            lat = _batch_gather(noisy_rev, ind)
            t_g = ind * delta - 1
            t_mid = t_g - delta + 1
            # t ~ U[t_mid, t_max) per sample (reference randint loop,
            # train_cogvideo_tdm.py:1652-1656).
            u = jax.random.uniform(r2, (b,))
            t = t_mid + (u * (cfg.t_max - t_mid).astype(jnp.float32)).astype(jnp.int32)
            return lat, t_g, t_mid, t

        def make_targets(r_ind, r_t, r_eps, r_re, params_for_student):
            """Common machinery: pick a segment point, run the student at the
            segment end, re-noise its x0 to a random t (the reference's
            noisy_model_latents path)."""
            lat_ode, t_g, t_mid, t = distill_points(r_ind, r_t)
            out = model_apply(
                params_for_student, lat_ode, t_g.astype(jnp.float32), text, rngs[10]
            )
            model_latents = family.pred_x0(out, lat_ode, t_g)
            model_eps = family.pred_eps(model_latents, lat_ode, t_g)
            xi = jax.random.normal(r_eps, noise.shape, jnp.float32).astype(
                model_eps.dtype
            )
            add_eps = cfg.eta * model_eps + np.sqrt(max(1 - cfg.eta**2, 0.0)) * xi
            ode_noisy = family.add_noise(model_latents, add_eps, t_mid)
            xi2 = jax.random.normal(r_re, noise.shape, jnp.float32).astype(
                model_eps.dtype
            )
            noisy_t = family.renoise(ode_noisy, xi2, t_mid, t)
            return model_latents, model_eps, noisy_t, t

        # ---- (2) fake-score update ---------------------------------------
        with jax.named_scope("fake_update"):
            m_lat, _, noisy_t, t = jax.lax.stop_gradient(
                make_targets(rngs[1], rngs[2], rngs[3], rngs[4], student)
            )
            w = 1.0 / jnp.maximum(family.sigma_at(t, ndim) ** 2, 1e-8)

            def fake_loss_fn(lora_f):
                fake_params = merge(state.base_params, lora_f)
                x0_f = predict_x0(fake_params, noisy_t, t, text, rngs[5])
                loss = jnp.mean(w * (x0_f - m_lat) ** 2)
                if cfg.lambda_reg > 0:
                    x0_real = jax.lax.stop_gradient(
                        predict_x0(state.base_params, noisy_t, t, text, rngs[5])
                    )
                    loss = loss + cfg.lambda_reg * jnp.mean(w * (x0_f - x0_real) ** 2)
                return loss

            loss_fake, grads_f = jax.value_and_grad(fake_loss_fn)(state.lora_f)
            upd_f, opt_f_state = opt_f.update(grads_f, state.opt_f, state.lora_f)
            lora_f_new = optax.apply_updates(state.lora_f, upd_f)
            if cfg.fake_loss_skip_threshold is not None:
                # Reference guard (train_wanx_tdm.py): when loss_fake
                # explodes, skip the whole update — params AND optimizer
                # state roll back (zeroing grads instead would advance the
                # moments/counters and 0/0-poison prodigy's d-estimate).
                ok = loss_fake < cfg.fake_loss_skip_threshold
                sel = lambda n, o: jnp.where(ok, n, o)
                lora_f_new = jax.tree_util.tree_map(sel, lora_f_new,
                                                    state.lora_f)
                opt_f_state = jax.tree_util.tree_map(sel, opt_f_state,
                                                     state.opt_f)

        # ---- (3) generator update ----------------------------------------
        with jax.named_scope("generator_update"):
            lat_ode, t_g, t_mid, t2 = jax.lax.stop_gradient(
                distill_points(rngs[6], rngs[7])
            )

            def gen_loss_fn(lora_g):
                g_params = merge(state.base_params, lora_g)
                out = model_apply(
                    g_params, lat_ode, t_g.astype(jnp.float32), text, rngs[11]
                )
                model_latents = family.pred_x0(out, lat_ode, t_g)
                model_eps = family.pred_eps(model_latents, lat_ode, t_g)

                # revised target: student + teacher(cfg) - fake, all stopped.
                def targets():
                    xi = jax.random.normal(rngs[8], noise.shape, jnp.float32).astype(
                        model_eps.dtype
                    )
                    add_eps = (
                        cfg.eta * model_eps + np.sqrt(max(1 - cfg.eta**2, 0.0)) * xi
                    )
                    ode_noisy = family.add_noise(model_latents, add_eps, t_mid)
                    xi2 = jax.random.normal(rngs[9], noise.shape, jnp.float32).astype(
                        model_eps.dtype
                    )
                    noisy_t2 = family.renoise(ode_noisy, xi2, t_mid, t2)
                    real = predict_x0(
                        state.base_params, noisy_t2, t2, text, rngs[5],
                        guidance=cfg.cfg, uncond=uncond,
                    )
                    fake = predict_x0(
                        merge(state.base_params, lora_f_new), noisy_t2, t2, text,
                        rngs[5],
                    )
                    return real, fake

                real, fake = jax.lax.stop_gradient(targets())
                revised = jax.lax.stop_gradient(model_latents + real - fake)

                numel = float(np.prod(noise.shape[1:]))
                c = (
                    cfg.huber_c
                    if cfg.huber_c is not None
                    else 1e-3 / (128.0 * np.sqrt(numel))
                )
                ml = model_latents.astype(jnp.float32)
                diff2 = (ml - revised.astype(jnp.float32)) ** 2
                huber = jnp.sqrt(diff2 + c**2) - c
                if cfg.use_weighting_factor:
                    wf = jnp.mean(
                        jnp.abs(ml - real.astype(jnp.float32)),
                        axis=tuple(range(1, ndim)),
                        keepdims=True,
                    )
                    wf = jax.lax.stop_gradient(jnp.minimum(wf, 5.0))
                    huber = huber / wf
                return jnp.mean(huber)

            loss_g, grads_g = jax.value_and_grad(gen_loss_fn)(state.lora_g)
            upd_g, opt_g_state = opt_g.update(grads_g, state.opt_g, state.lora_g)
            lora_g_new = optax.apply_updates(state.lora_g, upd_g)

        new_state = state.replace(
            step=state.step + 1,
            lora_g=lora_g_new,
            lora_f=lora_f_new,
            opt_g=opt_g_state,
            opt_f=opt_f_state,
        )
        metrics = {"loss_fake": loss_fake, "loss_du": loss_g}
        if cfg.lr_scheduler != "constant":
            from blade.training.lr_schedules import make_lr_schedule

            sched = make_lr_schedule(
                cfg.lr_scheduler, cfg.lr_generator,
                warmup_steps=cfg.lr_warmup_steps,
                total_steps=cfg.max_train_steps,
                num_cycles=cfg.lr_num_cycles, power=cfg.lr_power,
            )
            metrics["lr"] = sched(state.step // cfg.grad_accum)
        return new_state, metrics

    return train_step
