"""Benchmark: the FULL ASA path (mask predictor + sparse kernel + pooled
branch + LSE merge, tokens pre-arranged at model level) vs our tuned dense
flash at Wan-480p inference geometry.

Prints the headline JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
as soon as the kernel metrics exist, then RE-prints it (with more fields
in "extra") after each completed section — the driver parses the last
complete line, so a kill mid-section never loses the whole run.  Total
wall clock is bounded by BLADE_BENCH_BUDGET_S (default 1500 s): optional
sections are skipped (and recorded as skipped) when the budget runs low.

Baseline anchor: the reference claims "2-3x on long sequences" over dense
(Triton/README.md:92) for the executed path at its real workload densities
(~85-95% block dropout); we normalize vs_baseline against the midpoint
(2.5x).  The headline inputs carry cluster structure so the energy mask
lands at realistic densities (~6%) instead of saturating at the retain
clamp the way iid-random inputs do; the clamp-saturated worst case
(density ~0.21) is reported in extra, as are kernel-only numbers.

Runs on one real TPU chip.  Timing uses dispatch-slope measurement (the
tunneled runtime's block_until_ready is unreliable; see
blade/utils/profiling.py).
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp


BASELINE_SPEEDUP = 2.5  # reference executed-path claim midpoint ("2-3x")

# Hard wall-clock budget (VERDICT r3 #1: round-3 bench ran past the
# driver's timeout and the driver captured NOTHING).  The headline JSON
# line is printed as soon as the kernel metrics exist and re-printed
# (richer) after every completed section, so the driver's last-line parse
# always has a complete result even if we are killed mid-extra.  Sections
# are skipped (and recorded as skipped) once the budget runs low.
_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("BLADE_BENCH_BUDGET_S", "1500"))


def _left():
    """Seconds of wall-clock budget remaining."""
    return BUDGET_S - (time.monotonic() - _T0)


def peaked_qkv(key, b, h, l, d, n_clusters=64):
    """Inputs with shared low-rank cluster structure: attention mass
    concentrates the way gilbert-arranged video content does, so the
    energy mask exercises realistic densities."""
    cid = (jnp.arange(l) * n_clusters) // l
    cvecs = jax.random.normal(jax.random.fold_in(key, 10), (n_clusters, d))
    base = cvecs[cid] * 1.2
    q = (base + jax.random.normal(jax.random.fold_in(key, 11), (b, h, l, d))
         ).astype(jnp.bfloat16)
    k = (base + jax.random.normal(jax.random.fold_in(key, 12), (b, h, l, d))
         ).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 13), (b, h, l, d),
                          jnp.bfloat16)
    return q, k, v


def _run_e2e_subprocess(flag, err_key, timeout_s):
    """Run ``bench.py <flag>`` in a subprocess with a hard timeout and
    return the LAST complete JSON line it printed (the impls print partial
    results incrementally, so even a timed-out run yields numbers).

    Subprocess isolation: the full-model runs need the whole chip HBM (the
    kernel benches hold ~2 GB of live tensors), and a poisoned runtime
    from a failed full-model dispatch must not kill the headline metrics.
    """
    env = dict(os.environ)
    env["BLADE_E2E_BUDGET_S"] = str(max(60.0, timeout_s - 45.0))
    stdout, stderr, rc = "", "", None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True, text=True, timeout=timeout_s, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        stdout, stderr, rc = proc.stdout, proc.stderr, proc.returncode
    except subprocess.TimeoutExpired as e:
        stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
        stderr = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) \
            else (e.stderr or "")
        rc = "timeout"
    for line in reversed((stdout or "").strip().splitlines()):
        try:
            parsed = json.loads(line)
            if rc not in (0, None):
                parsed[err_key + "_partial"] = f"rc={rc}"
            return parsed
        except ValueError:
            continue
    tail = ((stdout or "") + (stderr or ""))[-300:]
    return {err_key: f"subprocess rc={rc}: {tail}"}


def bench_e2e(timeout_s=3600.0):
    """End-to-end 8-step Wan-1.3B 480p (VERDICT r2 item 1)."""
    return _run_e2e_subprocess("--e2e", "e2e_error", timeout_s)


def _bench_e2e_reuse(pipe, dit_params, init, noise, embeds, rng, every=4):
    """Opt-in VSA-style mask reuse on the e2e denoise loop: refresh the
    per-layer ASA masks every ``every`` steps, replay them in between
    (skips the predictor + energy-mask build on replay steps).  Two extra
    one-forward compile units (collect/replay variants)."""
    from blade.sampling.pipeline import wan_stepper_reuse

    def model_fn_p(params, x, t, te, r, masks=None, collect_mask=False):
        akw = {"rng": r}
        if masks is not None:
            akw["masks"] = masks
        if collect_mask:
            from blade.attention.integration import extract_attn_aux

            o, st = pipe.dit.apply(
                params, x, t, te, attn_kwargs=dict(akw, collect_mask=True),
                mutable=["intermediates"])
            return o, extract_attn_aux(st["intermediates"])
        return pipe.dit.apply(params, x, t, te, attn_kwargs=akw)

    def refresh_p(params, state, i, te, r):
        _, rf, _ = wan_stepper_reuse(
            lambda x, t, tee, rr, **kw: model_fn_p(params, x, t, tee, rr, **kw),
            num_steps=8)
        return rf(state, i, te, r)

    def reuse_p(params, state, masks, i, te, r):
        _, _, ru = wan_stepper_reuse(
            lambda x, t, tee, rr, **kw: model_fn_p(params, x, t, tee, rr, **kw),
            num_steps=8)
        return ru(state, masks, i, te, r)

    jrefresh = jax.jit(refresh_p)
    jreuse = jax.jit(reuse_p)
    st, mk = jrefresh(dit_params, init(noise), jnp.asarray(0), embeds, rng)
    st = jreuse(dit_params, st, mk, jnp.asarray(1), embeds, rng)
    jax.device_get(st.x)  # compile both variants + first runs

    runs = []
    for _ in range(3):
        st = init(noise)
        mk = None
        t0 = time.perf_counter()
        for i in range(8):
            if i % every == 0:
                st, mk = jrefresh(dit_params, st, jnp.asarray(i), embeds, rng)
            else:
                st = jreuse(dit_params, st, mk, jnp.asarray(i), embeds, rng)
        jax.device_get(st.x)
        runs.append(time.perf_counter() - t0)
    return {f"e2e_denoise8_sparse_reuse{every}_s": round(min(runs), 3)}


def bench_cog_e2e(timeout_s=3600.0):
    """CogVideoX-5B 8-step denoise throughput — subprocess for the same
    isolation reasons as :func:`bench_e2e`."""
    return _run_e2e_subprocess("--e2e-cog", "cog_e2e_error", timeout_s)


def _bench_cog_e2e_reuse(pipe, params, init, noise, embeds, rng, sched,
                         every=4):
    """Mask reuse on the cog denoise loop (mirrors :func:`_bench_e2e_reuse`;
    skips the predictor + multilevel-lists build on replay steps)."""
    from blade.sampling.pipeline import cog_stepper_reuse

    def model_fn_p(params, x, t, te, r, masks=None, collect_mask=False):
        akw = {"rng": r}
        if masks is not None:
            akw["masks"] = masks
        if collect_mask:
            from blade.attention.integration import extract_attn_aux

            o, st = pipe.dit.apply(
                params, x, t, te, attn_kwargs=dict(akw, collect_mask=True),
                mutable=["intermediates"])
            return o, extract_attn_aux(st["intermediates"])
        return pipe.dit.apply(params, x, t, te, attn_kwargs=akw)

    def refresh_p(params, state, i, te, r):
        _, rf, _ = cog_stepper_reuse(
            lambda x, t, tee, rr, **kw: model_fn_p(params, x, t, tee, rr, **kw),
            num_steps=8, ddpm_schedule=sched)
        return rf(state, i, te, r)

    def reuse_p(params, state, masks, i, te, r):
        _, _, ru = cog_stepper_reuse(
            lambda x, t, tee, rr, **kw: model_fn_p(params, x, t, tee, rr, **kw),
            num_steps=8, ddpm_schedule=sched)
        return ru(state, masks, i, te, r)

    jrefresh = jax.jit(refresh_p)
    jreuse = jax.jit(reuse_p)
    st, mk = jrefresh(params, init(noise), jnp.asarray(0), embeds, rng)
    st = jreuse(params, st, mk, jnp.asarray(1), embeds, rng)
    jax.device_get(st.x)  # compile both variants + first runs

    runs = []
    for _ in range(2):
        st = init(noise)
        mk = None
        t0 = time.perf_counter()
        for i in range(8):
            if i % every == 0:
                st, mk = jrefresh(params, st, jnp.asarray(i), embeds, rng)
            else:
                st = jreuse(params, st, mk, jnp.asarray(i), embeds, rng)
        jax.device_get(st.x)
        runs.append(time.perf_counter() - t0)
    return {f"cog_e2e_denoise8_sparse_reuse{every}_s": round(min(runs), 3)}


def bench_cog_e2e_impl():
    """8-step CogVideoX-5B 480p denoise, dense vs sparse (multilevel ASA),
    plus a streamed VAE decode leg.

    CogVideoX-5B is 10.6 GB in bf16 — an on-device f32 flax init (20 GB)
    OOMs the 16 GB chip and shipping host-initialized weights through the
    dev tunnel (~5 MB/s) takes half an hour.  Random weights are for
    timing only, and multilevel rank bands make the sparse path's compute
    input-independent (static per-level counts), so the params are
    generated DIRECTLY on device in bf16 from an ``eval_shape`` of the
    real flax init (exact tree/shapes, N(0, 0.02) values).

    Section order = metric importance (VERDICT r4 #1): dense leg FIRST
    (sparse was the only leg the r4 driver captured), then sparse, so the
    speedup pair completes as early as possible; then the cog VAE decode
    (VERDICT r4 weak #6: ``vae_cogvideox`` tiling differs from wan — its
    on-chip cost needs its own measurement), then mask-reuse extras.
    """
    from blade.config import COGVIDEOX_480P
    from blade.sampling.pipeline import cog_stepper
    from blade.sampling.t2v import T2VPipeline
    from blade.schedulers.ddpm import make_ddpm_schedule

    preset = COGVIDEOX_480P
    rng = jax.random.PRNGKey(0)
    out = {}
    deadline = time.monotonic() + float(
        os.environ.get("BLADE_E2E_BUDGET_S", "1e9"))

    def left():
        return deadline - time.monotonic()

    pipes = {
        "dense": T2VPipeline(preset, None, None, sparse=False,
                             interpret=False),
        "sparse": T2VPipeline(preset, None, None, sparse=True,
                              mask_mode="multilevel", interpret=False),
    }
    # ASA carries no parameters, so one tree serves both modules.  Full
    # latent shape: the model-level gilbert token_perm is baked for the
    # preset geometry (eval_shape never executes, so this is free).
    lat_s = jax.ShapeDtypeStruct(pipes["dense"].latent_shape(1),
                                 jnp.bfloat16)
    text_s = jax.ShapeDtypeStruct(
        (1, preset.max_text_len, preset.text.d_model), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda r, lat, text: pipes["dense"].dit.init(
            r, lat, jnp.ones((1,)), text, attn_kwargs={"rng": r}),
        rng, lat_s, text_s)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def make_params(key):
        outs = [
            jax.random.normal(jax.random.fold_in(key, i), s.shape,
                              jnp.bfloat16) * 0.02
            for i, s in enumerate(leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, outs)

    params = make_params(jax.random.fold_in(rng, 1))
    embeds = jax.random.normal(
        jax.random.fold_in(rng, 2),
        (1, preset.max_text_len, preset.text.d_model), jnp.bfloat16)
    sched = make_ddpm_schedule(
        snr_shift_scale=preset.snr_shift_scale,
        rescale_betas_zero_snr=preset.rescale_betas_zero_snr)
    step_ms = {}
    latents = None
    sparse_ctx = None
    for name, pipe in pipes.items():
        def step_p(params, state, i, te, r, pipe=pipe):
            def mf(x, tt, tee, rr):
                return pipe.dit.apply(params, x, tt, tee,
                                      attn_kwargs={"rng": rr})

            _, st = cog_stepper(mf, num_steps=8, ddpm_schedule=sched)
            return st(state, i, te, r)

        init, _ = cog_stepper(lambda *a: None, num_steps=8,
                              ddpm_schedule=sched)
        jstep = jax.jit(step_p)
        noise = jax.random.normal(
            jax.random.fold_in(rng, 3), pipe.latent_shape(1), jnp.float32
        ).astype(pipe.dtype)
        state = jstep(params, init(noise), jnp.asarray(0), embeds, rng)
        jax.device_get(state.x)  # compile + first run

        runs = []
        for _ in range(2):
            state = init(noise)
            t0 = time.perf_counter()
            for i in range(8):
                state = jstep(params, state, jnp.asarray(i), embeds, rng)
            jax.device_get(state.x)
            runs.append(time.perf_counter() - t0)
        step_ms[name] = min(runs) / 8 * 1e3
        out[f"cog_e2e_denoise8_{name}_s"] = round(min(runs), 3)
        out[f"cog_e2e_{name}_step_ms"] = round(step_ms[name], 1)
        if name == "sparse":
            latents = state.x
            sparse_ctx = (pipe, init, noise)
            out["cog_e2e_denoise_speedup"] = round(
                step_ms["dense"] / step_ms["sparse"], 3)
            out["cog_e2e_speedup_vs_50step_dense_denoise"] = round(
                50 * step_ms["dense"] / (8 * step_ms["sparse"]), 2)
        print(json.dumps(out), flush=True)  # partial — survive a kill
        jstep = state = None

    # --- cog VAE decode leg (streamed chunked_decode on-chip): the cog
    # serving claim gets its own decode cost — vae_cogvideox is a different
    # module with different tiling than the wan VAE measured in --e2e.
    # Random conv weights: decode FLOP/byte cost is weight-independent.
    pipe, init, noise = sparse_ctx
    try:
        if left() < 150:  # warm: tiled programs cached, 2 x 10 s decodes
            raise TimeoutError(f"budget ({left():.0f}s left)")
        import gc

        params = None
        gc.collect()
        t_l, h_l, w_l = preset.latent_grid()
        ps = preset.dit.patch_size
        z0 = jnp.zeros((1, 1, min(h_l * ps, 8), min(w_l * ps, 8),
                        preset.vae.latent_channels), jnp.float32)
        pipe.vae_params = pipe.vae.init(jax.random.fold_in(rng, 7), z0,
                                        method=pipe.vae.decode)
        checksum = jax.jit(lambda f: jnp.mean(f.astype(jnp.float32)))
        frames = pipe.decode_latents(latents.astype(pipe.dtype))
        jax.device_get(checksum(frames))  # compile + first run
        t0 = time.perf_counter()
        frames = pipe.decode_latents(latents.astype(pipe.dtype))
        jax.device_get(checksum(frames))
        out["cog_e2e_decode_s"] = round(time.perf_counter() - t0, 3)
        out["cog_clip_s_8step_sparse"] = round(
            out["cog_e2e_denoise8_sparse_s"] + out["cog_e2e_decode_s"], 3)
        out["cog_clips_per_min_chip"] = round(
            60.0 / out["cog_clip_s_8step_sparse"], 3)
        frames = None
        pipe.vae_params = None
        gc.collect()
    except Exception as e:
        out["cog_e2e_decode_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out), flush=True)

    if os.environ.get("BLADE_BENCH_E2E_REUSE", "1") not in ("0", "off"):
        if left() < 200:  # warm: 2 cached programs + 2 timed loops
            out["cog_e2e_reuse_skipped"] = "budget"
        else:
            try:
                if params is None:  # dropped to make room for the decode
                    params = make_params(jax.random.fold_in(rng, 1))
                out.update(_bench_cog_e2e_reuse(
                    pipe, params, init, noise, embeds, rng, sched))
            except Exception as e:
                out["cog_e2e_reuse_error"] = \
                    f"{type(e).__name__}: {e}"[:200]
        print(json.dumps(out), flush=True)
    return out


def bench_e2e_impl():
    """The actual e2e measurement (runs as ``bench.py --e2e``).

    Host-driven per-step jit (``wan_stepper``) keeps each compile unit to
    one DiT forward + UniPC glue — the monolithic 8-step scan breaks the
    remote-compile relay.  Random weights (timing only), precomputed text
    embeddings (the TDM data-free serving path; T5 encode is per-prompt
    and amortizes across the 4-5 s denoise+decode).

    Section order = metric importance (VERDICT r4 #1): the BASELINE.md
    north-star (8-step sparse clip seconds INCLUDING the streamed VAE
    decode, clips/min/chip, speedup vs the 50-step dense baseline) is
    assembled first — sparse denoise, then decode, then dense denoise —
    and every optional extra (realistic-density leg, mask reuse, batch-2,
    bf16 VAE) comes after, budget-gated.  Partial JSON is printed after
    every section so a timeout never loses completed numbers.
    """
    import gc

    from blade.config import WAN_480P
    from blade.sampling.pipeline import wan_stepper, wan_stepper_reuse
    from blade.sampling.t2v import T2VPipeline

    rng = jax.random.PRNGKey(0)
    embeds = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, WAN_480P.max_text_len, WAN_480P.text.d_model), jnp.bfloat16)
    out = {}
    step_ms = {}
    deadline = time.monotonic() + float(
        os.environ.get("BLADE_E2E_BUDGET_S", "1e9"))

    def left():
        return deadline - time.monotonic()

    def mark(msg):
        # stderr progress marks (stdout carries only JSON): lets a watcher
        # see WHERE a relay hang happened without polluting the parse.
        print(f"[e2e +{time.monotonic() - (deadline - float(os.environ.get('BLADE_E2E_BUDGET_S', '1e9'))):.0f}s] {msg}",
              file=sys.stderr, flush=True)

    def build_pipe(preset, sparse):
        """Random-init pipeline with bf16 serving weights (halves HBM +
        weight-load bandwidth; the model computes in bf16 regardless).
        Returns (pipe, dit_params); pipe.dit_params stays None so the f32
        init tree is freed immediately."""
        p = T2VPipeline.random_init(
            preset, rng, sparse=sparse, mask_mode="energy",
            with_text_encoder=False, interpret=False)
        dp = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p.dit_params)
        p.dit_params = None
        gc.collect()
        return p, dp

    def make_step(pipe):
        # params enter as jit ARGUMENTS — a closure would bake the
        # parameter tree into the program as lowering constants.
        # NO buffer donation: donated executables fail at dispatch on the
        # tunneled runtime (INVALID_ARGUMENT) and poison the process — the
        # UniPC state is ~25 MB, donation buys nothing here anyway.
        def step_p(params, state, i, te, r, pipe=pipe):
            def mf(x, tt, tee, rr):
                return pipe.dit.apply(params, x, tt, tee,
                                      attn_kwargs={"rng": rr})

            _, st = wan_stepper(mf, num_steps=8)
            return st(state, i, te, r)

        init, _ = wan_stepper(lambda *a: None, num_steps=8)
        return init, jax.jit(step_p)

    def time_denoise8(jstep, init, dit_params, noise, reps=2):
        mark("step compile+first run...")
        state = jstep(dit_params, init(noise), jnp.asarray(0), embeds, rng)
        jax.device_get(state.x)  # compile + first run
        mark("compiled; timing")
        runs = []
        for r in range(reps):
            state = init(noise)
            t0 = time.perf_counter()
            for i in range(8):
                state = jstep(dit_params, state, jnp.asarray(i), embeds, rng)
            jax.device_get(state.x)
            runs.append(time.perf_counter() - t0)
            mark(f"denoise8 rep {r}: {runs[-1]:.2f}s")
        return min(runs), state

    # ---- 1. sparse denoise (the serving path) --------------------------
    mark("building sparse pipe (on-device random init)")
    pipe, dit_params = build_pipe(WAN_480P, sparse=True)
    mark("sparse pipe built")
    noise = jax.random.normal(
        jax.random.fold_in(rng, 2), pipe.latent_shape(1), jnp.float32
    ).astype(pipe.dtype)
    init, jstep = make_step(pipe)
    t_sparse, state = time_denoise8(jstep, init, dit_params, noise)
    step_ms["sparse"] = t_sparse / 8 * 1e3
    out["e2e_denoise8_sparse_s"] = round(t_sparse, 3)
    out["e2e_sparse_step_ms"] = round(step_ms["sparse"], 1)
    print(json.dumps(out), flush=True)  # partial — survive a kill
    latents = state.x

    # ---- 2. streamed VAE decode -> the clip-seconds half of the north
    # star.  2-program chunk loop on the pipe's random VAE params; warm
    # pass timed.  Completion is synced with a jitted on-device checksum:
    # device_get of the f32 frames would charge the dev tunnel's ~5 MB/s
    # host link (80+ s for 370 MB) to the decode.  The host pull is timed
    # separately on the uint8 frames (the export dtype; 4x smaller) — on
    # production PCIe it is milliseconds.  DiT params are freed first —
    # decoder workspace + params + latents must coexist in 16 GB.
    dit_params = jstep = state = None
    gc.collect()
    mark("decode section")
    checksum = jax.jit(lambda f: jnp.mean(f.astype(jnp.float32)))
    frames = pipe.decode_latents(latents.astype(pipe.dtype))
    jax.device_get(checksum(frames))  # compile + first run
    t0 = time.perf_counter()
    frames = pipe.decode_latents(latents.astype(pipe.dtype))
    jax.device_get(checksum(frames))
    t_dec = time.perf_counter() - t0

    u8 = pipe.frames_to_uint8(frames)
    jax.device_get(checksum(u8))  # compile conversion outside the fetch
    t0 = time.perf_counter()
    jax.device_get(pipe.frames_to_uint8(frames))
    t_fetch = time.perf_counter() - t0
    frames = u8 = None
    sparse_clip_s = t_sparse + t_dec
    out.update({
        "e2e_decode_s": round(t_dec, 3),
        "e2e_fetch_uint8_s_tunnel": round(t_fetch, 3),
        "e2e_clip_s_8step_sparse": round(sparse_clip_s, 3),
        "e2e_clips_per_min_chip": round(60.0 / sparse_clip_s, 3),
    })
    print(json.dumps(out), flush=True)

    # ---- 3. dense denoise -> the speedup half of the north star --------
    pipe = None
    gc.collect()
    mark("dense section")
    dense_pipe, dit_params = build_pipe(WAN_480P, sparse=False)
    init_d, jstep = make_step(dense_pipe)
    t_dense, state = time_denoise8(jstep, init_d, dit_params, noise)
    step_ms["dense"] = t_dense / 8 * 1e3
    dense50_clip_s = 50 * step_ms["dense"] / 1e3 + t_dec
    out.update({
        "e2e_denoise8_dense_s": round(t_dense, 3),
        "e2e_dense_step_ms": round(step_ms["dense"], 1),
        "e2e_denoise_speedup": round(t_dense / t_sparse, 3),
        "e2e_speedup_vs_50step_dense": round(dense50_clip_s / sparse_clip_s, 2),
    })
    print(json.dumps(out), flush=True)  # north star complete
    dit_params = jstep = state = dense_pipe = None
    gc.collect()

    # ---- 4. realistic-density sparse leg (VERDICT r4 #3) ---------------
    # Random weights give unstructured attention, so the energy mask pins
    # at WAN_480P's max_retain clamp (~0.21 executed density) — the legs
    # above are the CONSERVATIVE regime.  Real gilbert-clustered weights
    # measure ~6% (kernel-level headline).  This leg bounds the production
    # regime IN-MODEL with a bench-only retain override: clamp max_retain
    # to the realistic 6.2%, measure the executed density from the
    # collected masks, and report denoise + clip figures clearly labeled.
    try:
        if left() < 210:  # warm-cache cost ~120-150 s (programs cached)
            raise TimeoutError(f"budget ({left():.0f}s left)")
        mark("realistic-density section")
        preset_r = dataclasses.replace(
            WAN_480P, max_retain_ratio=0.062, min_retain_ratio=0.05)
        pipe_r, dit_r = build_pipe(preset_r, sparse=True)
        init_r, jstep_r = make_step(pipe_r)
        t_real, state_r = time_denoise8(jstep_r, init_r, dit_r, noise)
        # executed density: one collect_mask forward (same program the
        # reuse refresh lane compiles)
        o, aux = pipe_r.dit.apply(
            dit_r, state_r.x, jnp.full((1,), 500.0), embeds,
            attn_kwargs={"rng": rng, "collect_mask": True},
            mutable=["intermediates"])
        from blade.attention.integration import extract_attn_aux

        masks_r = extract_attn_aux(aux["intermediates"])
        density = float(jnp.mean(
            jax.tree_util.tree_leaves(masks_r)[0].astype(jnp.float32)))
        out.update({
            "e2e_denoise8_sparse_realistic_s": round(t_real, 3),
            "e2e_sparse_realistic_step_ms": round(t_real / 8 * 1e3, 1),
            "e2e_realistic_density": round(density, 4),
            "e2e_denoise_speedup_realistic": round(t_dense / t_real, 3),
            "e2e_clip_s_8step_sparse_realistic": round(t_real + t_dec, 3),
            "e2e_clips_per_min_chip_realistic": round(
                60.0 / (t_real + t_dec), 3),
            "e2e_speedup_vs_50step_dense_realistic": round(
                dense50_clip_s / (t_real + t_dec), 2),
        })
        o = aux = masks_r = state_r = None
        jstep_r = init_r = pipe_r = dit_r = None
        gc.collect()
    except Exception as e:
        out["e2e_realistic_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out), flush=True)

    # ---- 5. extras: mask reuse, batch-2, bf16 VAE (least critical) -----
    # Rebuild the serving sparse pipe (same rng -> identical weights; the
    # step program hits the persistent compile cache).
    mark("extras section (reuse/batch2/bf16)")
    pipe, dit_params = build_pipe(WAN_480P, sparse=True)
    init, jstep = make_step(pipe)
    if os.environ.get("BLADE_BENCH_E2E_REUSE", "1") not in ("0", "off"):
        if left() < 200:  # warm: 2 cached programs + 3 timed loops
            out["e2e_reuse_skipped"] = "budget"
        else:
            try:
                out.update(_bench_e2e_reuse(
                    pipe, dit_params, init, noise, embeds, rng))
            except Exception as e:
                out["e2e_reuse_error"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps(out), flush=True)
    if left() < 180:
        out["e2e_batch2_skipped"] = "budget"
    elif os.environ.get("BLADE_BENCH_E2E_BATCH2", "1") not in ("0", "off"):
        # Serving throughput: batch-2 denoise (same jitted step, new
        # shapes).  Per-clip cost drops when batching amortizes per-step
        # dispatch + keeps the MXU fuller.
        try:
            noise2 = jnp.concatenate([noise, noise], axis=0)
            embeds2 = jnp.concatenate([embeds, embeds], axis=0)
            st2 = jstep(dit_params, init(noise2), jnp.asarray(0),
                        embeds2, rng)
            jax.device_get(st2.x)
            runs2 = []
            for _ in range(2):
                st2 = init(noise2)
                t0 = time.perf_counter()
                for i in range(8):
                    st2 = jstep(dit_params, st2, jnp.asarray(i),
                                embeds2, rng)
                jax.device_get(st2.x)
                runs2.append(time.perf_counter() - t0)
            out["e2e_denoise8_sparse_batch2_s"] = round(min(runs2), 3)
            out["e2e_denoise_clips_per_min_batch2"] = round(
                2 * 60.0 / min(runs2), 3)
            st2 = noise2 = embeds2 = None
            print(json.dumps(out), flush=True)
        except Exception as e:
            out["e2e_batch2_error"] = f"{type(e).__name__}: {e}"[:200]

    # bf16 serving decode (computation dtype only; tested within ~2 pixel
    # levels of f32 in tests/test_vae_families.py).  Headline clip time
    # stays on the f32 reference-parity decode.
    try:
        if left() < 120:
            raise TimeoutError("budget")
        from blade.models.vae import build_vae

        dit_params = jstep = None
        gc.collect()
        pipe.vae = build_vae(pipe.preset.vae, dtype=jnp.bfloat16)
        f16 = pipe.decode_latents(latents.astype(pipe.dtype))
        jax.device_get(checksum(f16))
        t0 = time.perf_counter()
        f16 = pipe.decode_latents(latents.astype(pipe.dtype))
        jax.device_get(checksum(f16))
        out["e2e_decode_bf16_s"] = round(time.perf_counter() - t0, 3)
        out["e2e_clip_s_8step_sparse_bf16vae"] = round(
            out["e2e_denoise8_sparse_s"] + out["e2e_decode_bf16_s"], 3)
    except Exception as e:
        out["e2e_decode_bf16_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def main():
    from blade.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    from blade.attention import masks as M
    from blade.attention.asa import WAN_ASA, adaptive_sparse_attention, \
        predict_block_scores
    from blade.kernels.block_sparse_attn import (
        block_sparse_attention,
        flash_attention,
    )
    from blade.kernels.multilevel_attn import multilevel_attention
    from blade.utils.profiling import bench_fn

    # Wan2.1-1.3B inference geometry: 81f 480x832 -> 32760 tokens, 12 heads.
    b, h, l, d = 1, 12, 32760, 128
    rng = jax.random.PRNGKey(0)
    q, k, v = peaked_qkv(rng, b, h, l, d)
    q_iid = jax.random.normal(rng, (b, h, l, d), jnp.bfloat16)
    k_iid = jax.random.normal(jax.random.PRNGKey(1), (b, h, l, d), jnp.bfloat16)
    nq = nk = -(-l // 128)

    # ------- dense baseline (tuned flash, 135 TF/s class) -------
    f_dense = jax.jit(lambda q, k, v: flash_attention(q, k, v, interpret=False)[0])
    t_dense = bench_fn(f_dense, (q, k, v), iters=4)

    # ------- FULL ASA path: predictor + mask + sparse + pooled + merge ----
    # Default production config (sum predictor, 16 tokens/block); tokens
    # pre-arranged at model level (WanModel.token_perm) so no per-call
    # gilbert permutes — the 2 model-level permutes amortize over 30 layers.
    asa_cfg = dataclasses.replace(
        WAN_ASA, pre_arranged=True, predictor="sum", sample_tokens_per_block=16
    )
    f_full = jax.jit(
        lambda r, q, k, v: adaptive_sparse_attention(r, q, k, v, asa_cfg)[0]
    )
    t_full = bench_fn(f_full, (rng, q, k, v), iters=8)
    t_full_iid = bench_fn(f_full, (rng, q_iid, k_iid, v), iters=8)

    # actual executed densities
    scores = predict_block_scores(rng, q, k, asa_cfg)
    mask_peaked = M.energy_mask(
        scores, min_retain_ratio=asa_cfg.min_retain_ratio,
        max_retain_ratio=asa_cfg.max_retain_ratio)
    density = float(mask_peaked.mean())

    # ------- kernel-only (comparable to round-1 records) -------
    mask = jax.random.uniform(jax.random.PRNGKey(3), (b, h, nq, nk)) < 0.143
    mask = mask.at[..., -2:].set(True).at[..., -2:, :].set(True)
    f_sparse = jax.jit(
        lambda q, k, v, m: block_sparse_attention(q, k, v, m, interpret=False)[0]
    )
    t_sparse = bench_fn(f_sparse, (q_iid, k_iid, v, mask), iters=8)

    extra = {
        "dense_ms": round(t_dense * 1e3, 2),
        "full_asa_ms": round(t_full * 1e3, 2),
        "full_asa_density": round(density, 4),
        "full_asa_ms_iid_inputs": round(t_full_iid * 1e3, 2),
        "full_asa_speedup_iid_inputs": round(t_dense / t_full_iid, 3),
        "sparse_kernel_ms_density0.16": round(t_sparse * 1e3, 2),
        "sparse_kernel_speedup": round(t_dense / t_sparse, 3),
    }

    speedup = t_dense / t_full

    def emit():
        """(Re-)print the headline JSON line with everything gathered so
        far — the driver parses the LAST complete line, so each section
        that finishes upgrades the recorded result, and a kill mid-section
        still leaves a complete previous line."""
        extra["bench_elapsed_s"] = round(time.monotonic() - _T0, 1)
        print(json.dumps({
            "metric": "asa_full_path_speedup_vs_dense_wan480p",
            "value": round(speedup, 3),
            "unit": "x (predictor-inclusive; seq=32760, h=12, d=128, "
                    f"density={density:.3f}, bf16, v5e chip)",
            "vs_baseline": round(speedup / BASELINE_SPEEDUP, 3),
            "extra": extra,
        }), flush=True)

    emit()  # headline secured before any optional section

    # ------- secondary metrics (tolerate failures) -------
    try:
        scores_u = jax.random.uniform(jax.random.PRNGKey(4), (b, h, nq, nk))
        levels = M.multilevel_mask(scores_u / scores_u.sum(-1, keepdims=True))
        f_ml = jax.jit(
            lambda q, k, v, lv: multilevel_attention(q, k, v, lv,
                                                     interpret=False)[0]
        )
        t_ml = bench_fn(f_ml, (q_iid, k_iid, v, levels), iters=8)
        extra["multilevel_ms"] = round(t_ml * 1e3, 2)
        extra["multilevel_speedup"] = round(t_dense / t_ml, 3)
        emit()
    except Exception:
        pass

    try:
        # Wan eval path: fused single-pass multilevel kernel at d=128
        # (level-2 pyramid DMA-gathered), full predictor-inclusive path —
        # the lane the per-level composition held at 1.6x until round 4.
        cfg_w = dataclasses.replace(
            WAN_ASA, pre_arranged=True, mask_mode="multilevel",
            predictor="sum", sample_tokens_per_block=16,
            multilevel_q_rows=256)  # the WAN_480P production setting
        f_wml = jax.jit(
            lambda r, q, k, v: adaptive_sparse_attention(r, q, k, v, cfg_w)[0]
        )
        t_wml = bench_fn(f_wml, (rng, q, k, v), iters=8)
        extra["wan_multilevel_full_ms"] = round(t_wml * 1e3, 2)
        extra["wan_multilevel_full_speedup"] = round(t_dense / t_wml, 3)
        emit()
    except Exception:
        pass

    try:
        # CogVideoX eval path: fused single-pass multilevel kernel, full
        # predictor-inclusive path at cog geometry (seq 17776, 48 heads,
        # d=64; eval bands 5/10/10/25%).
        from blade.attention.asa import COGVIDEOX_ASA

        bc, hc, lc, dc = 1, 48, 17776, 64
        qc, kc, vc = peaked_qkv(jax.random.fold_in(rng, 20), bc, hc, lc, dc)
        cfg_c = dataclasses.replace(
            COGVIDEOX_ASA, pre_arranged=True, mask_mode="multilevel",
            predictor="sum", sample_tokens_per_block=16,
            multilevel_q_rows=256)
        f_cog = jax.jit(
            lambda r, q, k, v: adaptive_sparse_attention(r, q, k, v, cfg_c)[0]
        )
        t_cog = bench_fn(f_cog, (rng, qc, kc, vc), iters=8)
        t_cog_dense = bench_fn(f_dense, (qc, kc, vc), iters=4)
        extra["cog_multilevel_full_ms"] = round(t_cog * 1e3, 2)
        extra["cog_dense_ms"] = round(t_cog_dense * 1e3, 2)
        extra["cog_multilevel_full_speedup"] = round(t_cog_dense / t_cog, 3)
        emit()
    except Exception:
        pass

    try:
        def loss_sparse(q, k, v):
            o, _ = block_sparse_attention(q, k, v, mask, interpret=False)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def loss_dense(q, k, v):
            o, _ = flash_attention(q, k, v, interpret=False)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g_sparse = jax.jit(jax.grad(loss_sparse, argnums=(0, 1, 2)))
        g_dense = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))
        t_bwd_sparse = bench_fn(g_sparse, (q_iid, k_iid, v), iters=4)
        t_bwd_dense = bench_fn(g_dense, (q_iid, k_iid, v), iters=2)
        extra["train_fwd_bwd_sparse_ms"] = round(t_bwd_sparse * 1e3, 2)
        extra["train_fwd_bwd_dense_ms"] = round(t_bwd_dense * 1e3, 2)
        extra["train_fwd_bwd_speedup"] = round(t_bwd_dense / t_bwd_sparse, 3)
        emit()
    except Exception:
        pass

    # ------- e2e sections: budget-gated, fail-soft, partial-recovering ---
    # The wan e2e is the north-star metric so it gets the lion's share of
    # the remaining budget; cog gets what's left.  Each subprocess prints
    # partial JSON as it goes, so even a timeout contributes numbers.
    try:
        if os.environ.get("BLADE_BENCH_E2E", "1") in ("0", "off"):
            pass
        elif _left() < 240:
            extra["e2e_skipped"] = f"budget ({_left():.0f}s left)"
        else:
            # ~52% of the remaining budget; the rest is reserved for the
            # cog e2e and the 480p TDM step sections below.  (r5: a warm
            # 1500 s driver run finished with 470 s unused while extras
            # recorded budget-skips — shares were too conservative.)
            extra.update(bench_e2e(timeout_s=max(240.0, 0.52 * _left())))
    except Exception as e:  # e2e must never kill the headline line
        extra["e2e_error"] = f"{type(e).__name__}: {e}"[:200]
    emit()

    try:
        if os.environ.get("BLADE_BENCH_E2E_COG", "1") in ("0", "off"):
            pass
        elif _left() < 180:
            extra["cog_e2e_skipped"] = f"budget ({_left():.0f}s left)"
        else:
            # ~65% of what's left; the 480p TDM step needs only ~180 s
            # when the persistent compile cache is warm
            extra.update(bench_cog_e2e(timeout_s=max(180.0, 0.65 * _left())))
    except Exception as e:
        extra["cog_e2e_error"] = f"{type(e).__name__}: {e}"[:200]
    emit()

    # Full-width Wan-1.3B 480p TDM train step (reference training envelope
    # on one 16 GB chip; 80 GB GPUs upstream).  Runs by default when
    # budget remains (VERDICT r4 #4): with the persistent compile cache
    # warm the step program loads in ~1 min; a cold cache (~12 min
    # compile) hits the subprocess timeout and the skip is recorded.
    try:
        if os.environ.get("BLADE_BENCH_TDM480", "1") in ("0", "off"):
            extra["tdm_480p_skipped"] = "env"
        elif _left() < 300:
            extra["tdm_480p_skipped"] = f"budget ({_left():.0f}s left)"
            emit()
        else:
            proc = subprocess.run(
                [sys.executable, "scripts/tdm_480p_step.py"],
                capture_output=True, text=True,
                timeout=max(120.0, _left() - 20),
                cwd=os.path.dirname(os.path.abspath(__file__)))
            got = None
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    got = json.loads(line)
                    break
                except ValueError:
                    continue
            if got is not None and "value" in got:
                extra["tdm_480p"] = got
            else:
                extra["tdm_480p_error"] = (
                    f"rc={proc.returncode} no metric line; "
                    + (proc.stderr or "")[-200:])
            emit()
    except subprocess.TimeoutExpired:
        extra["tdm_480p_error"] = "timeout (compile cache cold?)"
        emit()
    except Exception as e:
        extra["tdm_480p_error"] = f"{type(e).__name__}: {e}"[:200]
        emit()


if __name__ == "__main__":
    if "--e2e" in sys.argv:
        from blade.utils.compile_cache import enable as _enable_cache

        _enable_cache()
        print(json.dumps(bench_e2e_impl()))
    elif "--e2e-cog" in sys.argv:
        from blade.utils.compile_cache import enable as _enable_cache

        _enable_cache()
        print(json.dumps(bench_cog_e2e_impl()))
    else:
        main()
