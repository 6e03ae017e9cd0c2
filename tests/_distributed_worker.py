"""Worker for the two-process jax.distributed smoke test.

Launched by tests/test_multiprocess.py as ``python _distributed_worker.py
<port> <pid> <nproc> <outdir>``.  Exercises the REAL multi-host paths the
framework ships (SURVEY §2.6): `maybe_initialize_distributed` env-var
bring-up, global mesh construction across processes, a sharded TDM train
step with cross-process gradient collectives (gloo CPU backend), and the
evalsuite's process-strided task sharding
(reference behavior it replaces: simple_multiprocess_sampler.py:87-354).

Prints one JSON line prefixed RESULT: for the parent to parse.
"""

import json
import os
import sys


def main():
    port, pid, nproc, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    import jax

    # CPU backend with 2 local devices per process; cross-process
    # collectives over gloo (must be set before first JAX use).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    os.environ["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["NUM_PROCESSES"] = str(nproc)
    os.environ["PROCESS_ID"] = str(pid)

    from blade.parallel.launch import maybe_initialize_distributed

    assert maybe_initialize_distributed(verbose=False)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    out = {
        "pid": pid,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
    }

    # ---- evalsuite task sharding: disjoint + exhaustive across procs ----
    from blade.evalsuite.sampler import SamplerConfig, build_tasks

    cfg = SamplerConfig(output_dir=os.path.join(outdir, "videos"),
                        num_videos_per_prompt=3, base_seed=77)
    prompts = [f"prompt {i}" for i in range(5)]
    tasks = build_tasks(prompts, cfg)
    out["tasks"] = [[t[0], t[1], t[2]] for t in tasks]

    # ---- prompt-store index sharding (cli/train.py load_batch stride) ----
    batch = 2
    store_len = 11
    idxs = []
    for step_idx in range(3):
        idx0 = (step_idx * jax.process_count() + jax.process_index()) * batch
        idxs.append([(idx0 + i) % store_len for i in range(batch)])
    out["train_idxs"] = idxs

    # ---- sharded TDM train step over the global dp mesh ----------------
    from blade.training import tdm

    devs = np.array(jax.devices()).reshape(-1)
    mesh = Mesh(devs, ("dp",))
    gb = len(devs)  # one sample per global device

    def toy_apply(params, x, t, text, rng):
        # toy "DiT": linear in x plus a text readout, enough to give the
        # TDM step real gradients on both adapters
        return x * params["w"] + params["b"] + 0.0 * text.sum()

    cfg_t = tdm.TDMConfig(k_step=2, lora_rank=2, train_full_model=True,
                          lr_scheduler="cosine_with_restarts",
                          lr_warmup_steps=2, max_train_steps=10)
    family = tdm.flow_family(
        __import__("blade.schedulers.unipc_flow", fromlist=["x"])
        .flow_training_sigmas(1000, 3.0))
    params = {"w": jnp.ones((), jnp.float32), "b": jnp.zeros((), jnp.float32)}
    state = tdm.create_tdm_state(jax.random.PRNGKey(0), params, cfg_t)

    rng_np = np.random.default_rng(0)
    noise_g = rng_np.standard_normal((gb, 4, 2, 4, 4)).astype(np.float32)
    text_g = rng_np.standard_normal((gb, 3, 8)).astype(np.float32)

    shard = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    def gmake(arr, sh):
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    batch_g = {
        "noise": gmake(noise_g, shard),
        "text_embeds": gmake(text_g, shard),
        "uncond_embeds": gmake(np.zeros_like(text_g), shard),
    }
    state = jax.device_put(state, repl)
    step = jax.jit(tdm.make_tdm_train_step(toy_apply, family, cfg_t))
    state2, metrics = step(state, batch_g, jax.random.PRNGKey(1))
    out["loss_fake"] = float(metrics["loss_fake"])
    out["loss_du"] = float(metrics["loss_du"])
    out["lr"] = float(metrics["lr"])
    out["w_g"] = float(jax.device_get(state2.lora_g["w"]))
    out["w_f"] = float(jax.device_get(state2.lora_f["w"]))

    # ---- REAL-model TDM step dp-sharded across the two processes -------
    # (VERDICT r3 #7: the missing rung between the toy-model smoke and a
    # real pod — one WAN_TINY TDM step whose gradients cross the process
    # boundary; the parent compares metrics against a single-process run
    # of the same global batch.)
    from blade.models.wan_dit import WAN_TINY, WanModel

    model = WanModel(WAN_TINY, dtype=jnp.float32)
    lat_np = np.random.default_rng(1).standard_normal(
        (gb, 16, 2, 8, 8)).astype(np.float32)
    wtext_np = np.random.default_rng(2).standard_normal(
        (gb, 8, WAN_TINY.text_dim)).astype(np.float32)
    wparams = model.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 16, 2, 8, 8)),
        jnp.ones((1,)), jnp.zeros((1, 8, WAN_TINY.text_dim)))
    cfg_w = tdm.TDMConfig(k_step=2, lambda_reg=0.0,
                          use_weighting_factor=False,
                          lora_rank=4, lora_alpha=4)
    state_w = jax.device_put(
        tdm.create_tdm_state(jax.random.PRNGKey(6), wparams, cfg_w), repl)
    batch_w = {
        "noise": gmake(lat_np, shard),
        "text_embeds": gmake(wtext_np, shard),
        "uncond_embeds": gmake(np.zeros_like(wtext_np), shard),
    }

    def wan_apply(p, x, t, txt, r):
        return model.apply(p, x, t, txt, attn_kwargs={"rng": r})

    stepw = jax.jit(tdm.make_tdm_train_step(wan_apply, family, cfg_w))
    _, mw = stepw(state_w, batch_w, jax.random.PRNGKey(7))
    out["wan_loss_fake"] = float(mw["loss_fake"])
    out["wan_loss_du"] = float(mw["loss_du"])

    # ---- explicit cross-process collective -----------------------------
    # each process fills its OWN local shards with 1+pid, so the global
    # sum identifies every participant: nproc=2 x 2 devices -> 2*1 + 2*2.
    ones = jax.make_array_from_callback(
        (gb, 1), shard,
        lambda idx: np.full((len(range(*idx[0].indices(gb))), 1),
                            1.0 + pid, np.float32))
    total = jax.jit(lambda x: jnp.sum(x),
                    out_shardings=repl)(ones)
    out["psum_total"] = float(jax.device_get(total))

    print("RESULT:" + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
