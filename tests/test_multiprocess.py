"""Two-process jax.distributed smoke test (VERDICT r2 item 6).

Spawns 2 real OS processes with a local coordinator and 2 virtual CPU
devices each (gloo collectives), then asserts:
  * `maybe_initialize_distributed` brings up a 2-process / 4-device world
    from the env-var contract (COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID)
  * evalsuite `build_tasks` shards are disjoint and exhaustive
  * the train-CLI prompt-index stride is disjoint and exhaustive
  * one TDM train step runs dp-sharded across processes and both processes
    agree bit-for-bit on the replicated updated parameters (i.e. the
    cross-process gradient collective actually executed)

Replaces-the-reference note: the reference only ever ran multi-GPU via
accelerate on one machine (config.yaml num_machines: 1) and its eval
sampler used mp.Queue, not a collective backend
(simple_multiprocess_sampler.py:296-309).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    # children configure their own platform; scrub inherited test-runner
    # JAX settings that would conflict
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(HERE) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_distributed_worker.py"),
             str(port), str(pid), str(nproc), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT:")]
        assert line, out[-4000:]
        r = json.loads(line[-1][len("RESULT:"):])
        results[r["pid"]] = r

    r0, r1 = results[0], results[1]
    assert r0["process_count"] == r1["process_count"] == 2
    assert r0["global_devices"] == r1["global_devices"] == 4
    assert r0["local_devices"] == r1["local_devices"] == 2

    # --- build_tasks: disjoint + exhaustive over 5 prompts x 3 videos ---
    t0 = {tuple(t) for t in r0["tasks"]}
    t1 = {tuple(t) for t in r1["tasks"]}
    assert not (t0 & t1)
    allt = t0 | t1
    assert len(allt) == 15
    assert allt == {(p, v, 77 + p * 1000 + v) for p in range(5)
                    for v in range(3)}

    # --- train prompt-index stride: disjoint per step, covers 0..11 ---
    for s in range(3):
        i0, i1 = set(r0["train_idxs"][s]), set(r1["train_idxs"][s])
        assert not (i0 & i1), (s, i0, i1)
    seen = [i for r in (r0, r1) for s in r["train_idxs"] for i in s]
    assert len(seen) == 12 and len(set(seen)) >= 11  # 11-entry store wraps

    # --- sharded TDM step agreed across processes (collective ran) ---
    for k in ("loss_fake", "loss_du", "lr", "w_g", "w_f", "psum_total"):
        assert r0[k] == pytest.approx(r1[k], rel=1e-6), k
    assert r0["psum_total"] == pytest.approx(2 * 1.0 + 2 * 2.0)
    # generator lr is in warmup step 0 (scheduled -> 0); the fake adapter
    # runs at constant lr and must have moved
    assert r0["lr"] == pytest.approx(0.0, abs=1e-12)
    assert r0["w_f"] != pytest.approx(1.0)

    # --- REAL-model step: both processes agree, and match a single-process
    # run of the same global batch (same keys/inputs; reduction-order noise
    # only) ---
    assert r0["wan_loss_fake"] == pytest.approx(r1["wan_loss_fake"], rel=1e-6)
    assert r0["wan_loss_du"] == pytest.approx(r1["wan_loss_du"], rel=1e-6)
    ref = _single_process_wan_metrics()
    assert r0["wan_loss_fake"] == pytest.approx(ref["loss_fake"], rel=2e-5)
    assert r0["wan_loss_du"] == pytest.approx(ref["loss_du"], rel=2e-5)


def _single_process_wan_metrics():
    """The worker's WAN_TINY TDM step, unsharded in this process (the
    conftest pins cpu), with identical keys and batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from blade.models.wan_dit import WAN_TINY, WanModel
    from blade.schedulers import unipc_flow as F
    from blade.training import tdm

    gb = 4
    model = WanModel(WAN_TINY, dtype=jnp.float32)
    lat_np = np.random.default_rng(1).standard_normal(
        (gb, 16, 2, 8, 8)).astype(np.float32)
    text_np = np.random.default_rng(2).standard_normal(
        (gb, 8, WAN_TINY.text_dim)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 16, 2, 8, 8)),
        jnp.ones((1,)), jnp.zeros((1, 8, WAN_TINY.text_dim)))
    cfg = tdm.TDMConfig(k_step=2, lambda_reg=0.0, use_weighting_factor=False,
                        lora_rank=4, lora_alpha=4)
    state = tdm.create_tdm_state(jax.random.PRNGKey(6), params, cfg)
    family = tdm.flow_family(F.flow_training_sigmas(1000, 3.0))

    def apply_fn(p, x, t, txt, r):
        return model.apply(p, x, t, txt, attn_kwargs={"rng": r})

    step = jax.jit(tdm.make_tdm_train_step(apply_fn, family, cfg))
    batch = {
        "noise": jnp.asarray(lat_np),
        "text_embeds": jnp.asarray(text_np),
        "uncond_embeds": jnp.zeros_like(jnp.asarray(text_np)),
    }
    _, metrics = step(state, batch, jax.random.PRNGKey(7))
    return {k: float(v) for k, v in metrics.items()}
