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
        out, _ = p.communicate(timeout=540)
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
