"""Regression guards for bench.py's driver-facing budget machinery
(VERDICT r3 #1: round 3's bench overran the driver timeout and the
driver recorded NOTHING — these tests pin the fail-soft behaviors that
make that impossible now: last-line parse of incremental output, partial
recovery on subprocess timeout, and budget-gated skips)."""

import importlib
import json
import os
import subprocess
import sys
import textwrap

import bench


def test_run_e2e_subprocess_parses_last_json_line(tmp_path, monkeypatch):
    """A subprocess printing progressive JSON lines contributes its LAST
    complete line."""
    script = tmp_path / "fake_bench.py"
    script.write_text(textwrap.dedent("""
        import json, sys
        if "--e2e" in sys.argv:
            print(json.dumps({"a": 1}))
            print("noise that is not json")
            print(json.dumps({"a": 1, "b": 2}))
    """))
    monkeypatch.setattr(bench.os.path, "abspath", lambda p: str(script))
    got = bench._run_e2e_subprocess("--e2e", "e2e_error", timeout_s=60)
    assert got == {"a": 1, "b": 2}


def test_run_e2e_subprocess_recovers_partial_on_timeout(tmp_path,
                                                        monkeypatch):
    """A subprocess killed by the timeout still contributes the JSON it
    printed before dying, tagged as partial."""
    script = tmp_path / "fake_bench.py"
    script.write_text(textwrap.dedent("""
        import json, sys, time
        print(json.dumps({"partial": True}), flush=True)
        time.sleep(300)
    """))
    monkeypatch.setattr(bench.os.path, "abspath", lambda p: str(script))
    got = bench._run_e2e_subprocess("--e2e", "e2e_error", timeout_s=3)
    assert got.get("partial") is True
    assert "e2e_error_partial" in got


def test_run_e2e_subprocess_reports_failure(tmp_path, monkeypatch):
    """A subprocess that prints no JSON at all yields an error record,
    never an exception."""
    script = tmp_path / "fake_bench.py"
    script.write_text("import sys; print('boom'); sys.exit(3)\n")
    monkeypatch.setattr(bench.os.path, "abspath", lambda p: str(script))
    got = bench._run_e2e_subprocess("--e2e", "e2e_error", timeout_s=30)
    assert "e2e_error" in got and "rc=3" in got["e2e_error"]


def test_budget_env_is_respected():
    """BLADE_BENCH_BUDGET_S reaches BUDGET_S at import time and the
    default stays within the driver's observed tolerance (r3 timed out;
    r4's 1500 s default + overhead completed in ~23 min)."""
    assert bench.BUDGET_S == 1500.0 or os.environ.get("BLADE_BENCH_BUDGET_S")
    src = subprocess.run(
        [sys.executable, "-c",
         "import os; os.environ['BLADE_BENCH_BUDGET_S']='7';"
         "os.environ['JAX_PLATFORMS']='cpu';"
         "import bench; print(bench.BUDGET_S)"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(bench.__file__)))
    assert src.stdout.strip().splitlines()[-1] == "7.0", src.stderr[-500:]


def test_e2e_impl_budget_skips_extras(monkeypatch):
    """With an exhausted internal budget the wan e2e impl must skip the
    optional sections (reuse/batch2/bf16 decode) and record the skips —
    checked structurally on the source to stay CPU-cheap."""
    import inspect

    src = inspect.getsource(bench.bench_e2e_impl)
    assert "e2e_reuse_skipped" in src
    assert "e2e_batch2_skipped" in src
    assert "BLADE_E2E_BUDGET_S" in src
    src_cog = inspect.getsource(bench.bench_cog_e2e_impl)
    assert "cog_e2e_reuse_skipped" in src_cog


def test_e2e_sections_ordered_by_metric_importance():
    """VERDICT r4 #1: the north-star metrics (clip seconds incl. VAE
    decode, clips/min, speedup pair) must be assembled BEFORE the optional
    extras (realistic-density leg, reuse, batch-2, bf16 VAE), so a driver
    timeout can no longer lose them.  Pinned structurally on source order."""
    import inspect

    src = inspect.getsource(bench.bench_e2e_impl)
    order = [src.index(k) for k in (
        '"e2e_denoise8_sparse_s"',      # 1. sparse denoise
        '"e2e_clips_per_min_chip"',     # 2. decode -> clip metrics
        '"e2e_speedup_vs_50step_dense"',  # 3. dense -> north star done
        '"e2e_denoise8_sparse_realistic_s"',  # 4. realistic-density leg
        "_bench_e2e_reuse(",            # 5. extras last
        '"e2e_denoise8_sparse_batch2_s"',
        '"e2e_decode_bf16_s"',
    )]
    assert order == sorted(order), order

    src_cog = inspect.getsource(bench.bench_cog_e2e_impl)
    # dense leg first (the r4 driver artifact had sparse only), speedup
    # pair emitted as soon as sparse lands, decode + reuse after
    assert src_cog.index('"dense"') < src_cog.index('"sparse"')
    cog_order = [src_cog.index(k) for k in (
        '"cog_e2e_denoise_speedup"',
        '"cog_clip_s_8step_sparse"',
        "_bench_cog_e2e_reuse(",
    )]
    assert cog_order == sorted(cog_order), cog_order


def test_tdm480_section_runs_by_default():
    """VERDICT r4 #4: the 480p TDM step must be driver-visible — default
    ON (opt-out via env), budget-gated, timeout recorded as a skip."""
    import inspect

    src = inspect.getsource(bench.main)
    assert 'os.environ.get("BLADE_BENCH_TDM480", "1")' in src
    assert "tdm_480p_skipped" in src
    assert "compile cache cold" in src


def test_headline_emitted_before_optional_sections():
    """main() must print a complete headline line before any e2e section
    (the driver parses the LAST complete line; an early print guarantees
    one exists if the process is killed mid-extra)."""
    import inspect

    src = inspect.getsource(bench.main)
    first_emit = src.index("emit()  # headline secured")
    e2e_section = src.index("bench_e2e(")
    assert first_emit < e2e_section
