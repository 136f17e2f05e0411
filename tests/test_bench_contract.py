"""Driver-contract tests for bench.py: it must print EXACTLY one JSON line
and exit 0 no matter what happens to its phase subprocesses (rounds 2 and 3
produced rc!=0 with no number; VERDICT r03 made this the round-4 hard gate).

The kill-path tests use the BENCH_TEST_STALL_AT hook: the measured pass
wedges (sleeps) once a fraction of the target tokens has been generated,
simulating a hung device/tunnel, and the parent must still emit a JSON
line — salvaged from the streamed PHASE_PROGRESS samples when possible.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
CACHE = "/tmp/kvc_test_cache_bench"


def _run_bench(extra_env, timeout=180):
    env = dict(os.environ)
    # pure-CPU subprocess: drop the axon site dir (JAX_PLATFORMS=cpu with
    # the axon sitecustomize still on PYTHONPATH hangs when the tunnel is
    # wedged - CLAUDE.md environment gotcha)
    path = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + path)
    env["JAX_PLATFORMS"] = "cpu"
    env["KVC_COMPILATION_CACHE"] = CACHE
    env["BENCH_QUICK"] = "1"
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True, env=env,
        timeout=timeout)
    return out


def _parse_json_line(stdout: str) -> dict:
    lines = [l for l in stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, f"expected exactly one JSON line:\n{stdout}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "decode_tokens_per_s_cr64"
    assert rec["unit"] == "tokens/s"
    assert isinstance(rec["value"], (int, float))
    assert isinstance(rec["vs_baseline"], (int, float))
    return rec


def test_quick_bench_emits_json():
    out = _run_bench({})
    assert out.returncode == 0, out.stderr[-2000:]
    rec = _parse_json_line(out.stdout)
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0


@pytest.mark.full
def test_wedged_phase_is_killed_and_salvaged():
    """Child wedges at 30% of the measured pass: the parent must kill the
    process group and reconstruct throughput from PHASE_PROGRESS lines."""
    out = _run_bench({
        "BENCH_BUDGET": "90", "BENCH_MIN_PHASE": "30",
        "BENCH_KILL_GRACE": "6", "BENCH_TEST_STALL_AT": "0.3",
        "BENCH_PROGRESS_INTERVAL": "0.0"})
    assert out.returncode == 0, out.stderr[-2000:]
    rec = _parse_json_line(out.stdout)
    assert rec["value"] > 0, out.stderr[-2000:]
    assert "salvaged-from-progress" in out.stderr


@pytest.mark.full
def test_no_data_still_emits_json():
    """Child wedges before ANY progress line: still one JSON line, rc 0."""
    out = _run_bench({
        "BENCH_BUDGET": "60", "BENCH_MIN_PHASE": "20",
        "BENCH_KILL_GRACE": "5", "BENCH_TEST_STALL_AT": "1e-9",
        "BENCH_PROGRESS_INTERVAL": "999"})
    assert out.returncode == 0, out.stderr[-2000:]
    rec = _parse_json_line(out.stdout)
    assert rec["value"] == 0.0


@pytest.mark.full
def test_measured_pass_triggers_zero_compiles():
    """The deterministic-variant-set invariant (CLAUDE.md): the warm pass
    must compile EVERY program variant the measured pass will use, so the
    measured pass dispatches with zero XLA compiles - the r04 driver run
    lost ~18 s to a compile at step 82 of the measured pass. Runs one
    compressed phase directly with JAX_LOG_COMPILES=1 and asserts no
    compile log lines appear after the init+warm marker."""
    env = dict(os.environ)
    path = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + path)
    env.update({
        "JAX_PLATFORMS": "cpu", "BENCH_QUICK": "1",
        "KVC_COMPILATION_CACHE": CACHE + "_zc",
        "JAX_LOG_COMPILES": "1",
        "BENCH_PHASE_DEADLINE": "600",
    })
    out = subprocess.run(
        [sys.executable, BENCH, "--phase", "compressed"],
        capture_output=True, text=True, env=env, timeout=500)
    assert "PHASE_RESULT" in out.stdout, out.stderr[-2000:]
    marker = out.stderr.find("init+warm=")
    assert marker != -1, out.stderr[-2000:]
    measured = out.stderr[marker:]
    compiles = [l for l in measured.splitlines()
                if "Compiling " in l or "Finished XLA compilation" in l]
    assert not compiles, compiles[:10]
