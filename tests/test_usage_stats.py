"""Local opt-out usage stats (the role of reference vllm/usage/usage_lib.py
tests): records are flat KV JSON lines, opt-outs suppress them, nothing is
ever transmitted (zero-egress port keeps only the local file side)."""

import json
import os

import pytest

from kvcompress_tpu.utils import usage


@pytest.fixture(autouse=True)
def _reset_cache(monkeypatch, tmp_path):
    monkeypatch.setattr(usage, "_enabled_cache", None)
    monkeypatch.setattr(usage, "_USAGE_STATS_JSON_PATH",
                        str(tmp_path / "usage_stats.json"))
    monkeypatch.setattr(usage, "_DO_NOT_TRACK_PATH",
                        str(tmp_path / "do_not_track"))
    monkeypatch.delenv("KVC_NO_USAGE_STATS", raising=False)
    monkeypatch.delenv("KVC_DO_NOT_TRACK", raising=False)
    yield


def test_record_written_flat(tmp_path):
    usage.report_usage("LlamaForCausalLM", extra_kvs={"tp": 4}, block=True)
    lines = open(tmp_path / "usage_stats.json").read().splitlines()
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["model_architecture"] == "LlamaForCausalLM"
    assert rec["tp"] == 4
    # flat KV pairs only (reference server constraint, usage_lib.py:110)
    assert all(not isinstance(v, (dict, list)) for v in rec.values())


@pytest.mark.parametrize("env", ["KVC_NO_USAGE_STATS", "KVC_DO_NOT_TRACK"])
def test_env_opt_out(tmp_path, monkeypatch, env):
    monkeypatch.setenv(env, "1")
    usage.report_usage("X", block=True)
    assert not os.path.exists(tmp_path / "usage_stats.json")


def test_do_not_track_file(tmp_path):
    open(tmp_path / "do_not_track", "w").close()
    usage.report_usage("X", block=True)
    assert not os.path.exists(tmp_path / "usage_stats.json")
