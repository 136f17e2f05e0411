"""Observability subsystems: hierarchical profiler, debug checkpointer
(record/replay equality), tracer spans, Prometheus exposition, and the
request-latency histograms (reference vllm/benchmark.py, vllm/debug.py,
vllm/tracing.py, vllm/engine/metrics.py)."""

import json

import numpy as np
import pytest

from kvcompress_tpu.utils.debug import Checkpointer
from kvcompress_tpu.utils.metrics import EngineStats
from kvcompress_tpu.utils.profiler import Benchmarker
from kvcompress_tpu.utils.tracing import Tracer


def test_profiler_tree():
    b = Benchmarker()
    b.enable()
    with b.range("step"):
        with b.range("compress"):
            pass
        with b.range("decode"):
            with b.range("kernel"):
                pass

    @b.wrap("wrapped_fn")
    def f():
        return 42

    assert f() == 42
    s = b.summarize()
    assert "step" in s and "decode" in s and "kernel" in s
    assert "wrapped_fn" in s
    # disabled profiler adds nothing
    b2 = Benchmarker()
    b2.disable()
    with b2.range("x"):
        pass
    assert "x" not in b2.summarize()


def test_checkpointer_record_replay(tmp_path):
    save = Checkpointer()
    save.configure(save_dir=str(tmp_path))
    save.checkpoint("metrics", np.arange(6).reshape(2, 3))
    save.checkpoint("metrics", np.ones(4))

    load = Checkpointer()
    load.configure(load_dir=str(tmp_path))
    load.checkpoint("metrics", np.arange(6).reshape(2, 3))  # ok
    with pytest.raises(AssertionError):
        load.checkpoint("metrics", np.zeros(4))  # mismatch vs ones


def test_tracer_spans(tmp_path):
    f = tmp_path / "trace.jsonl"
    t = Tracer(trace_file=str(f))
    t.start_request("r1", **{"gen_ai.usage.prompt_tokens": 7})
    t.event("r1", "prefill")
    t.finish_request("r1", **{"gen_ai.usage.completion_tokens": 3})
    rows = [json.loads(l) for l in open(f)]
    assert len(rows) == 1
    assert rows[0]["attributes"]["gen_ai.usage.prompt_tokens"] == 7
    assert rows[0]["events"][0]["name"] == "prefill"
    assert rows[0]["end"] >= rows[0]["start"]


def test_prometheus_exposition():
    s = EngineStats()
    s.counter("evicted_kvs", 128)
    s.gauge("running_seqs", 4)
    s.timer("e2e_request_latency_seconds", 0.02)
    text = s.prometheus()
    assert "kvc_evicted_kvs_total 128" in text
    assert "kvc_running_seqs 4" in text
    assert 'kvc_e2e_request_latency_seconds_bucket{le="0.025"} 1' in text
    assert "kvc_e2e_request_latency_seconds_count 1" in text


def test_engine_latency_histograms():
    import jax.numpy as jnp
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.models.llama import init_llama_params
    from kvcompress_tpu.sampling_params import SamplingParams
    from tests.test_engine import VOCAB, tiny_cfg, run_all

    cfg = tiny_cfg()
    params = init_llama_params(cfg.model, seed=0, dtype=jnp.float32)
    eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
    rng = np.random.default_rng(0)
    eng.add_request(None, prompt_token_ids=rng.integers(
        0, VOCAB, size=8).tolist(),
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True))
    run_all(eng)
    assert eng.stats.hist_count["e2e_request_latency_seconds"] == 1
    assert eng.stats.hist_count["time_to_first_token_seconds"] == 1
    assert eng.stats.hist_count["time_per_output_token_seconds"] == 1
