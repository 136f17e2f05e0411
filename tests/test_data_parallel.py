"""Data-parallel serving: DataParallelEngine routes requests across
independent LLMEngine replicas pinned to disjoint mesh slices (the role of
the reference's data-parallel groups, vllm/distributed/parallel_state.py:
798-807 get_dp_group), and greedy outputs match a single-replica engine.

Runs on the virtual 8-device CPU mesh: dp=2 x tp=4 (a 2x4 device grid) and
dp=4 x tp=1.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.parallel.data_parallel import DataParallelEngine
from kvcompress_tpu.sampling_params import SamplingParams

from tests.test_tp_engine import VOCAB, tp_cfg, _run


@pytest.fixture(scope="module")
def params():
    return init_llama_params(tp_cfg().model, seed=0, dtype=jnp.float32)


def dp_cfg(dp, tp):
    cfg = tp_cfg(tp=tp)
    cfg.parallel.data_parallel_size = dp
    return cfg


@pytest.mark.parametrize(
    "dp,tp", [(2, 4), pytest.param(4, 1, marks=pytest.mark.full)])
def test_dp_matches_single_replica(params, dp, tp):
    if len(jax.devices()) < dp * tp:
        pytest.skip(f"needs {dp * tp} virtual devices")
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, VOCAB, size=n).tolist()
               for n in (40, 33, 24, 19, 28)]

    ref_eng = LLMEngine(tp_cfg(tp=tp), params, num_blocks=512,
                        attn_impl="xla")
    ref = _run(ref_eng, prompts)

    eng = DataParallelEngine(dp_cfg(dp, tp), params, num_blocks=512,
                             attn_impl="xla")
    assert len(eng.replicas) == dp
    # replicas live on disjoint device slices
    seen = set()
    for rep in eng.replicas:
        devs = set(rep.mesh.devices.flat)
        assert not (devs & seen), "replica device slices overlap"
        seen |= devs
    got = _run(eng, prompts)

    assert got == ref, f"dp={dp} tp={tp} diverged from single replica"
    # the routing actually spread the 5 requests over the replicas
    loads = [len(r._seqs) for r in eng.replicas]
    assert sum(loads) == len(prompts)
    assert sum(1 for l in loads if l > 0) >= min(dp, len(prompts)) - 1
    assert eng.total_evicted_kvs > 0, "compression never ran under DP"


def test_dp_least_loaded_routing_and_abort(params):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    eng = DataParallelEngine(dp_cfg(2, 1), params, num_blocks=512,
                             attn_impl="xla")
    rng = np.random.default_rng(1)
    rids = [eng.add_request(
        None, prompt_token_ids=rng.integers(0, VOCAB, size=12).tolist(),
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True))
        for _ in range(4)]
    # 4 idle-submitted requests alternate 2/2 across the replicas
    assert sorted(len(r._seqs) for r in eng.replicas) == [2, 2]
    eng.abort_request(rids[0])
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            outs[o.request_id] = o
    assert rids[0] not in outs or outs[rids[0]].outputs[0].token_ids == []
    assert all(len(outs[r].outputs[0].token_ids) == 4 for r in rids[1:])


def test_dp_needs_enough_devices(params):
    cfg = dp_cfg(len(jax.devices()) + 1, 1)
    with pytest.raises(ValueError, match="devices"):
        DataParallelEngine(cfg, params, num_blocks=64, attn_impl="xla")


def test_dp_serves_metrics_and_embeddings(params):
    """The OpenAI server surfaces DataParallelEngine lacked: /metrics
    (aggregated stats) and /v1/embeddings (programs delegate)."""
    import json as js
    import urllib.request
    from kvcompress_tpu.entrypoints.openai.api_server import OpenAIServer

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")

    class _Tok:
        eos_token_id = 0
        chat_template = None

        def encode(self, text):
            return [(ord(c) % (VOCAB - 1)) + 1 for c in text][:16]

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (i % 26)) for i in ids)

    eng = DataParallelEngine(dp_cfg(2, 1), params, num_blocks=256,
                             attn_impl="xla", tokenizer=_Tok())
    srv = OpenAIServer(eng, model_name="dp-tiny")
    httpd = srv.serve(host="127.0.0.1", port=0, background=True)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        req = urllib.request.Request(
            url + "/v1/completions",
            data=js.dumps({"prompt": "hello there", "max_tokens": 3,
                           "temperature": 0.0,
                           "ignore_eos": True}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = js.loads(r.read())
        assert out["usage"]["completion_tokens"] == 3
        with urllib.request.urlopen(url + "/metrics") as r:
            text = r.read().decode()
        assert "requests_added" in text
        req = urllib.request.Request(
            url + "/v1/embeddings",
            data=js.dumps({"input": "embed me"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            emb = js.loads(r.read())
        assert len(emb["data"][0]["embedding"]) > 0
    finally:
        srv.close()
