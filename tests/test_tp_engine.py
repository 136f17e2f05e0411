"""Engine-level tensor parallelism: LLMEngine greedy output WITH compression
at TP=4 on the virtual 8-device CPU mesh must be identical to TP=1, for both
the XLA attention impl and the production pallas kernels in interpret mode.

This is the serving-path integration of the capability the reference lists
as an open question (vllm/kvcompress/README.md "How to support multi-GPU?";
TP hard-blocked at vllm/config.py:702-703): the engine builds the mesh from
ParallelConfig, megatron-shards the weights, shards the cache state on the
kv-head axis, and the pallas attention runs per shard via shard_map
(parallel/shard_attn.py) with the partitioned block allocator keeping every
head's blocks shard-local.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                   KVCompressConfig, ModelConfig,
                                   ParallelConfig, SchedulerConfig)
from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.sampling_params import SamplingParams

VOCAB = 128
TP = 4


def tp_cfg(tp=1):
    model = ModelConfig(
        num_layers=2, num_heads=8, num_kv_heads=4, head_size=16,
        hidden_size=64, intermediate_size=128, vocab_size=VOCAB,
        max_model_len=64, rope_theta=10000.0, dtype="float32")
    return EngineConfig(
        model=model,
        cache=CacheConfig(block_size=4, cache_dtype="float32"),
        kvcompress=KVCompressConfig(
            compression_interval=4, max_kv_per_compression=65536,
            max_cache_moves_per_compression=4096),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=64,
                                  prefill_buckets=(16, 32, 64)),
        parallel=ParallelConfig(tensor_parallel_size=tp),
    )


@pytest.fixture(scope="module")
def params():
    return init_llama_params(tp_cfg().model, seed=0, dtype=jnp.float32)


def _run(engine, prompts, max_tokens=12, compress=True):
    outs = {}
    rids = []
    for p in prompts:
        kw = dict(max_cache_tokens=16, protected_window_size=4) \
            if compress else {}
        rids.append(engine.add_request(
            None, prompt_token_ids=p,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=max_tokens, ignore_eos=True,
                **kw)))
    steps = 0
    while engine.has_unfinished_requests():
        for out in engine.step():
            outs[out.request_id] = out
        steps += 1
        assert steps < 500
    return [outs[r].outputs[0].token_ids for r in rids]


@pytest.mark.parametrize(
    "impl", ["xla", pytest.param("interpret", marks=pytest.mark.full)])
def test_tp4_matches_tp1_with_compression(params, impl):
    if len(jax.devices()) < TP:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, VOCAB, size=n).tolist()
               for n in (40, 33, 24)]

    eng1 = LLMEngine(tp_cfg(tp=1), params, num_blocks=512, attn_impl=impl)
    ref = _run(eng1, prompts)
    assert eng1.scheduler.total_evicted_kvs > 0, "compression never ran"

    eng4 = LLMEngine(tp_cfg(tp=TP), params, num_blocks=512, attn_impl=impl)
    assert eng4.mesh is not None
    got = _run(eng4, prompts)
    assert eng4.scheduler.total_evicted_kvs > 0

    assert got == ref, f"TP={TP} diverged from TP=1 under impl={impl}"


def test_tp4_no_compression_parity(params):
    if len(jax.devices()) < TP:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, VOCAB, size=17).tolist()]
    eng1 = LLMEngine(tp_cfg(tp=1), params, num_blocks=512, attn_impl="xla")
    eng4 = LLMEngine(tp_cfg(tp=TP), params, num_blocks=512, attn_impl="xla")
    assert (_run(eng4, prompts, compress=False)
            == _run(eng1, prompts, compress=False))
