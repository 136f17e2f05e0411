"""Engine-level pipeline parallelism: LLMEngine greedy output WITH
compression at pp=2 (and pp=2 x tp=2) on the virtual 8-device CPU mesh must
be identical to the single-device engine.

Serving-side counterpart of the reference's virtual-engine PP
(vllm/engine/llm_engine.py:406-438, distributed/parallel_state.py:798-807),
re-designed TPU-first: layer-stacked weights and the per-layer cache state
shard over a "pipe" mesh axis, the prefill/decode trunks run as GPipe
shard_map programs with ppermute activation hops (parallel/pipeline.py
pipeline_paged_prefill/decode), and the block allocator's layer-group-major
partitions (core/state.py) keep every stage's blocks in its own pool shard.
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


def pp_cfg(pp=1, tp=1):
    model = ModelConfig(
        num_layers=4, num_heads=8, num_kv_heads=4, head_size=16,
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
        parallel=ParallelConfig(pipeline_parallel_size=pp,
                                tensor_parallel_size=tp),
    )


@pytest.fixture(scope="module")
def params():
    return init_llama_params(pp_cfg().model, seed=0, dtype=jnp.float32)


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


def _prompts(n=3):
    rng = np.random.default_rng(0)
    return [rng.integers(0, VOCAB, size=int(ln)).tolist()
            for ln in rng.integers(9, 30, size=n)]


@pytest.mark.parametrize("pp,tp", [(2, 1),
                                   pytest.param(2, 2,
                                                marks=pytest.mark.full)])
def test_pp_matches_single_with_compression(params, pp, tp):
    if len(jax.devices()) < pp * tp:
        pytest.skip("needs 8 virtual devices")
    prompts = _prompts()
    ref = _run(LLMEngine(pp_cfg(), params, num_blocks=512,
                         attn_impl="xla"), prompts)
    got = _run(LLMEngine(pp_cfg(pp=pp, tp=tp), params, num_blocks=512,
                         attn_impl="xla"), prompts)
    assert got == ref


def test_pp_no_compression_parity(params):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    prompts = _prompts(2)
    ref = _run(LLMEngine(pp_cfg(), params, num_blocks=512,
                         attn_impl="xla"), prompts, compress=False)
    got = _run(LLMEngine(pp_cfg(pp=2), params, num_blocks=512,
                         attn_impl="xla"), prompts, compress=False)
    assert got == ref


def test_pp_rejects_unsupported_combos(params):
    from kvcompress_tpu.config import SpeculativeConfig
    cfg = pp_cfg(pp=2)
    cfg.speculative = SpeculativeConfig(num_speculative_tokens=3)
    with pytest.raises(ValueError, match="speculative"):
        LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
    cfg2 = pp_cfg(pp=3)  # 4 layers not divisible by 3
    with pytest.raises(ValueError, match="divisible"):
        LLMEngine(cfg2, params, num_blocks=512, attn_impl="xla")
    with pytest.raises(ValueError, match="(?i)pallas"):
        LLMEngine(pp_cfg(pp=2), params, num_blocks=512,
                  attn_impl="pallas")
