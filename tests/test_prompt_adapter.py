"""Prompt adapters (prefix tuning): a soft prompt whose vectors equal the
embedding rows of concrete tokens must generate exactly what prompting with
those tokens generates (reference vllm/prompt_adapter/); plus
even_layer_evict balancing and artificial-preemption fault injection."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.config import PromptAdapterConfig
from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.prompt_adapter import PromptAdapterRequest
from kvcompress_tpu.sampling_params import SamplingParams
from tests.test_engine import VOCAB, tiny_cfg, run_all


@pytest.fixture(scope="module")
def params():
    return init_llama_params(tiny_cfg().model, seed=0, dtype=jnp.float32)


def test_prompt_adapter_equals_token_prefix(params):
    rng = np.random.default_rng(0)
    virtual_tokens = rng.integers(0, VOCAB, size=5).tolist()
    prompt = rng.integers(0, VOCAB, size=8).tolist()

    # reference: prompt with the concrete prefix tokens
    eng0 = LLMEngine(tiny_cfg(), params, num_blocks=512, attn_impl="xla")
    rid = eng0.add_request(None, prompt_token_ids=virtual_tokens + prompt,
                           sampling_params=SamplingParams(
                               temperature=0.0, max_tokens=6,
                               ignore_eos=True))
    expected = run_all(eng0)[rid].outputs[0].token_ids

    # adapter whose soft prompt IS those tokens' embedding rows
    cfg = tiny_cfg()
    cfg.prompt_adapter = PromptAdapterConfig(
        enable_prompt_adapter=True, max_prompt_adapters=2,
        max_prompt_adapter_token=8)
    eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
    emb = np.asarray(params["embed"])[virtual_tokens]
    req = PromptAdapterRequest("style_a", 1,
                               prompt_adapter_num_virtual_tokens=5)
    eng.add_prompt_adapter(req, embeddings=emb)
    rid = eng.add_request(None, prompt_token_ids=list(prompt),
                          sampling_params=SamplingParams(
                              temperature=0.0, max_tokens=6,
                              ignore_eos=True),
                          prompt_adapter_request=req)
    got = run_all(eng)[rid].outputs[0].token_ids
    assert got == expected


def test_even_layer_evict_balances_layers(params):
    import jax
    from kvcompress_tpu.kvcompress.eviction import schedule_evictions

    rng = np.random.default_rng(1)
    B, L, H, nb, bs = 1, 4, 2, 4, 4
    n = nb * bs
    # layer 0 has much lower metrics: greedy selection would drain it
    metrics = np.ones((B, L, H, n), np.float32)
    metrics[:, 0] = 0.001 * rng.random((B, H, n))
    positions = np.broadcast_to(np.arange(n, dtype=np.int32),
                                (B, L, H, n)).copy()
    ctx = np.full((B, L, H), n, np.int32)
    args = (jnp.asarray(metrics), jnp.asarray(positions), jnp.asarray(ctx),
            jnp.asarray([n - 1], np.int32), jnp.asarray([0], np.int32),
            jnp.asarray([8], np.int32))
    greedy = schedule_evictions(*args, block_size=bs)
    even = schedule_evictions(*args, block_size=bs, even_layer_evict=True)
    g = np.asarray(greedy.evicted_block_count).sum(axis=(0, 2))  # per layer
    e = np.asarray(even.evicted_block_count).sum(axis=(0, 2))
    assert g[0] == 8 and g[1:].sum() == 0          # greedy drains layer 0
    np.testing.assert_array_equal(e, [2, 2, 2, 2])  # even split

    # remainder distribution: budget % L extra blocks go to the
    # globally-lowest leftover candidates instead of being dropped
    args9 = args[:-1] + (jnp.asarray([9], np.int32),)
    even9 = schedule_evictions(*args9, block_size=bs, even_layer_evict=True)
    e9 = np.asarray(even9.evicted_block_count).sum(axis=(0, 2))
    assert e9.sum() == 9
    np.testing.assert_array_equal(e9, [3, 2, 2, 2])  # extra -> lowest layer

    # budget smaller than L must still evict (previously stalled at 0)
    args3 = args[:-1] + (jnp.asarray([3], np.int32),)
    even3 = schedule_evictions(*args3, block_size=bs, even_layer_evict=True)
    e3 = np.asarray(even3.evicted_block_count).sum(axis=(0, 2))
    assert e3.sum() == 3
    np.testing.assert_array_equal(e3, [3, 0, 0, 0])


def test_artificial_preemption(params):
    os.environ["KVC_TEST_ENABLE_ARTIFICIAL_PREEMPT"] = "1"
    os.environ["KVC_TEST_ARTIFICIAL_PREEMPT_RATE"] = "0.5"
    try:
        np.random.seed(0)
        eng = LLMEngine(tiny_cfg(), params, num_blocks=512, attn_impl="xla")
        rng = np.random.default_rng(2)
        rids = []
        for i in range(3):
            rids.append(eng.add_request(
                None, prompt_token_ids=rng.integers(0, VOCAB,
                                                    size=8).tolist(),
                sampling_params=SamplingParams(temperature=0.0,
                                               max_tokens=10,
                                               ignore_eos=True)))
        outs = run_all(eng)
        assert all(len(outs[r].outputs[0].token_ids) == 10 for r in rids)
        assert eng.stats.counters.get("preemptions", 0) > 0
    finally:
        del os.environ["KVC_TEST_ENABLE_ARTIFICIAL_PREEMPT"]
        del os.environ["KVC_TEST_ARTIFICIAL_PREEMPT_RATE"]
