"""N-gram speculative decoding: identical greedy outputs with fewer engine
steps on repetitive prompts (the reference's ngram_worker + batch-expansion
scoring contract, vllm/spec_decode/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.config import SpeculativeConfig
from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.sampling_params import SamplingParams
from tests.test_engine import VOCAB, tiny_cfg, run_all


@pytest.fixture(scope="module")
def params():
    return init_llama_params(tiny_cfg().model, seed=0, dtype=jnp.float32)


def _run(params, spec_tokens, prompt, max_tokens=16, count_steps=False,
         compression=False):
    cfg = tiny_cfg()
    cfg.speculative = SpeculativeConfig(num_speculative_tokens=spec_tokens)
    if not compression:
        cfg.kvcompress.enabled = False
    eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
    eng.multi_step = 1
    rid = eng.add_request(None, prompt_token_ids=prompt,
                          sampling_params=SamplingParams(
                              temperature=0.0, max_tokens=max_tokens,
                              ignore_eos=True))
    steps = 0
    outs = {}
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                outs[out.request_id] = out
        steps += 1
    if count_steps:
        return outs[rid].outputs[0].token_ids, steps, eng
    return outs[rid].outputs[0].token_ids


def test_spec_matches_plain_greedy(params):
    rng = np.random.default_rng(0)
    # repetitive prompt so the n-gram proposer fires
    pattern = rng.integers(0, VOCAB, size=5).tolist()
    prompt = (pattern * 4)[:18]
    plain = _run(params, 0, prompt)
    spec = _run(params, 3, prompt)
    assert spec == plain


def test_spec_accepts_and_saves_steps(params):
    rng = np.random.default_rng(1)
    pattern = rng.integers(0, VOCAB, size=4).tolist()
    prompt = (pattern * 5)[:20]
    plain, steps_plain, _ = _run(params, 0, prompt, count_steps=True)
    spec, steps_spec, eng = _run(params, 3, prompt, count_steps=True)
    assert spec == plain
    accepted = eng.stats.counters.get("spec_accepted_tokens", 0)
    if accepted > 0:
        assert steps_spec < steps_plain
    # block accounting stays consistent after rollbacks
    assert eng.scheduler.free_blocks == eng.scheduler.total_blocks


def test_spec_random_prompts_match(params):
    rng = np.random.default_rng(2)
    for trial in range(3):
        prompt = rng.integers(0, VOCAB, size=12).tolist()
        plain = _run(params, 0, prompt, max_tokens=10)
        spec = _run(params, 2, prompt, max_tokens=10)
        assert spec == plain, trial


def test_spec_with_compression_smoke(params):
    """Spec decode + KVC compression coexist (beyond the reference, which
    forbids the combination): outputs stay exact-greedy-consistent with the
    spec-off compressed run."""
    rng = np.random.default_rng(3)
    pattern = rng.integers(0, VOCAB, size=4).tolist()
    prompt = (pattern * 5)[:20]

    def run_c(spec_tokens):
        cfg = tiny_cfg(compression_interval=4)
        cfg.speculative = SpeculativeConfig(
            num_speculative_tokens=spec_tokens)
        eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
        eng.multi_step = 1
        rid = eng.add_request(None, prompt_token_ids=prompt,
                              sampling_params=SamplingParams(
                                  temperature=0.0, max_tokens=12,
                                  ignore_eos=True,
                                  target_compression_rate=0.6,
                                  protected_window_size=8))
        return run_all(eng)[rid].outputs[0].token_ids, eng

    toks_spec, eng = run_c(3)
    assert len(toks_spec) == 12
    assert eng.scheduler.total_evicted_kvs > 0
