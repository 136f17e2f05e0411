"""Sampling-surface features end-to-end through the tiny engine: stop
strings, min_tokens, per-request seeds (batch-composition independent),
logprobs, logit_bias, penalties, and SSE streaming outputs - the feature
set of reference vllm/sampling_params.py + layers/sampler.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.sampling_params import SamplingParams
from tests.test_engine import VOCAB, tiny_cfg, run_all


class DummyTokenizer:
    eos_token_id = None

    def encode(self, text):
        return [int(t) for t in text.split()]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def params():
    return init_llama_params(tiny_cfg().model, seed=0, dtype=jnp.float32)


def make_engine(params, **kw):
    return LLMEngine(tiny_cfg(), params, num_blocks=512, attn_impl="xla",
                     tokenizer=DummyTokenizer(), **kw)


def _greedy(engine, prompt, **sp_kw):
    rid = engine.add_request(None, prompt_token_ids=prompt,
                             sampling_params=SamplingParams(
                                 temperature=0.0, ignore_eos=True, **sp_kw))
    return run_all(engine)[rid].outputs[0]


def test_stop_strings(params):
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, VOCAB, size=9).tolist()
    eng = make_engine(params)
    base = _greedy(eng, prompt, max_tokens=12)
    assert len(base.token_ids) == 12
    # stop on the text of the 4th generated token
    stop_tok = str(base.token_ids[3])
    eng2 = make_engine(params)
    out = _greedy(eng2, prompt, max_tokens=12, stop=[stop_tok])
    assert out.finish_reason == "stop"
    assert out.stop_reason == stop_tok
    assert stop_tok not in out.text.split() or len(out.token_ids) < 12


def test_min_tokens_suppresses_eos(params):
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, VOCAB, size=7).tolist()
    eng = make_engine(params)
    base = _greedy(eng, prompt, max_tokens=10)
    # force an "EOS" that would fire at the first generated token
    eos = base.token_ids[0]
    eng2 = make_engine(params)
    eng2.eos_token_ids = {eos}
    rid = eng2.add_request(None, prompt_token_ids=prompt,
                           sampling_params=SamplingParams(
                               temperature=0.0, max_tokens=10, min_tokens=5))
    out = run_all(eng2)[rid].outputs[0]
    assert len(out.token_ids) >= 5


def test_seeded_sampling_reproducible_across_batches(params):
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, VOCAB, size=8).tolist()
    other = rng.integers(0, VOCAB, size=11).tolist()

    def run_seeded(extra_request: bool):
        eng = make_engine(params)
        if extra_request:
            eng.add_request("pad", prompt_token_ids=other,
                            sampling_params=SamplingParams(
                                temperature=0.7, seed=99, max_tokens=12,
                                ignore_eos=True))
        rid = eng.add_request(None, prompt_token_ids=prompt,
                              sampling_params=SamplingParams(
                                  temperature=0.9, seed=1234, max_tokens=12,
                                  ignore_eos=True))
        return run_all(eng)[rid].outputs[0].token_ids

    a = run_seeded(False)
    b = run_seeded(True)   # different batch composition, same seed
    assert a == b
    c_eng = make_engine(params)
    rid = c_eng.add_request(None, prompt_token_ids=prompt,
                            sampling_params=SamplingParams(
                                temperature=0.9, seed=4321, max_tokens=12,
                                ignore_eos=True))
    c = run_all(c_eng)[rid].outputs[0].token_ids
    assert c != a  # different seed -> different tokens (overwhelmingly)


def test_logprobs(params):
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, VOCAB, size=6).tolist()
    eng = make_engine(params)
    out = _greedy(eng, prompt, max_tokens=5, logprobs=3)
    assert out.logprobs is not None and len(out.logprobs) == 5
    for tok, entry in zip(out.token_ids, out.logprobs):
        assert tok in entry
        assert all(lp <= 0.0 for lp in entry.values())
        # greedy: the chosen token must be the argmax -> the highest logprob
        assert entry[tok] == max(entry.values())


def test_logit_bias_forces_token(params):
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, VOCAB, size=6).tolist()
    eng = make_engine(params)
    out = _greedy(eng, prompt, max_tokens=4, logit_bias={7: 1000.0})
    assert out.token_ids == [7, 7, 7, 7]


def test_penalties_change_output(params):
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, VOCAB, size=6).tolist()
    eng = make_engine(params)
    base = _greedy(eng, prompt, max_tokens=8)
    eng2 = make_engine(params)
    out = _greedy(eng2, prompt, max_tokens=8, repetition_penalty=5.0,
                  frequency_penalty=2.0)
    # strong penalties must avoid immediate repetition of generated tokens
    reps = sum(1 for a, b in zip(out.token_ids, out.token_ids[1:])
               if a == b)
    base_ok = base.token_ids != out.token_ids or reps == 0
    assert base_ok


def test_streaming_outputs(params):
    from kvcompress_tpu.engine.async_engine import AsyncEngine
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, VOCAB, size=6).tolist()
    eng = make_engine(params)
    async_eng = AsyncEngine(eng)
    stream = async_eng.submit(None, prompt,
                              SamplingParams(temperature=0.0, max_tokens=9,
                                             ignore_eos=True))
    outs = list(stream)
    assert outs[-1].finished
    assert all(not o.finished for o in outs[:-1])
    # token ids grow monotonically across stream items
    lens = [len(o.outputs[0].token_ids) for o in outs]
    assert lens == sorted(lens) and lens[-1] == 9
    async_eng.shutdown()


def test_tokenizer_pool_matches_inline(params, monkeypatch):
    """KVC_TOKENIZER_POOL_SIZE>0 routes per-seq detokenization through
    the thread pool (transformers_utils/tokenizer_group.py); outputs -
    text, stop-string truncation, finish reasons - must be identical to
    the inline path (reference tokenizer_group pooled variants)."""
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, VOCAB, size=9).tolist() for _ in range(3)]

    def serve(prompts, stop=None):
        eng = make_engine(params)
        rids = [eng.add_request(None, prompt_token_ids=p,
                                sampling_params=SamplingParams(
                                    temperature=0.0, ignore_eos=True,
                                    max_tokens=10, stop=stop))
                for p in prompts]
        outs = run_all(eng)
        return [(outs[r].outputs[0].text, outs[r].outputs[0].finish_reason,
                 outs[r].outputs[0].stop_reason) for r in rids]

    inline = serve(prompts)
    stop_tok = inline[0][0].split()[4]
    inline_stop = serve(prompts, stop=[stop_tok])

    monkeypatch.setenv("KVC_TOKENIZER_POOL_SIZE", "2")
    pooled = serve(prompts)
    pooled_stop = serve(prompts, stop=[stop_tok])
    assert pooled == inline
    assert pooled_stop == inline_stop
    assert any(r[1] == "stop" for r in pooled_stop)
