"""Guided decoding: regex/choice/JSON constrained generation through the
full engine (the reference's guided_decoding/ surface, rebuilt on a
dependency-free char DFA + vectorised token masks)."""

import json
import re

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.guided.fsm import compile_regex
from kvcompress_tpu.guided.processor import (GuidedDecodingState, TokenDFA,
                                             json_schema_to_regex)
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.sampling_params import SamplingParams
from tests.test_engine import VOCAB, tiny_cfg, run_all


class CharTokenizer:
    """Token id i decodes to a printable char (ids 0-94 -> ascii 32-126);
    id 95 is EOS (decodes to '')."""
    eos_token_id = 95

    def encode(self, text):
        return [ord(c) - 32 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(i + 32) for i in ids
                       if 0 <= i < 95)


def test_dfa_matches_python_re():
    pat = r"(ab|cd)+e?\d{2,3}"
    alphabet = set("abcdef0123456789xy")
    dfa = compile_regex(pat, alphabet)

    def dfa_match(s):
        st = 0
        for c in s:
            ci = dfa.char_to_idx.get(c)
            if ci is None:
                return False
            st = dfa.transitions[st, ci]
            if st < 0:
                return False
        return bool(dfa.accepting[st])

    rng = np.random.default_rng(0)
    chars = "abcde019x"
    for _ in range(300):
        n = rng.integers(0, 9)
        s = "".join(rng.choice(list(chars)) for _ in range(n))
        assert dfa_match(s) == bool(re.fullmatch(pat, s)), s


@pytest.fixture(scope="module")
def engine_factory():
    cfg = tiny_cfg()
    params = init_llama_params(cfg.model, seed=0, dtype=jnp.float32)

    def make():
        return LLMEngine(tiny_cfg(), params, num_blocks=512,
                         attn_impl="xla", tokenizer=CharTokenizer())

    return make


def _run_guided(eng, **sp_kw):
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, VOCAB, size=7).tolist()
    rid = eng.add_request(None, prompt_token_ids=prompt,
                          sampling_params=SamplingParams(
                              temperature=0.0, max_tokens=30, **sp_kw))
    return run_all(eng)[rid].outputs[0]


def test_guided_regex(engine_factory):
    out = _run_guided(engine_factory(), guided_regex=r"ab\d\d")
    assert re.fullmatch(r"ab\d\d", out.text), out.text


def test_guided_choice(engine_factory):
    choices = ["yes", "no", "maybe"]
    out = _run_guided(engine_factory(), guided_choice=choices)
    assert out.text in choices, out.text


def test_guided_json_schema(engine_factory):
    schema = {"type": "object",
              "properties": {"age": {"enum": [1, 2, 3]},
                             "ok": {"type": "boolean"}}}
    out = _run_guided(engine_factory(), guided_json=schema)
    data = json.loads(out.text)
    assert data["age"] in (1, 2, 3)
    assert isinstance(data["ok"], bool)


def test_json_schema_regex_shapes():
    r = json_schema_to_regex({"type": "integer"})
    assert re.fullmatch(r.replace(r"\d", "[0-9]"), "-42")
