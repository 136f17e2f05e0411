"""Token-level guided decoding over a character DFA.

The role of the reference's guided-decoding logits processors
(vllm/model_executor/guided_decoding/): per-step allowed-token masks
computed in bulk with numpy - every vocabulary token's character sequence is
walked through the DFA transition table from every reachable state lazily
(the outlines algorithm), so a step mask is one row lookup.

Supports guided_regex (fsm.py subset), guided_choice (escaped alternation),
and guided_json (schema subset -> regex; or free-form JSON object regex for
response_format json_object).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

from kvcompress_tpu.guided.fsm import DFA, compile_regex

_JSON_STRING = r'"([^"\\]|\\.)*"'
_JSON_NUMBER = r"-?\d+(\.\d+)?([eE][+-]?\d+)?"
_JSON_BOOL = r"(true|false)"
_JSON_NULL = r"null"
# free-form flat JSON object (strings/numbers/bools/null values)
_JSON_VALUE = (f"({_JSON_STRING}|{_JSON_NUMBER}|{_JSON_BOOL}|{_JSON_NULL})")
JSON_OBJECT_REGEX = (
    r"\{( )?(" + _JSON_STRING + r"( )?:( )?" + _JSON_VALUE
    + r"(( )?,( )?" + _JSON_STRING + r"( )?:( )?" + _JSON_VALUE
    + r")*)?( )?\}")


def _escape(text: str) -> str:
    out = []
    for c in text:
        if c in r"\.[]{}()*+?|^$":
            out.append("\\" + c)
        else:
            out.append(c)
    return "".join(out)


def choices_to_regex(choices: Sequence[str]) -> str:
    return "(" + "|".join(_escape(c) for c in choices) + ")"


def json_schema_to_regex(schema: dict) -> str:
    """Practical JSON-schema subset -> regex: object with typed properties
    (string / integer / number / boolean / enum / nested object)."""
    t = schema.get("type", "object")
    if "enum" in schema:
        return ("(" + "|".join(
            _escape(json.dumps(v)) for v in schema["enum"]) + ")")
    if t == "string":
        return _JSON_STRING
    if t == "integer":
        return r"-?\d+"
    if t == "number":
        return _JSON_NUMBER
    if t == "boolean":
        return _JSON_BOOL
    if t == "null":
        return _JSON_NULL
    if t == "array":
        item = json_schema_to_regex(schema.get("items", {"type": "string"}))
        return r"\[( )?(" + item + r"(( )?,( )?" + item + r")*)?( )?\]"
    if t == "object":
        props = schema.get("properties", {})
        if not props:
            return JSON_OBJECT_REGEX
        parts = []
        for i, (name, sub) in enumerate(props.items()):
            if i:
                parts.append(r"( )?,( )?")
            parts.append(_escape(json.dumps(name)) + r"( )?:( )?"
                         + json_schema_to_regex(sub))
        return r"\{( )?" + "".join(parts) + r"( )?\}"
    raise ValueError(f"unsupported schema type {t}")


class TokenDFA:
    """DFA + per-state token transition/mask tables for one tokenizer."""

    _vocab_cache: Dict[int, tuple] = {}

    def __init__(self, pattern: str, tokenizer, vocab_size: int):
        token_strs = self._token_strings(tokenizer, vocab_size)
        alphabet = set(pattern)
        # chars introduced by escapes / classes: include the vocab's chars
        for s in token_strs:
            alphabet.update(s)
        alphabet.discard("")
        self.dfa: DFA = compile_regex(pattern, alphabet)
        # token char-index matrix [V, max_len]: -1 = padding (token ended),
        # -2 = character not in the DFA alphabet (kills the path)
        max_len = max((len(s) for s in token_strs), default=1)
        tok_mat = np.full((vocab_size, max_len), -1, np.int32)
        for i, s in enumerate(token_strs):
            for j, c in enumerate(s):
                tok_mat[i, j] = self.dfa.char_to_idx.get(c, -2)
        self.tok_mat = tok_mat
        self.empty_tokens = np.asarray(
            [len(s) == 0 for s in token_strs], bool)
        self._state_cache: Dict[int, tuple] = {}

    @classmethod
    def _token_strings(cls, tokenizer, vocab_size: int) -> List[str]:
        key = id(tokenizer)
        if key in cls._vocab_cache:
            return cls._vocab_cache[key]
        strs = []
        for i in range(vocab_size):
            try:
                strs.append(tokenizer.decode([i]))
            except Exception:
                strs.append("")
        cls._vocab_cache[key] = strs
        return strs

    def _tables_for(self, state: int):
        """(next_state [V] i32, allowed [V] bool) from `state`: walk every
        token's chars through the transition table, vectorised."""
        cached = self._state_cache.get(state)
        if cached is not None:
            return cached
        V, M = self.tok_mat.shape
        cur = np.full((V,), state, np.int32)
        for j in range(M):
            ch = self.tok_mat[:, j]
            done = ch == -1       # token ended: state is final
            dead = (ch == -2) | (cur < 0)  # unknown char / already dead
            nxt = self.dfa.transitions[np.clip(cur, 0, None),
                                       np.clip(ch, 0, None)]
            cur = np.where(done, cur, np.where(dead, -1, nxt))
        # empty-string tokens keep the state but are never required; allow
        # them only if the state itself is accepting (they can't advance)
        allowed = cur >= 0
        allowed[self.empty_tokens] = False
        out = (cur, allowed)
        self._state_cache[state] = out
        return out

    def allowed_mask(self, state: int) -> np.ndarray:
        return self._tables_for(state)[1]

    def next_state(self, state: int, token_id: int) -> int:
        return int(self._tables_for(state)[0][token_id])

    def is_accepting(self, state: int) -> bool:
        return bool(self.dfa.accepting[state]) if state >= 0 else False

    def can_continue(self, state: int) -> bool:
        return state >= 0 and bool((self.dfa.transitions[state] >= 0).any())


class GuidedDecodingState:
    """Per-sequence guided-decoding automaton state."""

    _dfa_cache: Dict[tuple, TokenDFA] = {}

    def __init__(self, sampling_params, tokenizer, vocab_size: int,
                 eos_token_ids=()):
        sp = sampling_params
        if sp.guided_regex:
            pattern = sp.guided_regex
        elif sp.guided_choice:
            pattern = choices_to_regex(sp.guided_choice)
        elif sp.guided_json is not None:
            if sp.guided_json is True or sp.guided_json == {}:
                pattern = JSON_OBJECT_REGEX
            else:
                pattern = json_schema_to_regex(sp.guided_json)
        else:
            raise ValueError("no guided constraint set")
        key = (pattern, id(tokenizer), vocab_size)
        tdfa = self._dfa_cache.get(key)
        if tdfa is None:
            tdfa = TokenDFA(pattern, tokenizer, vocab_size)
            self._dfa_cache[key] = tdfa
        self.tdfa = tdfa
        self.state = 0
        self.eos_token_ids = set(eos_token_ids)
        self.vocab_size = vocab_size

    def mask(self) -> np.ndarray:
        """[V] bool allowed-token mask for the current state; EOS allowed
        exactly when the matched text is complete."""
        m = self.tdfa.allowed_mask(self.state).copy()
        if self.tdfa.is_accepting(self.state):
            for e in self.eos_token_ids:
                if 0 <= e < self.vocab_size:
                    m[e] = True
        if not m.any():
            # dead end (shouldn't happen with a correct DFA): allow EOS
            for e in self.eos_token_ids:
                if 0 <= e < self.vocab_size:
                    m[e] = True
        return m

    def advance(self, token_id: int) -> None:
        if token_id in self.eos_token_ids:
            self.state = -1
            return
        self.state = self.tdfa.next_state(self.state, token_id)

    @property
    def finished(self) -> bool:
        return self.state == -1 or (
            self.tdfa.is_accepting(self.state)
            and not self.tdfa.can_continue(self.state))
