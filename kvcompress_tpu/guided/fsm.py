"""Regex -> NFA -> DFA compiler for constrained decoding.

The role of the reference's outlines / lm-format-enforcer integration
(vllm/model_executor/guided_decoding/): a dependency-free character-level
automaton supporting the practical regex subset
    literals, escapes (\\d \\w \\s \\n \\t and punctuation), char classes
    [a-z0-9_] (incl. negation), '.', alternation '|', grouping '()', and
    quantifiers * + ? {m} {m,} {m,n}
compiled over an explicit alphabet (the characters appearing in the
tokenizer vocabulary plus those referenced by the pattern), so the DFA
transition table is a dense [n_states, n_chars] matrix that token masks can
be computed against in bulk (guided/processor.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, FrozenSet, List, Optional, Set, Tuple

Pred = Callable[[str], bool]

_ESCAPES: Dict[str, Pred] = {
    "d": lambda c: c.isdigit(),
    "D": lambda c: not c.isdigit(),
    "w": lambda c: c.isalnum() or c == "_",
    "W": lambda c: not (c.isalnum() or c == "_"),
    "s": lambda c: c.isspace(),
    "S": lambda c: not c.isspace(),
    "n": lambda c: c == "\n",
    "t": lambda c: c == "\t",
    "r": lambda c: c == "\r",
}


@dataclasses.dataclass
class _NFA:
    """Thompson NFA fragment: states are ints; edges (src, pred, dst);
    eps edges (src, dst)."""
    n: int
    edges: List[Tuple[int, Pred, int]]
    eps: List[Tuple[int, int]]
    start: int
    accept: int


class _Parser:
    """Recursive-descent regex parser producing a Thompson NFA."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0
        self.n_states = 0

    def new_state(self) -> int:
        s = self.n_states
        self.n_states += 1
        return s

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def eat(self) -> str:
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self) -> _NFA:
        frag = self.alternation()
        if self.i != len(self.p):
            raise ValueError(f"unexpected '{self.peek()}' at {self.i}")
        return frag

    def alternation(self) -> _NFA:
        frags = [self.concat()]
        while self.peek() == "|":
            self.eat()
            frags.append(self.concat())
        if len(frags) == 1:
            return frags[0]
        start, accept = self.new_state(), self.new_state()
        edges, eps = [], []
        for f in frags:
            edges += f.edges
            eps += f.eps
            eps.append((start, f.start))
            eps.append((f.accept, accept))
        return _NFA(self.n_states, edges, eps, start, accept)

    def concat(self) -> _NFA:
        frags = []
        while self.peek() not in (None, "|", ")"):
            frags.append(self.repeat())
        if not frags:
            s = self.new_state()
            return _NFA(self.n_states, [], [], s, s)
        edges, eps = [], []
        for f in frags:
            edges += f.edges
            eps += f.eps
        for a, b in zip(frags, frags[1:]):
            eps.append((a.accept, b.start))
        return _NFA(self.n_states, edges, eps, frags[0].start,
                    frags[-1].accept)

    def repeat(self) -> _NFA:
        frag = self.atom()
        while self.peek() in ("*", "+", "?", "{"):
            op = self.eat()
            if op == "{":
                lo = ""
                while self.peek() and self.peek().isdigit():
                    lo += self.eat()
                hi: Optional[str] = lo
                if self.peek() == ",":
                    self.eat()
                    hi = ""
                    while self.peek() and self.peek().isdigit():
                        hi += self.eat()
                assert self.eat() == "}"
                frag = self._bounded(frag, int(lo or 0),
                                     int(hi) if hi else None)
            elif op == "*":
                frag = self._star(frag)
            elif op == "+":
                frag = self._concat2(frag, self._star(self._clone(frag)))
            elif op == "?":
                frag = self._opt(frag)
        return frag

    # ---- fragment combinators ----
    def _star(self, f: _NFA) -> _NFA:
        start, accept = self.new_state(), self.new_state()
        eps = list(f.eps) + [(start, f.start), (start, accept),
                             (f.accept, f.start), (f.accept, accept)]
        return _NFA(self.n_states, list(f.edges), eps, start, accept)

    def _opt(self, f: _NFA) -> _NFA:
        start, accept = self.new_state(), self.new_state()
        eps = list(f.eps) + [(start, f.start), (start, accept),
                             (f.accept, accept)]
        return _NFA(self.n_states, list(f.edges), eps, start, accept)

    def _concat2(self, a: _NFA, b: _NFA) -> _NFA:
        return _NFA(self.n_states, a.edges + b.edges,
                    a.eps + b.eps + [(a.accept, b.start)], a.start,
                    b.accept)

    def _clone(self, f: _NFA) -> _NFA:
        remap: Dict[int, int] = {}

        def m(s: int) -> int:
            if s not in remap:
                remap[s] = self.new_state()
            return remap[s]

        edges = [(m(a), p, m(b)) for a, p, b in f.edges]
        eps = [(m(a), m(b)) for a, b in f.eps]
        return _NFA(self.n_states, edges, eps, m(f.start), m(f.accept))

    def _bounded(self, f: _NFA, lo: int, hi: Optional[int]) -> _NFA:
        parts = [f] + [self._clone(f) for _ in range(max(lo, 1) - 1)]
        frag = parts[0]
        for nxt in parts[1:]:
            frag = self._concat2(frag, nxt)
        if lo == 0:
            frag = self._opt(frag)
        if hi is None:
            frag = self._concat2(frag, self._star(self._clone(f)))
        else:
            for _ in range(hi - max(lo, 1)):
                frag = self._concat2(frag, self._opt(self._clone(f)))
        return frag

    # ---- atoms ----
    def atom(self) -> _NFA:
        c = self.eat()
        if c == "(":
            if self.p[self.i:self.i + 2] == "?:":
                self.i += 2
            frag = self.alternation()
            assert self.eat() == ")"
            return frag
        if c == "[":
            return self._char_class()
        if c == ".":
            return self._edge(lambda ch: ch != "\n")
        if c == "\\":
            e = self.eat()
            if e in _ESCAPES:
                return self._edge(_ESCAPES[e])
            return self._edge(lambda ch, e=e: ch == e)
        return self._edge(lambda ch, c=c: ch == c)

    def _edge(self, pred: Pred) -> _NFA:
        a, b = self.new_state(), self.new_state()
        return _NFA(self.n_states, [(a, pred, b)], [], a, b)

    def _char_class(self) -> _NFA:
        negate = False
        if self.peek() == "^":
            self.eat()
            negate = True
        preds: List[Pred] = []
        while self.peek() != "]":
            c = self.eat()
            if c == "\\":
                e = self.eat()
                if e in _ESCAPES:
                    preds.append(_ESCAPES[e])
                else:
                    preds.append(lambda ch, e=e: ch == e)
            elif self.peek() == "-" and self.p[self.i + 1] != "]":
                self.eat()
                hi = self.eat()
                preds.append(lambda ch, lo=c, hi=hi: lo <= ch <= hi)
            else:
                preds.append(lambda ch, c=c: ch == c)
        self.eat()  # ']'

        def pred(ch, preds=preds, negate=negate):
            hit = any(p(ch) for p in preds)
            return hit != negate

        return self._edge(pred)


class DFA:
    """Dense DFA over an explicit alphabet.

    transitions: [n_states, n_chars] int32 (-1 = dead);
    accepting: [n_states] bool; char_to_idx: char -> column."""

    def __init__(self, transitions, accepting, char_to_idx):
        self.transitions = transitions
        self.accepting = accepting
        self.char_to_idx = char_to_idx

    @property
    def n_states(self) -> int:
        return len(self.accepting)


def compile_regex(pattern: str, alphabet: Set[str]) -> DFA:
    """Compile `pattern` to a DFA over `alphabet` (subset construction)."""
    import numpy as np

    nfa = _Parser(pattern).parse()
    # eps-closure
    eps_adj: Dict[int, List[int]] = {}
    for a, b in nfa.eps:
        eps_adj.setdefault(a, []).append(b)

    def closure(states: Set[int]) -> FrozenSet[int]:
        stack = list(states)
        seen = set(states)
        while stack:
            s = stack.pop()
            for t in eps_adj.get(s, ()):
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    edges_by_src: Dict[int, List[Tuple[Pred, int]]] = {}
    for a, p, b in nfa.edges:
        edges_by_src.setdefault(a, []).append((p, b))

    chars = sorted(alphabet)
    char_to_idx = {c: i for i, c in enumerate(chars)}
    start = closure({nfa.start})
    dfa_states: Dict[FrozenSet[int], int] = {start: 0}
    worklist = [start]
    rows: List[List[int]] = []
    accepting: List[bool] = []

    while worklist:
        cur = worklist.pop()
        idx = dfa_states[cur]
        while len(rows) <= idx:
            rows.append([-1] * len(chars))
            accepting.append(False)
        accepting[idx] = nfa.accept in cur
        for ci, ch in enumerate(chars):
            nxt: Set[int] = set()
            for s in cur:
                for p, b in edges_by_src.get(s, ()):
                    if p(ch):
                        nxt.add(b)
            if not nxt:
                continue
            cl = closure(nxt)
            if cl not in dfa_states:
                dfa_states[cl] = len(dfa_states)
                worklist.append(cl)
            rows[idx][ci] = dfa_states[cl]

    n = len(dfa_states)
    while len(rows) < n:
        rows.append([-1] * len(chars))
        accepting.append(False)
    trans = np.asarray(rows, np.int32)
    return DFA(trans, np.asarray(accepting, bool), char_to_idx)
