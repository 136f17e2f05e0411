"""Incremental detokenization + stop-string handling.

The role of reference vllm/transformers_utils/detokenizer.py
(detokenize_incrementally) and the stop-string checks in
vllm/engine/output_processor/stop_checker.py: decode newly generated token
ids into a text delta without re-decoding the whole output (and without
emitting bytes of an incomplete UTF-8 / sentencepiece cluster), then scan
for per-request stop strings.
"""

from __future__ import annotations

from typing import List, Optional, Tuple


class IncrementalDetokenizer:
    """Per-sequence incremental decoder using the prefix/read offset scheme
    of the reference: text is emitted only once the suffix decode stops
    producing a replacement char or growing cluster."""

    def __init__(self, tokenizer, skip_special_tokens: bool = True):
        self.tokenizer = tokenizer
        self.skip = skip_special_tokens
        self.prefix_offset = 0
        self.read_offset = 0
        self.text = ""

    def update(self, all_output_ids: List[int]) -> str:
        """Feed the full output id list; returns the new text delta."""
        tok = self.tokenizer
        prefix = tok.decode(
            all_output_ids[self.prefix_offset:self.read_offset],
            skip_special_tokens=self.skip)
        full = tok.decode(all_output_ids[self.prefix_offset:],
                          skip_special_tokens=self.skip)
        if len(full) > len(prefix) and not full.endswith("�"):
            delta = full[len(prefix):]
            self.prefix_offset = self.read_offset
            self.read_offset = len(all_output_ids)
            self.text += delta
            return delta
        return ""


def check_stop_strings(text: str, stops: Optional[List[str]],
                       delta_len: int) -> Tuple[Optional[str], int]:
    """Scan the tail of `text` for any stop string. Returns
    (matched_stop, truncate_at) where truncate_at is the char index the
    output text should be cut to (stop string excluded, reference
    SamplingParams semantics), or (None, -1)."""
    if not stops:
        return None, -1
    # a stop string may straddle the last delta; search a bounded tail
    window = delta_len + max(len(s) for s in stops)
    start = max(0, len(text) - window)
    best = None
    best_pos = len(text) + 1
    for s in stops:
        if not s:
            continue
        pos = text.find(s, start)
        if pos != -1 and pos < best_pos:
            best, best_pos = s, pos
    if best is None:
        return None, -1
    return best, best_pos
