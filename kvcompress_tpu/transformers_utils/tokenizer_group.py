"""Tokenizer group with an optional thread pool for detokenization.

The role of reference vllm/transformers_utils/tokenizer_group/ (sync
TokenizerGroup + the ray/pooled variants behind
VLLM_TOKENIZER_POOL_SIZE): per-step detokenization is host-side work that
otherwise serializes with engine scheduling on the serving thread. HF
fast tokenizers release the GIL inside their Rust core and are
thread-safe for encode/decode, so a plain ThreadPoolExecutor gives real
parallelism across sequences - no worker processes or ray actors needed
on this runtime. Pool size comes from KVC_TOKENIZER_POOL_SIZE (0 =
inline, the default; the single-core CI image gains nothing from a
pool).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence, Tuple


class TokenizerGroup:
    def __init__(self, tokenizer, pool_size: Optional[int] = None):
        from kvcompress_tpu import envs
        self.tokenizer = tokenizer
        if pool_size is None:
            pool_size = envs.KVC_TOKENIZER_POOL_SIZE
        self._pool = (ThreadPoolExecutor(
            pool_size, thread_name_prefix="kvc-tok")
            if pool_size and pool_size > 0 else None)

    # ------------------------------------------------- sync passthrough
    def encode(self, text: str, **kw) -> List[int]:
        return self.tokenizer.encode(text, **kw)

    def decode(self, ids: Sequence[int], **kw) -> str:
        return self.tokenizer.decode(ids, **kw)

    # --------------------------------------------- pooled detokenization
    def batch_update(self, jobs: List[Tuple[object, List[int]]]
                     ) -> List[str]:
        """Run `detok.update(ids)` for every (detok, ids) job - across
        the pool when one is configured, inline otherwise. Returns the
        per-job text deltas in order. Each job touches a DIFFERENT
        IncrementalDetokenizer instance, so jobs are independent; the
        shared HF tokenizer is only read."""
        if self._pool is None or len(jobs) <= 1:
            return [d.update(ids) for d, ids in jobs]
        return list(self._pool.map(lambda j: j[0].update(j[1]), jobs))

    def shutdown(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False)
