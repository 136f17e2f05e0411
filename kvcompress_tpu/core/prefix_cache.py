"""Host-side prefix pool: block-hash chains -> harvested device blocks.

The TPU-native re-design of the reference's prefix caching
(vllm/core/block_manager_v2.py + vllm/core/block/prefix_caching_block.py
PrefixCachingBlockAllocator). The reference shares physical blocks via
content-hash dedup with refcounts and copy-on-write; under this runtime's
invariants (donated CacheState, per-(layer,head) block exclusivity,
in-place compression rewrites) sharing would poison every program, so the
pool instead owns harvested blocks outright and serves HITS BY COPY:

  * contribute(): a finished, never-compressed sequence's full prompt
    blocks transfer to the pool (engine/programs.py prefix_harvest) and
    register under the prompt's per-block hash chain - the reference's
    hash-of-prefix scheme (prefix_caching_block.py hash_block_tokens).
  * lookup(): the longest cached chain prefix of a new prompt, rounded
    DOWN to a power-of-two block count (bounds the compiled
    adopt/continuation variant set) and capped so at least one suffix
    token remains to produce the first logits.
  * Memory pressure: the engine releases LRU entries back to the free
    stacks (prefix_release) before ever preempting a running sequence.

A hit costs one HBM block-row copy (~1 ms for a 6k-token full-depth
prefix) instead of recomputing the prefill (~0.7 s) - the same TTFT win
prefix caching exists for, with none of the refcount/COW machinery.
"""

from __future__ import annotations

import dataclasses
import hashlib
import time
from typing import Dict, List, Optional, Tuple


@dataclasses.dataclass
class PoolEntry:
    blocks: object          # [L, H, NB] device array of harvested ids
    n_blocks: int           # valid prefix blocks (<= NB)
    chain: List[bytes]      # hash chain, one digest per full block
    cost_blocks: int        # physical blocks held (= n_blocks * L * H)
    last_used: float = 0.0


def chain_hashes(token_ids, block_size: int, n_blocks: int) -> List[bytes]:
    """h_i = H(h_{i-1} || tokens of block i) for the first n_blocks full
    blocks (reference hash_block_tokens chaining)."""
    out: List[bytes] = []
    h = b""
    for i in range(n_blocks):
        blk = token_ids[i * block_size:(i + 1) * block_size]
        m = hashlib.blake2b(h, digest_size=16)
        m.update(bytes(str(list(blk)), "utf-8"))
        h = m.digest()
        out.append(h)
    return out


class PrefixPool:
    def __init__(self, block_size: int, layers_x_heads: int,
                 max_pool_blocks: int):
        self.block_size = block_size
        self.lxh = layers_x_heads
        self.max_pool_blocks = max_pool_blocks
        self.pool_blocks = 0
        self.entries: List[PoolEntry] = []
        # digest -> (entry, depth): depth = how many blocks of the entry
        # the digest certifies
        self.index: Dict[bytes, Tuple[PoolEntry, int]] = {}

    # ------------------------------------------------------------ lookup
    def lookup(self, prompt_ids) -> Optional[Tuple[PoolEntry, int]]:
        """Longest cached pow2 prefix of the prompt, capped to leave at
        least one token to prefill. Returns (entry, n_blocks) or None."""
        bs = self.block_size
        max_full = (len(prompt_ids) - 1) // bs
        if max_full < 1:
            return None
        chain = chain_hashes(prompt_ids, bs, max_full)
        # pow2 candidates, longest first
        n = 1 << (max_full.bit_length() - 1)
        while n >= 1:
            hit = self.index.get(chain[n - 1])
            if hit is not None:
                entry, depth = hit
                if depth >= n:
                    entry.last_used = time.monotonic()
                    return entry, n
            n >>= 1
        return None

    # -------------------------------------------------------- contribute
    def wants(self, prompt_ids) -> int:
        """Blocks a contribution of this prompt would add (0 = already
        cached or nothing to cache or over budget)."""
        bs = self.block_size
        n = (len(prompt_ids) - 1) // bs
        if n < 1:
            return 0
        chain = chain_hashes(prompt_ids, bs, n)
        if chain[n - 1] in self.index:
            return 0  # identical prefix already pooled
        if self.pool_blocks + n * self.lxh > self.max_pool_blocks:
            return 0
        return n

    def contribute(self, prompt_ids, blocks, n_blocks: int) -> None:
        chain = chain_hashes(prompt_ids, self.block_size, n_blocks)
        entry = PoolEntry(blocks=blocks, n_blocks=n_blocks, chain=chain,
                          cost_blocks=n_blocks * self.lxh,
                          last_used=time.monotonic())
        self.entries.append(entry)
        self.pool_blocks += entry.cost_blocks
        for depth, digest in enumerate(chain, start=1):
            # first contributor wins; any entry certifying a digest at
            # depth d shares those d blocks' contents by construction
            self.index.setdefault(digest, (entry, depth))

    # ---------------------------------------------------------- eviction
    def pop_lru(self) -> Optional[PoolEntry]:
        """Remove and return the least-recently-used entry (caller frees
        its device blocks via prefix_release)."""
        if not self.entries:
            return None
        entry = min(self.entries, key=lambda e: e.last_used)
        self.entries.remove(entry)
        self.pool_blocks -= entry.cost_blocks
        self.index = {d: (e, dep) for d, (e, dep) in self.index.items()
                      if e is not entry}
        # re-index surviving entries so shared prefixes stay reachable
        for e in self.entries:
            for depth, digest in enumerate(e.chain, start=1):
                self.index.setdefault(digest, (e, depth))
        return entry

    def __len__(self) -> int:
        return len(self.entries)
