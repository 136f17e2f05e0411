"""Systematic block-accounting invariant checker (sanitizer).

The role of the reference's kernel-test compute-sanitizer posture
(kernel-test/run.sh memcheck/racecheck over the CUDA kernels) translated
to this runtime's failure modes: the paged cache has no pointers to
corrupt, but its correctness rests on BLOCK-ACCOUNTING invariants that
every program (prefill alloc, decode append, compression compaction,
verify rollback, frees, prefix harvest/adopt/release) must preserve:

  I1  no physical block is referenced twice across live table entries
      (aliasing = silent KV cross-talk between sequences/heads/layers);
  I2  live table entries never reference a block that is simultaneously
      on a free stack (use-after-free);
  I3  every block id lives in its partition's id range (shard-locality,
      the TP requirement of core/state.py);
  I4  conservation: live + free + pooled(+trash) account for every block
      exactly once - a deficit is a leak, a surplus is double-ownership.

Run modes: KVC_CHECK_INVARIANTS=1 makes LLMEngine.step() verify state
after every step (fault detection in CI / soak runs; costs one device
fetch per step, so it is strictly a debug mode); tests call
check_block_invariants directly and also assert the checker CATCHES
seeded corruption (a checker only counts if it fails on purpose).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def check_block_invariants(state, prefix_pool=None,
                           max_errors: int = 8) -> List[str]:
    """Returns a list of human-readable violations (empty = clean)."""
    bt = np.asarray(state.block_tables)        # [L, S, H, B]
    ctx = np.asarray(state.context_lens)       # [L, S, H]
    stack = np.asarray(state.free_stack)       # [G, cap]
    top = np.asarray(state.free_top)           # [G]
    num_blocks = state.k_cache.shape[0]
    bs = state.k_cache.shape[1]
    L, S, H, B = bt.shape
    G, cap = stack.shape
    errors: List[str] = []

    def err(msg):
        if len(errors) < max_errors:
            errors.append(msg)

    # live table entries: blocks with index < ceil(ctx / bs)
    nb_alloc = -(-ctx // bs)                   # [L, S, H]
    live_mask = np.arange(B)[None, None, None, :] < nb_alloc[..., None]
    live = bt[live_mask]
    live = live[live != 0]                     # trash block is shareable

    # I1: aliasing
    uniq, counts = np.unique(live, return_counts=True)
    for bid in uniq[counts > 1][:max_errors]:
        where = np.argwhere((bt == bid) & live_mask)[:3]
        err(f"I1 aliasing: block {int(bid)} referenced "
            f"{int(counts[uniq == bid][0])}x, e.g. (L,S,H,i)="
            f"{[tuple(map(int, w)) for w in where]}")

    # free sets per partition
    free_ids = []
    for g in range(G):
        ids = stack[g, :top[g]]
        free_ids.append(ids)
        lo, hi = g * cap, (g + 1) * cap
        bad = ids[(ids < lo) | (ids >= hi)]
        for bid in bad[:2]:
            err(f"I3 range: free id {int(bid)} outside partition {g} "
                f"range [{lo}, {hi})")
        u, c = np.unique(ids, return_counts=True)
        for bid in u[c > 1][:2]:
            err(f"I4 double-free: id {int(bid)} on partition {g}'s "
                f"stack {int(c[u == bid][0])}x")
    free_all = (np.concatenate(free_ids) if free_ids
                else np.zeros(0, np.int32))

    # I2: use-after-free
    inter = np.intersect1d(np.unique(live), free_all)
    for bid in inter[:max_errors]:
        err(f"I2 use-after-free: block {int(bid)} is live in a table "
            "AND on a free stack")

    # I3 for live ids: partition locality by head group (and layer group
    # when pipeline partitioning is active). Partition of (l, h) follows
    # core/state._group_flatten; recover it from the id range instead:
    live_idx = np.argwhere(live_mask & (bt != 0))
    if len(live_idx):
        ids = bt[live_mask & (bt != 0)]
        part_of_id = ids // cap
        # expected partition from (l, h): head-group partitioning is
        # h // (H / Gh) with optional layer-group major (pipeline); both
        # layouts keep a given (l, h) in ONE partition, so it suffices
        # to check consistency: every (l, h) pair only ever holds ids of
        # a single partition.
        lh = live_idx[:, 0] * H + live_idx[:, 2]
        for pair in np.unique(lh):
            parts = np.unique(part_of_id[lh == pair])
            if len(parts) > 1:
                err(f"I3 shard-locality: (layer={int(pair) // H}, "
                    f"head={int(pair) % H}) holds blocks of partitions "
                    f"{parts.tolist()}")
                if len(errors) >= max_errors:
                    break

    # I4: conservation
    pooled = 0
    if prefix_pool is not None:
        pooled = sum(e.cost_blocks for e in prefix_pool.entries)
    n_live = len(live)
    n_free = int(top.sum())
    total = n_live + n_free + pooled + 1  # + trash block
    if total != num_blocks:
        err(f"I4 conservation: live {n_live} + free {n_free} + pooled "
            f"{pooled} + trash 1 = {total} != num_blocks {num_blocks} "
            f"({'leak' if total < num_blocks else 'double-ownership'})")
    return errors


def assert_block_invariants(state, prefix_pool=None) -> None:
    errors = check_block_invariants(state, prefix_pool)
    if errors:
        raise AssertionError(
            "block-accounting invariants violated:\n  "
            + "\n  ".join(errors))
