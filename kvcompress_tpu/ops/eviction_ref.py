"""Pure-numpy executable specification of the KV-Compress eviction pipeline.

These are the oracle implementations our JAX/Pallas eviction ops are tested
against, mirroring the role of the ref_* functions in the reference
(vllm/_custom_ops.py:774-933 ref_schedule_cache_evictions,
:1022-1060 ref_count_block_evictions, :1108-1155 ref_schedule_t1_cache_moves,
:1182-1218 ref_execute_cache_moves) and the v2 sort pipeline
(vllm/kvcompress/metrics.py:441-847).

Data model (dense, per-sequence): everything is indexed by
(seq, layer, head, logical_kv_index) with a fixed logical capacity
n = max_blocks * block_size per head. This differs from the reference's
flat physical-block workspace but computes identical eviction decisions.

Tie-breaking is deterministic: KVs within a head are ordered by
(metric, logical_index); blocks within a sequence by
(block_metric, layer, head, block_index).
"""

from __future__ import annotations

import numpy as np

INF = np.inf


def hanging_token_count(context_lens: np.ndarray, block_size: int) -> np.ndarray:
    """Number of KVs in the final allocated block of each head: block_size if
    the last block is full, else ctx % block_size
    (reference kvcompress/block.py:330-335)."""
    rem = context_lens % block_size
    return np.where((rem == 0) & (context_lens > 0), block_size, rem)


def ref_schedule_evictions(
    metrics: np.ndarray,       # [B, L, H, n] float32 (bias already applied)
    positions: np.ndarray,     # [B, L, H, n] int32, -1 for empty slots
    context_lens: np.ndarray,  # [B, L, H] int32
    last_position: np.ndarray,  # [B] int32
    protected_window: np.ndarray,  # [B] int32
    evicted_blocks_per_seq: np.ndarray,  # [B] int32
    block_size: int,
    num_sinks: int = 0,
):
    """Decide which KVs to evict.

    Returns:
        evicted_mask: [B, L, H, n] bool over logical kv indices
        evicted_kv_count: [B, L, H] int32
        evicted_block_count: [B, L, H] int32
    """
    B, L, H, n = metrics.shape
    nb = n // block_size
    evicted_mask = np.zeros((B, L, H, n), dtype=bool)
    evicted_kv_count = np.zeros((B, L, H), dtype=np.int32)
    evicted_block_count = np.zeros((B, L, H), dtype=np.int32)

    logical = np.arange(n)
    hanging = hanging_token_count(context_lens, block_size)

    for b in range(B):
        # Per-head sorted KV order and per-block representative metrics.
        sort_order = np.empty((L, H, n), dtype=np.int64)
        block_metrics = np.full((L, H, nb), INF, dtype=np.float64)
        for l in range(L):
            for h in range(H):
                ctx = context_lens[b, l, h]
                valid = logical < ctx
                evictable = (
                    valid
                    & (positions[b, l, h] <= last_position[b] - protected_window[b])
                    & (positions[b, l, h] >= num_sinks)
                )
                key = np.where(evictable, metrics[b, l, h].astype(np.float64), INF)
                order = np.lexsort((logical, key))
                sort_order[l, h] = order
                sorted_key = key[order]
                if ctx > 0:
                    hang = hanging[b, l, h]
                    for blk in range(nb):
                        # metric of the last KV that would actually be
                        # evicted if this block is the final evicted block
                        # (reference metrics.py:590-596)
                        m = sorted_key[blk * block_size + hang - 1]
                        block_metrics[l, h, blk] = m

        # Per-sequence block budget selection (reference metrics.py:667-729):
        # sort candidate blocks by metric and evict the lowest ones, never
        # evicting a block whose representative metric is inf.
        flat = []
        for l in range(L):
            for h in range(H):
                for blk in range(nb):
                    flat.append((block_metrics[l, h, blk], l, h, blk))
        flat.sort(key=lambda t: (t[0], t[1], t[2], t[3]))
        finite_count = sum(1 for t in flat if not np.isinf(t[0]))
        n_select = min(int(evicted_blocks_per_seq[b]), finite_count)
        e = np.zeros((L, H), dtype=np.int32)
        for t in flat[:n_select]:
            e[t[1], t[2]] += 1

        # Per-head evicted KV count: freeing k blocks removes
        # (k-1)*block_size + hanging KVs (reference metrics.py:788-792 and
        # count_block_evictions null-out in _custom_ops.py:1045-1052).
        for l in range(L):
            for h in range(H):
                k = e[l, h]
                if k == 0:
                    continue
                c = (k - 1) * block_size + hanging[b, l, h]
                evicted_block_count[b, l, h] = k
                evicted_kv_count[b, l, h] = c
                evicted_mask[b, l, h, sort_order[l, h][:c]] = True

    return evicted_mask, evicted_kv_count, evicted_block_count


def ref_schedule_moves(
    evicted_mask: np.ndarray,      # [B, L, H, n] bool
    evicted_kv_count: np.ndarray,  # [B, L, H]
    context_lens: np.ndarray,      # [B, L, H]
):
    """Plan the two-pointer compaction: fill eviction holes below the new
    context length with surviving KVs from the tail
    (reference _custom_ops.py:1108-1155 / kvcompress_eviction_kernels.cu:223-289).

    Returns a list of per-head move lists [(dst_logical, src_logical), ...].
    """
    B, L, H, n = evicted_mask.shape
    moves = {}
    for b in range(B):
        for l in range(L):
            for h in range(H):
                ctx = int(context_lens[b, l, h])
                c = int(evicted_kv_count[b, l, h])
                new_ctx = ctx - c
                holes = [i for i in range(new_ctx) if evicted_mask[b, l, h, i]]
                srcs = [
                    i for i in range(ctx - 1, new_ctx - 1, -1)
                    if not evicted_mask[b, l, h, i]
                ]
                assert len(holes) == len(srcs), (
                    f"holes/survivors mismatch {len(holes)} != {len(srcs)}"
                )
                moves[(b, l, h)] = list(zip(holes, srcs))
    return moves


def ref_execute_moves(
    k_cache: np.ndarray,     # [num_blocks, block_size, head_size]
    v_cache: np.ndarray,
    kv_metrics: np.ndarray,  # [num_blocks, block_size]
    kv_positions: np.ndarray,  # [num_blocks, block_size]
    block_tables: np.ndarray,  # [B, L, H, nb]
    moves: dict,
    block_size: int,
) -> None:
    """Apply compaction moves in place, carrying K/V/metric/position
    (reference _custom_ops.py:1182-1218)."""
    for (b, l, h), pairs in moves.items():
        for dst, src in pairs:
            db, do = block_tables[b, l, h, dst // block_size], dst % block_size
            sb, so = block_tables[b, l, h, src // block_size], src % block_size
            k_cache[db, do] = k_cache[sb, so]
            v_cache[db, do] = v_cache[sb, so]
            kv_metrics[db, do] = kv_metrics[sb, so]
            kv_positions[db, do] = kv_positions[sb, so]
