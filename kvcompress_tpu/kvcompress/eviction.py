"""KV-Compress eviction pipeline as fixed-shape JAX programs.

TPU-native re-design of the reference's compression machinery:
- the v2 torch-sort scheduler (vllm/kvcompress/metrics.py:441-847),
- count_block_evictions (csrc/kvcompress_eviction_kernels.cu:190-221),
- schedule_t1_cache_moves (csrc/kvcompress_eviction_kernels.cu:223-289),
- execute_cache_moves (csrc/kvcompress_eviction_kernels.cu:358-435).

Instead of the reference's flat masked workspace over physical blocks (which
needs per-block seq/layer/head metadata and three full stable sorts), we use
a dense workspace [B, L, H, n] (n = nb * block_size logical slots per head)
gathered straight through the block tables:

1. per-head batched lexicographic sort of (metric, logical_idx),
2. per-block representative metrics via the hanging-token gather,
3. one per-sequence batched sort of block metrics for budget selection,
4. eviction masks via cumsum ranks (replaces the sequential CUDA walk),
5. two-pointer compaction as rank-matched hole/survivor pairing,
6. one flat-packed gather/scatter applying all K/V/metric/position moves.

Everything is static-shape and jit-compatible; numerical semantics match
kvcompress_tpu/ops/eviction_ref.py (the numpy oracle) exactly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from kvcompress_tpu.core.state import CacheState, stack_push


class EvictionSchedule(NamedTuple):
    evicted_mask: jax.Array         # [B, L, H, n] bool (logical index space)
    evicted_kv_count: jax.Array     # [B, L, H] i32
    evicted_block_count: jax.Array  # [B, L, H] i32


class CacheMoves(NamedTuple):
    dst: jax.Array    # [moves_cap] i32 physical slot
    src: jax.Array    # [moves_cap] i32 physical slot
    valid: jax.Array  # [moves_cap] bool


def hanging_token_count(context_lens: jax.Array, block_size: int) -> jax.Array:
    """KVs in the final allocated block (block_size when the last block is
    full; reference kvcompress/block.py:330-335)."""
    rem = context_lens % block_size
    return jnp.where((rem == 0) & (context_lens > 0), block_size, rem)


def apply_head_bias(
    metrics: jax.Array,    # [B, L, H, n] f32
    positions: jax.Array,  # [B, L, H, n] i32
    bias: jax.Array,       # [L, H, num_bins] f32
    position_bins: jax.Array,  # [num_bins] i32
    weight: float,
) -> jax.Array:
    """Add position-binned per-head bias to metrics
    (reference kvcompress/metrics.py:54-81 KVHeadBias.get_bias_for_position)."""
    B, L, H, n = metrics.shape
    bin_idx = jnp.sum(
        positions[..., None] >= position_bins[None, None, None, None, :],
        axis=-1,
    ) - 1
    b = bias[
        jnp.arange(L)[None, :, None, None],
        jnp.arange(H)[None, None, :, None],
        jnp.clip(bin_idx, 0),
    ]
    b = jnp.where(positions < 0, 0.0, b)
    return metrics + b * weight


def schedule_evictions(
    metrics: jax.Array,        # [B, L, H, n] f32 (bias already applied)
    positions: jax.Array,      # [B, L, H, n] i32 (-1 for empty slots)
    context_lens: jax.Array,   # [B, L, H] i32
    last_position: jax.Array,  # [B] i32
    protected_window: jax.Array,   # [B] i32
    evicted_blocks_per_seq: jax.Array,  # [B] i32
    block_size: int,
    num_sinks: int = 0,
    even_layer_evict: bool = False,
) -> EvictionSchedule:
    B, L, H, n = metrics.shape
    nb = n // block_size
    G = B * L * H
    logical = jnp.arange(n, dtype=jnp.int32)

    # --- evictability mask and sort keys ---
    valid = logical[None, None, None, :] < context_lens[..., None]
    max_in_range = (last_position - protected_window)[:, None, None, None]
    evictable = (
        valid
        & (positions <= max_in_range)
        & (positions >= num_sinks)
    )
    inf = jnp.float32(jnp.inf)
    key = jnp.where(evictable, metrics.astype(jnp.float32), inf)

    # --- 1. per-head lexicographic sort by (metric, logical index) ---
    key_g = key.reshape(G, n)
    logical_g = jnp.broadcast_to(logical[None, :], (G, n))
    sorted_key, sorted_logical = jax.lax.sort(
        (key_g, logical_g), dimension=-1, num_keys=2
    )

    # --- 2. per-block representative metric: the hanging-th KV of each
    # group of block_size sorted KVs (reference metrics.py:573-596) ---
    hanging = hanging_token_count(context_lens, block_size)  # [B, L, H]
    hang_g = hanging.reshape(G)
    blk_last = (
        jnp.arange(nb, dtype=jnp.int32)[None, :] * block_size
        + jnp.clip(hang_g[:, None] - 1, 0)
    )  # [G, nb]
    block_metric = jnp.take_along_axis(sorted_key, blk_last, axis=-1)  # [G, nb]

    # --- 3. per-sequence budget selection (reference metrics.py:667-729):
    # sort candidate blocks by (metric, flat index) and select the lowest
    # `evicted_blocks_per_seq` finite ones. With even_layer_evict
    # (reference kvcompress_eviction_kernels.cu:52-78 per-layer threads),
    # the budget is split evenly across layers and selection runs
    # layer-local. ---
    if even_layer_evict:
        M = H * nb
        bm = block_metric.reshape(B, L, M)
        flat_idx = jnp.broadcast_to(
            jnp.arange(M, dtype=jnp.int32)[None, None, :], (B, L, M))
        bm_sorted, bm_sorted_idx = jax.lax.sort(
            (bm, flat_idx), dimension=-1, num_keys=2)
        finite_count = jnp.sum(jnp.isfinite(bm), axis=-1).astype(jnp.int32)
        per_layer = (evicted_blocks_per_seq // L).astype(jnp.int32)
        n_select = jnp.minimum(per_layer[:, None], finite_count)
        sel_sorted = (jnp.arange(M, dtype=jnp.int32)[None, None, :]
                      < n_select[..., None])
        sel = jnp.zeros((B, L, M), dtype=bool).at[
            jnp.arange(B)[:, None, None], jnp.arange(L)[None, :, None],
            bm_sorted_idx
        ].set(sel_sorted, unique_indices=True)
        # Distribute ALL unselected budget - the floored-away remainder
        # (budget % L) AND any per-layer share a capacity-starved layer
        # could not absorb (finite_count < per_layer) - to the
        # globally-lowest leftover candidates, so budgets never silently
        # shrink (the reference per-layer walk,
        # csrc/kvcompress_eviction_kernels.cu:52-78, never drops budget;
        # ours must not either, else the engine schedules compression
        # rounds forever that each evict less than asked).
        rem = (evicted_blocks_per_seq.astype(jnp.int32)
               - jnp.sum(n_select, axis=-1))
        left_key = jnp.where(sel, inf, bm).reshape(B, L * M)
        left_idx = jnp.broadcast_to(
            jnp.arange(L * M, dtype=jnp.int32)[None, :], (B, L * M))
        _, li_sorted = jax.lax.sort((left_key, left_idx),
                                    dimension=-1, num_keys=2)
        n_extra = jnp.minimum(
            rem, jnp.sum(jnp.isfinite(left_key), axis=-1).astype(jnp.int32))
        extra_sorted = (jnp.arange(L * M, dtype=jnp.int32)[None, :]
                        < n_extra[:, None])
        extra = jnp.zeros((B, L * M), dtype=bool).at[
            jnp.arange(B)[:, None], li_sorted
        ].set(extra_sorted, unique_indices=True)
        sel = sel | extra.reshape(B, L, M)
        e = sel.reshape(B, L, H, nb).sum(-1).astype(jnp.int32)
    else:
        M = L * H * nb
        bm = block_metric.reshape(B, M)
        flat_idx = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
        bm_sorted, bm_sorted_idx = jax.lax.sort((bm, flat_idx), dimension=-1,
                                                num_keys=2)
        finite_count = jnp.sum(jnp.isfinite(bm), axis=-1).astype(jnp.int32)
        n_select = jnp.minimum(evicted_blocks_per_seq.astype(jnp.int32),
                               finite_count)
        sel_sorted = jnp.arange(M, dtype=jnp.int32)[None, :] < n_select[:, None]
        sel = jnp.zeros((B, M), dtype=bool).at[
            jnp.arange(B)[:, None], bm_sorted_idx
        ].set(sel_sorted, unique_indices=True)
        # Selected blocks within a head always form a prefix of that head's
        # blocks (block metrics ascend within a head), so a per-head count
        # fully determines the evicted set.
        e = sel.reshape(B, L, H, nb).sum(-1).astype(jnp.int32)  # per head

    # --- 4. evicted KV counts and masks: freeing k blocks evicts the
    # (k-1)*block_size + hanging lowest-metric KVs
    # (reference metrics.py:788-792, _custom_ops.py:1045-1052).
    # The logical-order mask needs each slot's rank in the sorted order -
    # computed by a second SORT (inverse permutation), not a scatter:
    # 8M-element scalar scatters are ~5x slower than sorts on TPU ---
    c = jnp.where(e > 0, (e - 1) * block_size + hanging, 0)  # [B, L, H]
    c_g = c.reshape(G)
    rank_iota = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :], (G, n))
    _, rank_of_logical = jax.lax.sort(
        (sorted_logical, rank_iota), dimension=-1, num_keys=1)
    evicted = rank_of_logical < c_g[:, None]

    return EvictionSchedule(
        evicted_mask=evicted.reshape(B, L, H, n),
        evicted_kv_count=c,
        evicted_block_count=e,
    )


def plan_cache_moves(
    evicted_mask: jax.Array,      # [B, L, H, n] bool
    evicted_kv_count: jax.Array,  # [B, L, H] i32
    context_lens: jax.Array,      # [B, L, H] i32
    block_tables_w: jax.Array,    # [B, L, H, nb] i32 (workspace slice)
    block_size: int,
    moves_cap: int,
) -> CacheMoves:
    """Compaction plan: pair the i-th lowest eviction hole below the new
    context length with the i-th highest surviving KV from the tail
    (semantics of csrc/kvcompress_eviction_kernels.cu:223-289), flat-packed
    into a [moves_cap] workspace."""
    B, L, H, n = evicted_mask.shape
    G = B * L * H
    ev = evicted_mask.reshape(G, n)
    ctx = context_lens.reshape(G)
    c = evicted_kv_count.reshape(G)
    new_ctx = ctx - c
    idx = jnp.arange(n, dtype=jnp.int32)[None, :]

    holes = ev & (idx < new_ctx[:, None])
    survivors = (~ev) & (idx >= new_ctx[:, None]) & (idx < ctx[:, None])
    hole_rank = jnp.cumsum(holes, axis=-1, dtype=jnp.int32) - 1
    # survivor rank counted from the tail (0 = highest logical index)
    surv_rank = jnp.cumsum(survivors[:, ::-1], axis=-1,
                           dtype=jnp.int32)[:, ::-1] - 1
    n_moves = jnp.sum(holes, axis=-1, dtype=jnp.int32)  # [G]

    # rank -> logical maps via SORT (value permuted by masked-rank key)
    # instead of 2D scalar scatters: sorts are ~5x faster at this size
    idx_b = jnp.broadcast_to(idx, (G, n))
    _, dst_by_rank = jax.lax.sort(
        (jnp.where(holes, hole_rank, n), idx_b), dimension=-1, num_keys=1)
    _, src_by_rank = jax.lax.sort(
        (jnp.where(survivors, surv_rank, n), idx_b), dimension=-1,
        num_keys=1)

    # logical -> physical slot via block tables
    bt = block_tables_w.reshape(G, -1)

    def phys(logical_by_rank):
        li = jnp.clip(logical_by_rank, 0)
        blk = jnp.take_along_axis(bt, li // block_size, axis=-1)
        return blk * block_size + li % block_size

    dst_phys = phys(dst_by_rank)
    src_phys = phys(src_by_rank)

    # flat-pack per-head move lists at cumulative offsets: one global sort
    # by (validity, group, rank) packs all valid moves into the prefix
    rank = jnp.arange(n, dtype=jnp.int32)[None, :]
    move_valid = rank < n_moves[:, None]
    rows = jnp.arange(G, dtype=jnp.int32)[:, None]
    okey = jnp.where(move_valid, rows * n + rank, G * n).reshape(-1)
    _, dst_p, src_p = jax.lax.sort(
        (okey, dst_phys.reshape(-1), src_phys.reshape(-1)), dimension=-1,
        num_keys=1)
    if G * n < moves_cap:
        pad = moves_cap - G * n
        dst_p = jnp.pad(dst_p, (0, pad))
        src_p = jnp.pad(src_p, (0, pad))
    dst = dst_p[:moves_cap]
    src = src_p[:moves_cap]
    total = jnp.sum(n_moves)
    valid = jnp.arange(moves_cap, dtype=jnp.int32) < total
    return CacheMoves(dst=dst, src=src, valid=valid)


def execute_cache_moves(
    k_cache: jax.Array,
    v_cache: jax.Array,
    kv_metrics: jax.Array,
    kv_positions: jax.Array,
    moves: CacheMoves,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Apply the compaction plan, carrying K, V, metric and position
    (reference csrc/kvcompress_eviction_kernels.cu:358-435). Invalid move
    slots write to the trash block (block 0). Gather-then-scatter is
    race-free by construction: per-head dst/src sets are disjoint."""
    num_blocks, block_size = kv_metrics.shape
    src = jnp.where(moves.valid, moves.src, 0)
    dst = jnp.where(moves.valid, moves.dst, 0)

    def move(arr):
        flat = arr.reshape(num_blocks * block_size, *arr.shape[2:])
        vals = flat[src]
        return flat.at[dst].set(vals).reshape(arr.shape)

    return move(k_cache), move(v_cache), move(kv_metrics), move(kv_positions)


def gather_workspace(
    state: CacheState,
    slots: jax.Array,  # [B] i32 batch slots (may repeat padding; pair with
                       # evict_blocks == 0 for padded entries)
    nb: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Gather (block_tables_w, context_lens_w, metrics_w, positions_w) for
    the compression batch. Returns dense [B, L, H, ...] arrays."""
    block_size = state.block_size
    safe = jnp.clip(slots, 0)
    bt = state.block_tables[:, safe, :, :nb]          # [L, B, H, nb]
    bt_w = jnp.transpose(bt, (1, 0, 2, 3))            # [B, L, H, nb]
    ctx_w = jnp.transpose(state.context_lens[:, safe, :], (1, 0, 2))
    # gather whole block ROWS (sublane-contiguous) instead of per-slot
    # flat indices: ~10x faster on TPU for the same bytes
    B, L, H, _ = bt_w.shape
    n = nb * block_size
    metrics_w = state.kv_metrics[bt_w].reshape(B, L, H, n)
    positions_w = state.kv_positions[bt_w].reshape(B, L, H, n)
    return bt_w, ctx_w, metrics_w, positions_w


def run_compression(
    state: CacheState,
    slots: jax.Array,          # [B] i32 (-1 padding)
    last_position: jax.Array,  # [B] i32
    protected_window: jax.Array,   # [B] i32
    evicted_blocks_per_seq: jax.Array,  # [B] i32 (0 for padded slots)
    *,
    nb: int,
    moves_cap: int,
    num_sinks: int = 0,
    use_average: bool = False,
    bias: Optional[jax.Array] = None,           # [L, H, bins]
    position_bins: Optional[jax.Array] = None,  # [bins]
    bias_weight: float = 1.0,
    even_layer_evict: bool = False,
    random_eviction: bool = False,
    layer_groups: int = 1,   # pipeline stages: freed blocks route back to
                             # their (stage, head-group) allocator partition
) -> Tuple[CacheState, jax.Array, jax.Array]:
    """One full compression round on device: gather -> bias -> schedule ->
    compact -> free blocks. Returns (new_state, evicted_block_count [B,L,H],
    new_context_lens_w [B,L,H]).

    Mirrors the engine-side flow at reference vllm/kvcompress/scheduler.py:
    184-560 (_schedule_compression) fused into a single device program.
    """
    block_size = state.block_size
    bt_w, ctx_w, metrics_w, positions_w = gather_workspace(state, slots, nb)

    if random_eviction:
        # random-eviction baseline (reference metrics.py:232-234, 391-393):
        # replace metrics with a stateless hash of (layer, head, position)
        # so eviction order is uniform-pseudorandom, not oldest-first
        B, L, H, n = metrics_w.shape
        salt = (jnp.arange(L, dtype=jnp.uint32)[None, :, None, None]
                * jnp.uint32(131071)
                + jnp.arange(H, dtype=jnp.uint32)[None, None, :, None]
                * jnp.uint32(8191))
        h = (positions_w.astype(jnp.uint32) ^ salt) * jnp.uint32(2654435761)
        h = (h >> 13) ^ h
        metrics_w = (h & jnp.uint32(0xFFFF)).astype(jnp.float32)
    if use_average:
        # Normalise by the number of queries that attended to each KV.
        # `last - position` (NOT +1) is deliberate bit-parity with the
        # reference (metrics.py:499 `current_positions -
        # masked_token_position`), even though the KV's own query also
        # attends to it.
        qcount = jnp.maximum(
            last_position[:, None, None, None] - positions_w, 1
        ).astype(jnp.float32)
        metrics_w = metrics_w / qcount
    if bias is not None:
        metrics_w = apply_head_bias(
            metrics_w, positions_w, bias, position_bins, bias_weight
        )

    sched = schedule_evictions(
        metrics_w, positions_w, ctx_w, last_position, protected_window,
        evicted_blocks_per_seq, block_size, num_sinks,
        even_layer_evict=even_layer_evict,
    )
    moves = plan_cache_moves(
        sched.evicted_mask, sched.evicted_kv_count, ctx_w, bt_w,
        block_size, moves_cap,
    )
    k_cache, v_cache, kv_metrics, kv_positions = execute_cache_moves(
        state.k_cache, state.v_cache, state.kv_metrics, state.kv_positions,
        moves,
    )
    k_scale, v_scale = state.k_scale, state.v_scale
    if k_scale is not None:
        # int8 cache: per-KV scales ride along with the moved values
        # (reference execute_cache_moves carries kv_metrics + positions the
        # same way, csrc/kvcompress_eviction_kernels.cu:358-435)
        src = jnp.where(moves.valid, moves.src, 0)
        dst = jnp.where(moves.valid, moves.dst, 0)
        ksf = k_scale.reshape(-1)
        vsf = v_scale.reshape(-1)
        k_scale = ksf.at[dst].set(ksf[src]).reshape(k_scale.shape)
        v_scale = vsf.at[dst].set(vsf[src]).reshape(v_scale.shape)

    # --- free trailing blocks and shrink context lens (reference
    # kvcompress/block_manager.py:466-530 free_compressed_blocks +
    # block.py:184-231 remove_trailing_blocks) ---
    nb_alloc = (ctx_w + block_size - 1) // block_size  # [B, L, H]
    blk_idx = jnp.arange(nb, dtype=jnp.int32)[None, None, None, :]
    freed_mask = (
        (blk_idx >= (nb_alloc - sched.evicted_block_count)[..., None])
        & (blk_idx < nb_alloc[..., None])
    )
    free_stack, free_top = stack_push(
        state.free_stack, state.free_top, bt_w, freed_mask, head_axis=2,
        layer_axis=1, layer_groups=layer_groups,
    )

    new_ctx_w = ctx_w - sched.evicted_kv_count
    # scatter back into [L, S, H]; padded slots (-1) dropped
    pad = slots < 0
    scatter_slot = jnp.where(pad, state.context_lens.shape[1], slots)
    context_lens = state.context_lens.at[:, scatter_slot, :].set(
        jnp.transpose(new_ctx_w, (1, 0, 2)), mode="drop"
    )

    new_state = CacheState(
        k_cache=k_cache,
        v_cache=v_cache,
        kv_metrics=kv_metrics,
        kv_positions=kv_positions,
        block_tables=state.block_tables,
        context_lens=context_lens,
        free_stack=free_stack,
        free_top=free_top,
        k_scale=k_scale,
        v_scale=v_scale,
    )
    return new_state, sched.evicted_block_count, new_ctx_w
