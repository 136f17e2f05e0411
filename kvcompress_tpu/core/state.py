"""Device-resident cache state.

The TPU-native replacement for the reference's shared GPU tensors
(vllm/kvcompress/block.py:94-126 BlockState and vllm/kvcompress/metrics.py
CompressionMetrics): one functional pytree holding the unified per-(layer,
kv-head) paged cache, per-head block tables / context lengths, per-KV metrics
and positions, and a device-side free-block stack. Every engine program
(prefill / decode / compress) is a jitted function from CacheState to
CacheState with donated buffers - there is no host-side mutation of any of
these arrays.

Key differences from the reference, by design:
- No per-physical-block metadata arrays (seq/layer/head/logical-block index,
  reference metrics.py:220-275). The eviction pipeline gathers its workspace
  densely via block tables, so block identity is positional.
- The block allocator is a device-side stack (pop/push via cumsum ranks)
  instead of the GPU free-mask allocator
  (reference kvcompress/block_manager.py:75-140).
- Block 0 is reserved as a trash block: padded scatters/gathers target it.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CacheState:
    # Unified paged KV cache; each block holds block_size KVs of one
    # (layer, kv_head) pair of one sequence.
    k_cache: jax.Array       # [num_blocks, block_size, head_size] cache dtype
    v_cache: jax.Array       # [num_blocks, block_size, head_size]
    # Per-KV eviction metric (running squared-attention sum) and the token
    # position of the KV in its sequence (-1 for never-written slots).
    kv_metrics: jax.Array    # [num_blocks, block_size] f32
    kv_positions: jax.Array  # [num_blocks, block_size] i32
    # Per-(layer, batch-slot, kv-head) block tables and context lengths.
    block_tables: jax.Array  # [L, S, H, max_blocks_per_head] i32
    context_lens: jax.Array  # [L, S, H] i32
    # Free-block stack: free_stack[:free_top] are free block ids.
    free_stack: jax.Array    # [num_blocks] i32
    free_top: jax.Array      # [] i32

    @property
    def block_size(self) -> int:
        return self.k_cache.shape[1]

    @property
    def num_blocks(self) -> int:
        return self.k_cache.shape[0]


def init_cache_state(
    num_blocks: int,
    block_size: int,
    head_size: int,
    num_layers: int,
    max_num_seqs: int,
    num_kv_heads: int,
    max_blocks_per_head: int,
    cache_dtype=jnp.bfloat16,
) -> CacheState:
    # Block 0 is the trash block and is never handed out.
    free_stack = jnp.concatenate([
        jnp.arange(1, num_blocks, dtype=jnp.int32)[::-1],
        jnp.zeros((1,), dtype=jnp.int32),
    ])
    return CacheState(
        k_cache=jnp.zeros((num_blocks, block_size, head_size), dtype=cache_dtype),
        v_cache=jnp.zeros((num_blocks, block_size, head_size), dtype=cache_dtype),
        kv_metrics=jnp.zeros((num_blocks, block_size), dtype=jnp.float32),
        kv_positions=jnp.full((num_blocks, block_size), -1, dtype=jnp.int32),
        block_tables=jnp.zeros(
            (num_layers, max_num_seqs, num_kv_heads, max_blocks_per_head),
            dtype=jnp.int32,
        ),
        context_lens=jnp.zeros(
            (num_layers, max_num_seqs, num_kv_heads), dtype=jnp.int32
        ),
        free_stack=free_stack,
        free_top=jnp.asarray(num_blocks - 1, dtype=jnp.int32),
    )


def stack_pop(
    free_stack: jax.Array, free_top: jax.Array, need_mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Pop one block id for every True element of need_mask (any shape).

    Returns (block_ids, new_free_top); block_ids has need_mask's shape with
    the trash block (0) in positions where need_mask is False.
    """
    flat = need_mask.reshape(-1)
    rank = jnp.cumsum(flat) - 1  # 0-based rank among poppers
    count = rank[-1] + 1 if flat.size else jnp.int32(0)
    count = jnp.sum(flat, dtype=jnp.int32)
    idx = free_top - 1 - rank
    ids = jnp.where(flat, free_stack[jnp.clip(idx, 0)], 0)
    return ids.reshape(need_mask.shape).astype(jnp.int32), free_top - count


def stack_push(
    free_stack: jax.Array,
    free_top: jax.Array,
    block_ids: jax.Array,
    push_mask: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Push block_ids[push_mask] onto the stack. Shapes must match."""
    flat_ids = block_ids.reshape(-1).astype(jnp.int32)
    flat = push_mask.reshape(-1)
    rank = jnp.cumsum(flat) - 1
    count = jnp.sum(flat, dtype=jnp.int32)
    n = free_stack.shape[0]
    idx = jnp.where(flat, free_top + rank, n)  # out-of-range -> dropped
    free_stack = free_stack.at[idx].set(flat_ids, mode="drop")
    return free_stack, free_top + count
