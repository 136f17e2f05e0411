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
- The allocator is PARTITIONED by kv-head group (free_stack [G, cap]):
  partition g owns the contiguous block-id range [g*cap, (g+1)*cap) and
  serves heads h with h // (H/G) == g. With G = tensor_parallel_size this
  makes every head's blocks live in that head's pool shard, so compression
  and attention stay shard-local under TP (the distributed-eviction
  correctness requirement, SURVEY.md section 7). G=1 is the single-chip
  case.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

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
    # Partitioned free-block stacks: free_stack[g, :free_top[g]] are the
    # free block ids of partition g (see module docstring).
    free_stack: jax.Array    # [G, num_blocks // G] i32
    free_top: jax.Array      # [G] i32
    # Quantized-cache (int8) per-KV dequantization scales; None for
    # bf16/f32 caches. Doubles the block count the same HBM holds
    # (reference --kv-cache-dtype fp8, csrc/cache_kernels.cu convert_fp8;
    # here int8 with per-KV scales so compaction moves stay exact).
    k_scale: "jax.Array | None" = None  # [num_blocks, block_size] f32
    v_scale: "jax.Array | None" = None

    @property
    def block_size(self) -> int:
        return self.k_cache.shape[1]

    @property
    def num_blocks(self) -> int:
        return self.k_cache.shape[0]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_cache_state(
    num_blocks: int,
    block_size: int,
    head_size: int,
    num_layers: int,
    max_num_seqs: int,
    num_kv_heads: int,
    max_blocks_per_head: int,
    cache_dtype=jnp.bfloat16,
    num_block_partitions: int = 1,
) -> CacheState:
    G = num_block_partitions
    assert num_kv_heads % G == 0, (num_kv_heads, G)
    num_blocks -= num_blocks % G  # each partition gets an equal share
    cap = num_blocks // G
    import numpy as np
    stacks = np.zeros((G, cap), np.int32)
    tops = np.zeros((G,), np.int32)
    for g in range(G):
        lo = g * cap + (1 if g == 0 else 0)  # block 0 is the trash block
        ids = np.arange(lo, (g + 1) * cap, dtype=np.int32)[::-1]
        stacks[g, :len(ids)] = ids
        tops[g] = len(ids)
    free_stack = jnp.asarray(stacks)
    quantized = cache_dtype == jnp.int8
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
        free_top=jnp.asarray(tops),
        k_scale=(jnp.zeros((num_blocks, block_size), jnp.float32)
                 if quantized else None),
        v_scale=(jnp.zeros((num_blocks, block_size), jnp.float32)
                 if quantized else None),
    )


def _pop_one(stack: jax.Array, top: jax.Array, need_flat: jax.Array
             ) -> Tuple[jax.Array, jax.Array]:
    rank = jnp.cumsum(need_flat) - 1  # 0-based rank among poppers
    count = jnp.sum(need_flat, dtype=jnp.int32)
    idx = top - 1 - rank
    # underflow guard: the host watermark normally prevents popping an
    # empty partition, but if mirror drift ever lets it happen the extra
    # poppers must receive the TRASH block (id 0, sacrificial) rather
    # than stack[0] duplicates overwriting a live block, and free_top
    # must not go negative (a later _push_one with negative top would
    # compute wrapping scatter indices and corrupt the stack tail)
    ids = jnp.where(need_flat & (idx >= 0), stack[jnp.clip(idx, 0)], 0)
    return ids.astype(jnp.int32), jnp.maximum(top - count, 0)


def _push_one(stack: jax.Array, top: jax.Array, ids_flat: jax.Array,
              mask_flat: jax.Array) -> Tuple[jax.Array, jax.Array]:
    rank = jnp.cumsum(mask_flat) - 1
    count = jnp.sum(mask_flat, dtype=jnp.int32)
    n = stack.shape[0]
    idx = jnp.where(mask_flat, top + rank, n)  # out-of-range -> dropped
    stack = stack.at[idx].set(ids_flat.astype(jnp.int32), mode="drop")
    return stack, jnp.minimum(top + count, n)


def _group_flatten(arr: jax.Array, head_axis: int, G: int,
                   layer_axis: Optional[int] = None,
                   layer_groups: int = 1) -> jax.Array:
    """[..., H, ...] -> [G, rest] with the routing axes split into G groups
    leading; inverse is _group_unflatten.

    With layer_groups > 1 (pipeline parallelism), partitions are
    LAYER-GROUP-MAJOR: G = layer_groups * head_groups, and partition
    g = lg * head_groups + hg owns blocks of layers in group lg and heads
    in group hg — so each pipe stage owns one contiguous block-id range
    [lg * (num_blocks/layer_groups), ...) (parallel/pipeline.py relies on
    this for local-id translation inside the GPipe shard_map)."""
    if layer_groups > 1:
        assert layer_axis is not None
        Gh = G // layer_groups
        a = jnp.moveaxis(arr, (layer_axis, head_axis), (0, 1))  # [L, H, ...]
        L, H = a.shape[0], a.shape[1]
        rest = a.shape[2:]
        a = a.reshape((layer_groups, L // layer_groups, Gh, H // Gh)
                      + rest)
        a = jnp.moveaxis(a, 2, 1)  # [Lg, Gh, L/Lg, H/Gh, ...]
        return a.reshape(G, -1)
    H = arr.shape[head_axis]
    a = jnp.moveaxis(arr, head_axis, 0)           # [H, ...]
    return a.reshape(G, -1)                       # [G, (H/G) * rest]


def _group_unflatten(flat: jax.Array, shape, head_axis: int,
                     layer_axis: Optional[int] = None,
                     layer_groups: int = 1) -> jax.Array:
    if layer_groups > 1:
        assert layer_axis is not None
        G = flat.shape[0]
        Gh = G // layer_groups
        L, H = shape[layer_axis], shape[head_axis]
        rest = [shape[i] for i in range(len(shape))
                if i not in (layer_axis % len(shape),
                             head_axis % len(shape))]
        a = flat.reshape([layer_groups, Gh, L // layer_groups, H // Gh]
                         + rest)
        a = jnp.moveaxis(a, 1, 2).reshape([L, H] + rest)
        return jnp.moveaxis(a, (0, 1), (layer_axis, head_axis))
    H = shape[head_axis]
    rest = [shape[i] for i in range(len(shape)) if i != head_axis]
    a = flat.reshape([H] + rest)
    return jnp.moveaxis(a, 0, head_axis)


def stack_pop(
    free_stack: jax.Array, free_top: jax.Array, need_mask: jax.Array,
    head_axis: int = -2, layer_axis: Optional[int] = None,
    layer_groups: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Pop one block id for every True element of need_mask. The head axis
    (size H, H % G == 0) routes each pop to its partition's stack so blocks
    stay shard-local under TP; with layer_groups > 1 the layer axis
    additionally routes by pipeline stage (layer-group-major partitions).
    Returns (block_ids, new_free_top[G]); block_ids has need_mask's shape
    with the trash block (0) where False.
    """
    G = free_stack.shape[0]
    head_axis = head_axis % need_mask.ndim
    need_g = _group_flatten(need_mask, head_axis, G, layer_axis,
                            layer_groups)
    ids_g, top = jax.vmap(_pop_one)(free_stack, free_top, need_g)
    ids = _group_unflatten(ids_g, need_mask.shape, head_axis, layer_axis,
                           layer_groups)
    return ids, top


def stack_push(
    free_stack: jax.Array,
    free_top: jax.Array,
    block_ids: jax.Array,
    push_mask: jax.Array,
    head_axis: int = -2,
    layer_axis: Optional[int] = None,
    layer_groups: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Push block_ids[push_mask] onto their partitions' stacks."""
    G = free_stack.shape[0]
    head_axis = head_axis % push_mask.ndim
    ids_g = _group_flatten(block_ids, head_axis, G, layer_axis,
                           layer_groups)
    mask_g = _group_flatten(push_mask, head_axis, G, layer_axis,
                            layer_groups)
    stack, top = jax.vmap(_push_one)(free_stack, free_top, ids_g, mask_g)
    return stack, top


def effective_free_blocks(free_top: jax.Array) -> jax.Array:
    """Scalar free-block count for host scheduling: min partition fill
    times partition count.

    min*G - not sum(free_top) - is the correct admission/preemption
    scalar under SKEWED partitions (uneven per-head eviction): every
    allocation draws uniformly from ALL partitions (each appended token
    needs a block in every head's shard-local pool, and worst-case burst
    demand is cdiv(steps, block_size) crossings PER HEAD regardless of
    per-head fill offsets), so capacity is bound by the emptiest
    partition. sum() would admit work the starved partition cannot
    serve; its pops would then hand out the trash block (id 0,
    _pop_one underflow guard) and silently drop those heads' KVs - a
    correctness loss, vs min*G's bounded conservatism (at most the skew
    delta, transient because compression targets re-balance; plus a
    constant G-1 because the reserved trash block lives in partition
    0's range). tests/test_allocator_skew.py pins both directions.
    Reference analog: the single free-block counter of
    vllm/core/block_manager.py (no partitions to skew there)."""
    return jnp.min(free_top) * free_top.shape[0]
