"""shard_map wrappers running the production Pallas kernels per TP shard.

GSPMD partitions XLA ops automatically, but a pallas_call must be run
per-shard with manual partitioning (shard_map). Thanks to the partitioned
block allocator (core/state.py), every kv head's blocks live in that head's
pool shard, so the kernel runs entirely shard-locally: the only adjustment
is rebasing global block ids to the local pool partition
(id - shard_index * cap).

This is the KVC-specific distributed design the reference lists as an open
question ("How to support multi-GPU?", vllm/kvcompress/README.md): head-
sharded attention + shard-local compression, no cross-shard traffic on the
decode path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from kvcompress_tpu.parallel.mesh import MODEL_AXIS


def paged_decode_attention_tail_sharded(
    mesh: Mesh,
    query: jax.Array,        # [S, H_q, d]
    tail_k: jax.Array,       # [S, H_kv, KT, d]
    tail_v: jax.Array,
    tail_len: jax.Array,     # [S]
    k_cache: jax.Array,      # [num_blocks, bs, d] (pool sharded on axis 0)
    v_cache: jax.Array,
    block_tables_l: jax.Array,   # [S, H_kv, nb] GLOBAL block ids
    context_lens_l: jax.Array,   # [S, H_kv]
    scale: float,
    *,
    use_l2: bool = True,
    record_metrics: bool = True,
    interpret: bool = False,
    logit_cap: Optional[float] = None,
    k_scale=None,   # int8 cache: [num_blocks, bs] f32 (pool-sharded)
    v_scale=None,
):
    """Per-shard tail decode attention. Outputs match the unsharded kernel;
    m_cached comes back in logical per-head space (sharded on the head
    axis), exactly like the single-chip path."""
    from kvcompress_tpu.ops.pallas import paged_attention as ppa

    tp = mesh.shape[MODEL_AXIS]
    num_blocks = k_cache.shape[0]
    cap = num_blocks // tp
    m = MODEL_AXIS
    quantized = k_scale is not None

    def local(q, tk, tv, tlen, kc, vc, bt, ctx, *scales):
        g = jax.lax.axis_index(m)
        bt_local = jnp.maximum(bt - g * cap, 0)  # rebase to the local pool
        ks, vs = scales if quantized else (None, None)
        return ppa.paged_decode_attention_tail(
            q, tk, tv, tlen, kc, vc, bt_local, ctx, scale,
            use_l2=use_l2, record_metrics=record_metrics,
            interpret=interpret, logit_cap=logit_cap,
            k_scale=ks, v_scale=vs)

    in_specs = (P(None, m, None), P(None, m, None, None),
                P(None, m, None, None), P(None),
                P(m, None, None), P(m, None, None),
                P(None, m, None), P(None, m))
    args = (query, tail_k, tail_v, tail_len, k_cache, v_cache,
            block_tables_l, context_lens_l)
    if quantized:
        in_specs = in_specs + (P(m, None), P(m, None))
        args = args + (k_scale, v_scale)
    kw = dict(
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(None, m, None), P(None, m, None), P(None, m, None)),
    )
    try:  # pallas_call out_shapes carry no vma/replication info
        fn = shard_map(local, check_vma=False, **kw)
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(local, check_rep=False, **kw)
    return fn(*args)


def prefill_attention_sharded(
    mesh: Mesh,
    query: jax.Array,    # [T, H_q, d]
    key: jax.Array,      # [T, H_kv, d]
    value: jax.Array,    # [T, H_kv, d]
    seq_len: jax.Array,  # [] i32
    buffer_len: jax.Array,  # [] i32
    scale: float,
    *,
    metric_window: int = 32,
    use_l2: bool = True,
    use_average: bool = False,
    use_maxpool: bool = True,
    record_metrics: bool = True,
    interpret: bool = False,
    logit_cap: Optional[float] = None,
):
    """Per-shard Pallas prefill flash attention: query/key/value heads shard
    on the model axis (GQA groups stay whole because tp divides H_kv), the
    kernel runs fully shard-locally, outputs come back head-sharded. The
    per-KV metric emission is per kv head, so no cross-shard reduction is
    needed (the KVC head-parallel property, SURVEY.md section 5.7)."""
    from kvcompress_tpu.ops.pallas import prefill_attention as ppf

    m = MODEL_AXIS

    def local(q, k, v, sl, bl):
        return ppf.prefill_attention(
            q, k, v, sl, scale, metric_window=metric_window,
            buffer_len=bl, use_l2=use_l2, use_average=use_average,
            use_maxpool=use_maxpool, record_metrics=record_metrics,
            interpret=interpret, logit_cap=logit_cap)

    kw = dict(
        mesh=mesh,
        in_specs=(P(None, m, None), P(None, m, None), P(None, m, None),
                  P(), P()),
        out_specs=(P(None, m, None), P(None, m)),
    )
    try:
        fn = shard_map(local, check_vma=False, **kw)
    except TypeError:
        fn = shard_map(local, check_rep=False, **kw)
    return fn(query, key, value, seq_len, buffer_len)
