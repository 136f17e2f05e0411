"""Attention + cache ops with KV-metric emission (pure-JAX reference path).

These are the XLA reference implementations of the three hot kernels; the
Pallas production kernels in kvcompress_tpu/ops/pallas/ are validated against
them (the same oracle pattern as the reference's ref_* functions):

- write_to_cache: per-(token, kv-head) paged cache write, replacing
  csrc/kvcompress_cache_kernels.cu:28-89 (reshape_and_cache_kvc). New KV
  metric slots are initialised to zero (bias is applied at compression time).
- prefill_attention: causal attention over one prompt plus aggregation of
  squared attention received by each KV from the last
  `metric_window` queries, replacing flash_attn_kvc / _naive_kvc_attention
  (reference vllm/attention/backends/flash_attn.py:1122-1211).
- paged_decode_attention: decode attention over per-(seq, kv-head) block
  tables emitting per-KV squared-attention metric contributions, replacing
  csrc/attention/kvcompress_attention_kernels.cu (v1/v2) plus
  CompressionMetrics.aggregate_decode (reference metrics.py:429-439) fused
  into one op.

GQA convention: query head q belongs to kv head q // queries_per_kv.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def write_to_cache(
    k_cache: jax.Array,      # [num_blocks, block_size, head_size]
    v_cache: jax.Array,
    kv_metrics: jax.Array,   # [num_blocks, block_size] f32
    kv_positions: jax.Array,  # [num_blocks, block_size] i32
    key: jax.Array,          # [T, H_kv, head_size]
    value: jax.Array,        # [T, H_kv, head_size]
    slot_mapping: jax.Array,  # [T, H_kv] i32 physical slots (<0 -> drop)
    positions: jax.Array,    # [T] i32 token positions (-1 for padding)
    k_scale: Optional[jax.Array] = None,  # int8 cache: [blocks, bs] f32
    v_scale: Optional[jax.Array] = None,
):
    num_blocks, block_size, head_size = k_cache.shape
    T, H = slot_mapping.shape
    valid = (slot_mapping >= 0).reshape(-1)
    # invalid writes get a POSITIVE out-of-range sentinel and drop (the
    # global trash block 0 is NOT safe here: under pipeline parallelism
    # this runs on a stage-LOCAL pool shard where local slot 0 is a live
    # block — tests/test_pp_engine.py caught exactly that corruption)
    n_slots = num_blocks * block_size
    flat_slots = jnp.where(valid, slot_mapping.reshape(-1), n_slots)

    if k_scale is not None:
        from kvcompress_tpu.ops.kv_quant import quantize_kv
        kq, ks = quantize_kv(key)
        vq, vs = quantize_kv(value)
        key, value = kq, vq
        k_scale = k_scale.reshape(-1).at[flat_slots].set(
            ks.reshape(-1), mode="drop").reshape(k_scale.shape)
        v_scale = v_scale.reshape(-1).at[flat_slots].set(
            vs.reshape(-1), mode="drop").reshape(v_scale.shape)

    kf = k_cache.reshape(-1, head_size).at[flat_slots].set(
        key.reshape(-1, head_size).astype(k_cache.dtype), mode="drop")
    vf = v_cache.reshape(-1, head_size).at[flat_slots].set(
        value.reshape(-1, head_size).astype(v_cache.dtype), mode="drop")
    mf = kv_metrics.reshape(-1).at[flat_slots].set(
        jnp.zeros((T * H,), jnp.float32), mode="drop")
    pos = jnp.broadcast_to(positions[:, None], (T, H)).reshape(-1)
    pf = kv_positions.reshape(-1).at[flat_slots].set(
        jnp.where(valid, pos, -1), mode="drop")
    out = (
        kf.reshape(k_cache.shape), vf.reshape(v_cache.shape),
        mf.reshape(kv_metrics.shape), pf.reshape(kv_positions.shape),
    )
    if k_scale is not None:
        return out + (k_scale, v_scale)
    return out


def _maxpool1d_k7(x: jax.Array) -> jax.Array:
    """Max-pool with kernel 7, stride 1, same padding over the last axis
    (reference flash_attn.py:1204-1210)."""
    pads = [(0, 0)] * (x.ndim - 1) + [(3, 3)]
    xp = jnp.pad(x, pads, constant_values=-jnp.inf)
    out = x
    for s in range(7):
        out = jnp.maximum(out, jax.lax.slice_in_dim(
            xp, s, s + x.shape[-1], axis=-1))
    return out


def prefill_attention(
    query: jax.Array,   # [Tq, H_q, d] (padded; positions >= seq_len masked)
    key: jax.Array,     # [Tk, H_kv, d] (Tk >= Tq: cached prefix + chunk)
    value: jax.Array,   # [Tk, H_kv, d]
    seq_len: jax.Array,  # [] i32 actual length OF THE QUERY CHUNK
    scale: float,
    *,
    metric_window: int = 32,
    metric_block: int = 1024,
    buffer_len: jax.Array | int = 0,
    use_l2: bool = True,
    use_average: bool = False,
    use_maxpool: bool = True,
    q_chunk: int = 256,
    logit_cap: Optional[float] = None,
    alibi: Optional[jax.Array] = None,   # [H_q] slopes (bloom/mpt)
    window: Optional[jax.Array] = None,  # [] i32 sliding window (<0 = off)
    q_offset: jax.Array | int = 0,       # [] i32 tokens already cached
    prefix_lm: bool = False,             # bidirectional prompt (paligemma)
) -> Tuple[jax.Array, jax.Array]:
    """Causal self-attention for one prompt + per-KV prefill metrics.

    Returns (output [Tq, H_q, d], kv_metrics [Tk, H_kv] f32). Metrics
    aggregate the (squared) attention each KV receives from the last
    `metric_window` queries, with keys within `buffer_len` of the query
    excluded (reference flash_attn.py:1122-1211 _naive_kvc_attention).

    Chunked-prefill continuation (q_offset > 0): the query rows are tokens
    [q_offset, q_offset + seq_len) of the prompt and key/value carry the
    full prefix (gathered from the cache) followed by the chunk's fresh
    KVs; metrics cover ALL Tk columns. The metric window must fit inside
    the chunk (callers split prompts so the final chunk is >= the window;
    window queries from earlier chunks are not revisited).
    """
    Tq, Hq, d = query.shape
    Tk, Hkv, _ = key.shape
    qpk = Hq // Hkv
    dtype = query.dtype
    q_offset = jnp.asarray(q_offset, jnp.int32)
    total_len = q_offset + seq_len

    kt = key.astype(jnp.float32)
    qf = query.astype(jnp.float32)

    # --- output: chunked causal attention (flash-style over query chunks) ---
    n_chunks = -(-Tq // q_chunk)
    qpad = n_chunks * q_chunk

    def attend_chunk(carry, qc_and_idx):
        qc, c0 = qc_and_idx
        # qc: [q_chunk, Hq, d]; keys: full [Tk]
        logits = jnp.einsum("qhd,khd->hqk", qc,
                            jnp.repeat(kt, qpk, axis=1)) * scale
        qpos = q_offset + c0 + jnp.arange(q_chunk)[None, :, None]
        kpos = jnp.arange(Tk)[None, None, :]
        if alibi is not None:
            logits = logits + alibi[:, None, None] * (
                kpos - qpos).astype(jnp.float32)
        if logit_cap:
            logits = logit_cap * jnp.tanh(logits / logit_cap)
        if prefix_lm:
            # prefix-LM (paligemma): every prompt query sees every prompt
            # key (HF modeling_paligemma inference mask: the [:seq_len]
            # square is fully unmasked); padding rows keep a nonempty mask
            mask = jnp.broadcast_to(kpos < total_len, (Hq, q_chunk, Tk))
        else:
            mask = (kpos <= qpos) & (kpos < total_len)
        if window is not None:
            mask = mask & ((window < 0) | (kpos > qpos - window))
        logits = jnp.where(mask, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hqk,khd->qhd", probs,
                         jnp.repeat(value.astype(jnp.float32), qpk, axis=1))
        return carry, out

    qf_pad = jnp.pad(qf, ((0, qpad - Tq), (0, 0), (0, 0)))
    q_chunks = qf_pad.reshape(n_chunks, q_chunk, Hq, d)
    starts = jnp.arange(n_chunks) * q_chunk
    _, outs = jax.lax.scan(attend_chunk, None, (q_chunks, starts))
    output = outs.reshape(qpad, Hq, d)[:Tq].astype(dtype)

    # --- metrics: last `metric_window` queries, processed in blocks ---
    w = min(metric_window, Tq)
    n_mblocks = -(-w // metric_block)
    mb = min(metric_block, w)
    buffer_len = jnp.asarray(buffer_len, jnp.int32)

    def metric_chunk(acc, i):
        # query block i covers CHUNK positions [start, start+mb); the
        # window's global start clamps to the chunk start (queries from
        # earlier chunks are not revisited - see docstring)
        start = jnp.maximum(seq_len - w, 0) + i * mb
        qb = jax.lax.dynamic_slice_in_dim(
            jnp.pad(qf, ((0, mb), (0, 0), (0, 0))), start, mb, axis=0)
        logits = jnp.einsum("qhd,khd->hqk", qb,
                            jnp.repeat(kt, qpk, axis=1)) * scale
        qpos = q_offset + start + jnp.arange(mb)[None, :, None]
        kpos = jnp.arange(Tk)[None, None, :]
        if alibi is not None:
            logits = logits + alibi[:, None, None] * (
                kpos - qpos).astype(jnp.float32)
        if logit_cap:
            logits = logit_cap * jnp.tanh(logits / logit_cap)
        if prefix_lm:
            causal = jnp.broadcast_to(
                (kpos < total_len) & (qpos < total_len), (Hq, mb, Tk))
        else:
            causal = (kpos <= qpos) & (kpos < total_len) & (qpos < total_len)
        if window is not None:
            causal = causal & ((window < 0) | (kpos > qpos - window))
        logits = jnp.where(causal, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = jnp.where(causal, probs, 0.0)
        if use_l2:
            probs = probs ** 2
        # exclude keys inside the metric buffer window of each query
        rec = kpos <= qpos - buffer_len
        m = jnp.sum(jnp.where(rec, probs, 0.0), axis=-2)  # [Hq, Tk]
        return acc + m, None

    acc0 = jnp.zeros((Hq, Tk), jnp.float32)
    acc, _ = jax.lax.scan(metric_chunk, acc0, jnp.arange(n_mblocks))
    # avg rescale and maxpool apply ONCE to the fully accumulated rows
    # (the pallas epilogue's ordering, prefill_attention.py:295-308):
    # per-chunk maxpool would compute sum_chunks(maxpool(chunk)) !=
    # maxpool(sum), diverging whenever metric_window > metric_block
    if use_average:
        # rescale so later normalisation by query count is correct
        # (reference flash_attn.py:1196-1203); the window is the DYNAMIC
        # min(metric_window, total_len), matching the pallas kernel
        wq = jnp.minimum(jnp.asarray(metric_window, jnp.float32),
                         total_len.astype(jnp.float32))
        acc = acc * ((jnp.arange(Tk, dtype=jnp.float32)[None, :] + 1.0)
                     / wq)
    if use_maxpool:
        acc = _maxpool1d_k7(acc)
    # fold query heads into their kv head (reference metrics.py:413-427)
    kv_metrics = acc.reshape(Hkv, qpk, Tk).sum(axis=1).T  # [Tk, H_kv]
    kv_metrics = jnp.where(
        jnp.arange(Tk)[:, None] < total_len, kv_metrics, 0.0)
    return output, kv_metrics


def aggregate_prefill(
    kv_metrics: jax.Array,       # [num_blocks, block_size] f32
    prefill_metrics: jax.Array,  # [T, H_kv] f32
    slot_mapping: jax.Array,     # [T, H_kv] i32 (<0 -> drop)
) -> jax.Array:
    """Scatter-add prefill metric sums into the running metric tensor
    (reference metrics.py:396-427)."""
    flat_slots = slot_mapping.reshape(-1)
    vals = jnp.where(flat_slots >= 0, prefill_metrics.reshape(-1), 0.0)
    return kv_metrics.reshape(-1).at[jnp.clip(flat_slots, 0)].add(
        vals).reshape(kv_metrics.shape)


def paged_decode_attention(
    query: jax.Array,        # [S, H_q, d]
    k_cache: jax.Array,      # [num_blocks, block_size, d]
    v_cache: jax.Array,
    kv_metrics: jax.Array,   # [num_blocks, block_size] f32 (running)
    kv_positions: jax.Array,  # [num_blocks, block_size] i32
    block_tables_l: jax.Array,   # [S, H_kv, nb] i32 (this layer)
    context_lens_l: jax.Array,   # [S, H_kv] i32
    last_positions: jax.Array,   # [S] i32 position of the query token
    buffer_len: jax.Array,       # [S] i32 metric collection buffer
    scale: float,
    *,
    active: Optional[jax.Array] = None,  # [S] bool
    use_l2: bool = True,
    record_metrics: bool = True,
    logit_cap: Optional[float] = None,
    alibi: Optional[jax.Array] = None,   # [H_q] slopes (bloom/mpt)
    window: Optional[jax.Array] = None,  # [] i32 sliding window (<0 = off)
    k_scale: Optional[jax.Array] = None,  # int8 cache: [blocks, bs] f32
    v_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One decode step of paged attention over per-head block tables, fused
    with metric recording: each attended KV accumulates
    sum_over_query_heads(attn_prob^2) unless its position is within the
    sequence's metric buffer window
    (reference csrc/attention/kvcompress_attention_kernels.cu:297-314 +
    metrics.py:429-439).

    This XLA path gathers K/V densely and is used for testing and as the
    oracle for the Pallas kernel; production decode uses
    kvcompress_tpu/ops/pallas/paged_attention.py.

    Returns (output [S, H_q, d], updated kv_metrics).
    """
    S, Hq, d = query.shape
    _, Hkv, nb = block_tables_l.shape
    num_blocks, block_size, _ = k_cache.shape
    qpk = Hq // Hkv
    n = nb * block_size

    if active is not None:
        # inactive sequences produce zero output and record nothing
        context_lens_l = jnp.where(active[:, None], context_lens_l, 0)

    phys = (
        block_tables_l[..., None] * block_size
        + jnp.arange(block_size, dtype=jnp.int32)
    ).reshape(S, Hkv, n)
    kg = k_cache.reshape(-1, d)[phys].astype(jnp.float32)   # [S, Hkv, n, d]
    vg = v_cache.reshape(-1, d)[phys].astype(jnp.float32)
    if k_scale is not None:
        kg = kg * k_scale.reshape(-1)[phys][..., None]
        vg = vg * v_scale.reshape(-1)[phys][..., None]

    q = query.reshape(S, Hkv, qpk, d).astype(jnp.float32)
    logits = jnp.einsum("shqd,shnd->shqn", q, kg) * scale
    if alibi is not None:
        kv_pos = kv_positions.reshape(-1)[phys].astype(jnp.float32)
        al = alibi.reshape(Hkv, qpk)
        logits = logits + al[None, :, :, None] * (
            kv_pos[:, :, None, :]
            - last_positions.astype(jnp.float32)[:, None, None, None])
    if logit_cap:
        logits = logit_cap * jnp.tanh(logits / logit_cap)
    valid = (jnp.arange(n)[None, None, :] < context_lens_l[..., None])
    if window is not None:
        # sliding window masks by the KV's TOKEN position (compression may
        # have compacted logical indices, so positions are authoritative)
        kv_pos_w = kv_positions.reshape(-1)[phys]
        valid = valid & (
            (window < 0)
            | (kv_pos_w > (last_positions[:, None, None] - window)))
    logits = jnp.where(valid[:, :, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(valid[:, :, None, :], probs, 0.0)
    out = jnp.einsum("shqn,shnd->shqd", probs, vg)
    output = out.reshape(S, Hq, d).astype(query.dtype)

    if record_metrics:
        contrib = probs ** 2 if use_l2 else probs
        contrib = contrib.sum(axis=2)  # [S, Hkv, n] over query heads
        pos = kv_positions.reshape(-1)[phys]
        rec = valid & (pos <= (last_positions - buffer_len)[:, None, None])
        if active is not None:
            rec = rec & active[:, None, None]
        contrib = jnp.where(rec, contrib, 0.0)
        flat_phys = jnp.where(rec, phys, 0).reshape(-1)
        kv_metrics = kv_metrics.reshape(-1).at[flat_phys].add(
            contrib.reshape(-1)).reshape(kv_metrics.shape)

    return output, kv_metrics


def paged_decode_attention_multi(
    query: jax.Array,        # [S, Q, H_q, d] Q new tokens per seq
    k_cache: jax.Array,      # [num_blocks, block_size, d]
    v_cache: jax.Array,
    block_tables_l: jax.Array,   # [S, H_kv, nb] i32 (this layer)
    context_lens_l: jax.Array,   # [S, H_kv] i32 INCLUDING the Q new tokens
    scale: float,
    *,
    active: Optional[jax.Array] = None,  # [S] bool
    logit_cap: Optional[float] = None,
    k_scale: Optional[jax.Array] = None,  # int8 cache: [blocks, bs] f32
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-query decode attention for speculative verification: the Q new
    tokens' KVs are already written to the cache; query i attends everything
    up to and including its own position (ctx - Q + i + 1 columns). Used by
    the spec-decode verify program (reference vllm/spec_decode/ scores
    proposals with a batch-expanded forward, batch_expansion.py)."""
    S, Q, Hq, d = query.shape
    _, Hkv, nb = block_tables_l.shape
    num_blocks, block_size, _ = k_cache.shape
    qpk = Hq // Hkv
    n = nb * block_size

    ctx = context_lens_l
    if active is not None:
        ctx = jnp.where(active[:, None], ctx, 0)

    phys = (
        block_tables_l[..., None] * block_size
        + jnp.arange(block_size, dtype=jnp.int32)
    ).reshape(S, Hkv, n)
    kg = k_cache.reshape(-1, d)[phys].astype(jnp.float32)
    vg = v_cache.reshape(-1, d)[phys].astype(jnp.float32)
    if k_scale is not None:
        kg = kg * k_scale.reshape(-1)[phys][..., None]
        vg = vg * v_scale.reshape(-1)[phys][..., None]

    q = query.reshape(S, Q, Hkv, qpk, d).astype(jnp.float32)
    logits = jnp.einsum("sqhpd,shnd->shpqn", q, kg) * scale
    if logit_cap:
        logits = logit_cap * jnp.tanh(logits / logit_cap)
    # query i sees ctx - (Q - 1 - i) columns
    qi = jnp.arange(Q, dtype=jnp.int32)
    visible = ctx[:, :, None] - (Q - 1 - qi)[None, None, :]  # [S, Hkv, Q]
    col = jnp.arange(n, dtype=jnp.int32)
    mask = col[None, None, None, :] < visible[..., None]     # [S,Hkv,Q,n]
    logits = jnp.where(mask[:, :, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(mask[:, :, None, :, :], probs, 0.0)
    out = jnp.einsum("shpqn,shnd->sqhpd", probs, vg)
    return out.reshape(S, Q, Hq, d).astype(query.dtype)
