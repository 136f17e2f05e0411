"""Pallas TPU prefill kernel: causal flash attention with fused KV-metric
emission.

Replaces the reference's modified-FA2 `flash_attn_kvc` fast path (returns the
S-matrix slice for the last `key_attn_agg_window` queries so prefill metrics
need no second pass - reference flash_attn.py:928-969, 1233-1256) and the
`_naive_kvc_attention` recompute fallback (flash_attn.py:1122-1211): here the
per-KV squared-attention sums over the metric window are accumulated inside
the attention kernel itself, so K is read exactly once per query block and
the full attention matrix is never materialized in HBM.

Design (grid = (Hq, n_q_blocks), q-block innermost so metric rows accumulate
across q blocks into one output row per head):
- phase A: stream this head's K column-chunks HBM->VMEM (double-buffered),
  filling the exact logits row [BQ, T_kv] in VMEM. Chunks beyond the causal
  frontier of the q block are never fetched.
- phase B: exact softmax over the valid (causal & in-sequence) columns, then
  the metric row: sum over in-window queries (qpos >= seq_len - window) of
  probs^2 (or probs), excluding columns inside the per-sequence metric
  buffer (col <= qpos - buffer_len). Accumulated into m_out[hq, :] across
  q blocks.
- phase C: stream V chunks the same way, out += probs @ V.

The GQA fold over query heads, avg-mode rescale, and the k=7 maxpool happen
in the XLA epilogue (cheap elementwise over [Hq, T]), mirroring where the
reference does them in Python (metrics.py:413-427, flash_attn.py:1196-1210).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    dims_ref,     # [3] i32: (seq_len, window, buffer_len)
    # inputs
    q_ref,        # [1, BQ, d] VMEM (this head, this q block)
    k_hbm,        # [Hkv, T, d] ANY
    v_hbm,        # [Hkv, T, d] ANY
    # outputs
    o_ref,        # [1, BQ, d] VMEM
    m_ref,        # [Hq, T] f32 VMEM (full array; accumulated in-place)
    # scratch
    logits,       # [BQ, T] f32
    kbuf,         # [2, CK, d]
    vbuf,         # [2, CK, d]
    ksem, vsem,
    *,
    scale: float,
    q_block: int,
    chunk: int,
    use_l2: bool,
    record_metrics: bool,
    qpk: int,
    logit_cap: float = 0.0,
):
    hq = pl.program_id(0)
    qb = pl.program_id(1)
    h = hq // qpk
    BQ = q_block
    CK = chunk
    T = logits.shape[1]

    seq_len = dims_ref[0]
    window = dims_ref[1]
    buffer_len = dims_ref[2]

    q_start = qb * BQ
    # causal frontier: no key beyond the last query row of this block or the
    # sequence end is ever needed
    kv_hi = jnp.minimum(q_start + BQ, seq_len)
    n_chunks = (kv_hi + CK - 1) // CK

    def k_copy(slot, j):
        return pltpu.make_async_copy(
            k_hbm.at[h, pl.ds(j * CK, CK)], kbuf.at[slot], ksem.at[slot])

    def v_copy(slot, j):
        return pltpu.make_async_copy(
            v_hbm.at[h, pl.ds(j * CK, CK)], vbuf.at[slot], vsem.at[slot])

    q = q_ref[0].astype(jnp.float32)  # [BQ, d]

    # ---------------- phase A: stream K, fill logits ----------------
    @pl.when(n_chunks > 0)
    def _():
        k_copy(0, 0).start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < n_chunks)
            def _():
                k_copy((j + 1) % 2, j + 1).start()

            k_copy(slot, j).wait()
            kc = kbuf[slot].astype(jnp.float32)  # [CK, d]
            off = pl.multiple_of(j * CK, CK)
            logits[:, pl.ds(off, CK)] = jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            return ()

        jax.lax.fori_loop(0, n_chunks, body, (), unroll=False)

    # ---------------- phase B: softmax + metric row ----------------
    col = jax.lax.broadcasted_iota(jnp.int32, (BQ, T), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (BQ, T), 0)
    qpos = q_start + row
    causal = (col <= qpos) & (col < seq_len) & (qpos < seq_len)
    lg = logits[...]
    if logit_cap:
        lg = logit_cap * jnp.tanh(lg / logit_cap)
    lg = jnp.where(causal, lg, NEG_INF)
    m = jnp.max(lg, axis=-1, keepdims=True)
    e = jnp.exp(lg - m)
    e = jnp.where(causal, e, 0.0)
    l = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / (l + 1e-9)
    logits[...] = probs  # reuse scratch for phase C

    # the [Hq, T] metric output rides as one full-array block revisited by
    # every grid step; zero it once, then accumulate this block's row
    @pl.when((hq == 0) & (qb == 0))
    def _():
        m_ref[...] = jnp.zeros_like(m_ref)

    if record_metrics:
        contrib = probs * probs if use_l2 else probs
        in_window = qpos >= (seq_len - window)
        rec = in_window & (col <= qpos - buffer_len)
        mrow = jnp.sum(jnp.where(rec, contrib, 0.0), axis=0)  # [T]
        m_ref[pl.ds(hq, 1), :] += mrow[None, :]

    # ---------------- phase C: stream V, accumulate out ----------------
    o_ref[0] = jnp.zeros((BQ, q_ref.shape[2]), o_ref.dtype)

    @pl.when(n_chunks > 0)
    def _():
        v_copy(0, 0).start()

        def body(j, acc):
            slot = j % 2

            @pl.when(j + 1 < n_chunks)
            def _():
                v_copy((j + 1) % 2, j + 1).start()

            v_copy(slot, j).wait()
            vc = vbuf[slot].astype(jnp.float32)  # [CK, d]
            off = pl.multiple_of(j * CK, CK)
            pj = logits[:, pl.ds(off, CK)]
            return acc + jax.lax.dot_general(
                pj, vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(
            0, n_chunks, body,
            jnp.zeros((BQ, q_ref.shape[2]), jnp.float32), unroll=False)
        o_ref[0] = acc.astype(o_ref.dtype)


def _maxpool1d_k7(x: jax.Array) -> jax.Array:
    pads = [(0, 0)] * (x.ndim - 1) + [(3, 3)]
    xp = jnp.pad(x, pads, constant_values=-jnp.inf)
    out = x
    for s in range(7):
        out = jnp.maximum(out, jax.lax.slice_in_dim(
            xp, s, s + x.shape[-1], axis=-1))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("scale", "metric_window", "metric_block", "use_l2",
                     "use_average", "use_maxpool", "record_metrics",
                     "q_block", "chunk", "interpret", "logit_cap"))
def prefill_attention(
    query: jax.Array,   # [T, H_q, d] (padded; rows >= seq_len are masked)
    key: jax.Array,     # [T, H_kv, d]
    value: jax.Array,   # [T, H_kv, d]
    seq_len: jax.Array,  # [] i32 actual length
    scale: float,
    *,
    metric_window: int = 32,
    metric_block: int = 1024,   # unused (no blocking needed); kept for API
    buffer_len: jax.Array | int = 0,
    use_l2: bool = True,
    use_average: bool = False,
    use_maxpool: bool = True,
    record_metrics: bool = True,
    q_block: int = 128,
    chunk: int = 512,
    interpret: bool = False,
    logit_cap: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops.attention.prefill_attention (same
    output/metric contract): returns (output [T, H_q, d],
    kv_metrics [T, H_kv] f32)."""
    T, Hq, d = query.shape
    _, Hkv, _ = key.shape
    qpk = Hq // Hkv

    BQ = min(q_block, T)
    CK = min(chunk, T)
    # T must tile by BQ and CK (prefill buckets are powers of two >= 128)
    assert T % BQ == 0 and T % CK == 0, (T, BQ, CK)
    n_qb = T // BQ

    qT = jnp.transpose(query, (1, 0, 2))          # [Hq, T, d]
    kT = jnp.transpose(key, (1, 0, 2))            # [Hkv, T, d]
    vT = jnp.transpose(value, (1, 0, 2))

    dims = jnp.stack([
        jnp.asarray(seq_len, jnp.int32),
        jnp.asarray(metric_window, jnp.int32),
        jnp.asarray(buffer_len, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hq, n_qb),
        in_specs=[
            pl.BlockSpec((1, BQ, d), lambda hq, qb, *_: (hq, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, BQ, d), lambda hq, qb, *_: (hq, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hq, T), lambda hq, qb, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((BQ, T), jnp.float32),
            pltpu.VMEM((2, CK, d), key.dtype),
            pltpu.VMEM((2, CK, d), value.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, scale=scale, q_block=BQ, chunk=CK, use_l2=use_l2,
        record_metrics=record_metrics, qpk=qpk,
        logit_cap=logit_cap or 0.0)
    out, m_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Hq, T, d), query.dtype),
            jax.ShapeDtypeStruct((Hq, T), jnp.float32),
        ],
        interpret=interpret,
    )(dims, qT, kT, vT)

    output = jnp.transpose(out, (1, 0, 2))  # [T, Hq, d]

    if not record_metrics:
        return output, jnp.zeros((T, Hkv), jnp.float32)

    # XLA epilogue (reference flash_attn.py:1196-1210 + metrics.py:413-427):
    # avg-mode rescale, per-query-head maxpool, GQA fold, zero the padding.
    m = m_rows  # [Hq, T]
    if use_average:
        w = jnp.minimum(jnp.asarray(metric_window, jnp.float32),
                        seq_len.astype(jnp.float32))
        kpos = jnp.arange(T, dtype=jnp.float32)[None, :]
        m = m * ((kpos + 1.0) / w)
    if use_maxpool:
        m = _maxpool1d_k7(m)
    kv_metrics = m.reshape(Hkv, qpk, T).sum(axis=1).T  # [T, Hkv]
    kv_metrics = jnp.where(
        jnp.arange(T)[:, None] < seq_len, kv_metrics, 0.0)
    return output, kv_metrics
