"""Pallas TPU prefill kernel: causal flash attention with fused KV-metric
emission.

Replaces the reference's modified-FA2 `flash_attn_kvc` fast path (returns the
S-matrix slice for the last `key_attn_agg_window` queries so prefill metrics
need no second pass - reference flash_attn.py:928-969, 1233-1256) and the
`_naive_kvc_attention` recompute fallback (flash_attn.py:1122-1211).

Grid = (kv-head groups, query blocks); each step processes GH query heads of
ONE kv head together: their rows stack into a single [GH*BQ, d] operand so
the MXU sees one large matmul per K chunk, the kv head's K/V stream is
fetched once for the whole group (not once per query head), and the
per-grid-step fixed overhead drops by the group factor - a ~3x speedup at
T=6144 (current on-chip number: kernel-test/RESULTS.json, measured by
kernel-test/run.py --sizes perf with tunnel-round-trip-amortised timing).

Two-phase design per grid step:
- main pass: ONLINE-softmax flash attention streaming K and V chunks
  HBM->VMEM double-buffered; work scales with the causal prefix only, and
  chunks beyond the causal frontier are never fetched.
- metric pass, gated to q blocks overlapping the observation window
  (qpos >= seq_len - window): re-streams K with the now-final softmax
  stats and accumulates sum over in-window queries of probs^2 (or probs)
  per key column, excluding the per-sequence metric buffer
  (col <= qpos - buffer_len). For the default window (32) this costs one
  extra K read for a single q block; KVC-full (window = whole prompt)
  degrades gracefully to 2x K reads.

The GQA fold over query heads, avg-mode rescale, and the k=7 maxpool happen
in the XLA epilogue (reference does them in Python: metrics.py:413-427,
flash_attn.py:1196-1210).
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
    dims_ref,     # [4] i32: (seq_len, window, buffer_len, q_offset)
    # inputs
    q_ref,        # [1, GH, BQ, d] VMEM (this head group, this q block)
    k_hbm,        # [Hkv, Tk, d] ANY
    v_hbm,        # [Hkv, Tk, d] ANY
    # outputs
    o_ref,        # [1, GH, BQ, d] VMEM
    m_ref,        # [1, 8, Tk] f32 VMEM (this group's rows, sublane-padded)
    # scratch
    kbuf,         # [2, CK, d]
    vbuf,         # [2, CK, d]
    ksem, vsem,
    *,
    scale: float,
    q_block: int,
    chunk: int,
    use_l2: bool,
    record_metrics: bool,
    group: int,    # GH query heads per kv-head grid step
    n_sub: int,    # sub-groups per kv head (qpk // GH)
    logit_cap: float = 0.0,
):
    g = pl.program_id(0)
    qb = pl.program_id(1)
    h = g // n_sub
    GH = group
    BQ = q_block
    CK = chunk
    G4 = GH * BQ
    d = q_ref.shape[3]

    seq_len = dims_ref[0]       # valid rows of THIS query chunk
    window = dims_ref[1]
    buffer_len = dims_ref[2]
    q_offset = dims_ref[3]      # tokens already cached before the chunk
    total_len = q_offset + seq_len

    q_start = qb * BQ
    kv_hi = jnp.minimum(q_offset + q_start + BQ, total_len)
    n_chunks = (kv_hi + CK - 1) // CK

    def k_copy(slot, j):
        return pltpu.make_async_copy(
            k_hbm.at[h, pl.ds(j * CK, CK)], kbuf.at[slot], ksem.at[slot])

    def v_copy(slot, j):
        return pltpu.make_async_copy(
            v_hbm.at[h, pl.ds(j * CK, CK)], vbuf.at[slot], vsem.at[slot])

    # The flash loop runs in the BASE-2 domain: log2(e) folds into the
    # logit scale so the exponentials are exp2 (the VPU's native exponent
    # path). The scale stays a single f32 multiply on the dot output -
    # folding it into bf16 Q would add a rounding step to every logit.
    LOG2E = 1.4426950408889634
    q = q_ref[0].reshape(G4, d)                   # head-major row stack
    row = jax.lax.broadcasted_iota(jnp.int32, (G4, CK), 0)
    colc = jax.lax.broadcasted_iota(jnp.int32, (G4, CK), 1)
    qpos = q_offset + q_start + row % BQ          # GLOBAL query position
    qpos_min = q_offset + q_start

    # zero this group's metric block at its first q step (qb iterates
    # innermost, so the block stays resident across the qb sweep)
    @pl.when(qb == 0)
    def _():
        m_ref[...] = jnp.zeros_like(m_ref)

    def chunk_logits(j, kc, masked):
        """Base-2 logits. masked=False: every column of chunk j is
        causally visible to every row of this q tile, so the iota
        compare + select is skipped - at T >> BQ that is most chunks,
        and the mask is pure VPU overhead the MXU never sees."""
        s = jax.lax.dot_general(
            q, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if logit_cap:
            s = (logit_cap * LOG2E) * jnp.tanh(s * (scale / logit_cap))
        else:
            s = s * (scale * LOG2E)
        if not masked:
            return s
        col = j * CK + colc
        causal = (col <= qpos) & (col < total_len) & (qpos < total_len)
        return jnp.where(causal, s, NEG_INF)

    # ---------------- main pass: online-softmax flash ----------------
    # Chunks [0, n_full) lie fully inside the causal prefix of every row
    # of this q tile AND inside total_len: they run the unmasked body.
    # Chunks [n_full, n_chunks) cross the causal diagonal or the length
    # frontier and pay the mask. Two fori_loops instead of a per-chunk
    # branch: lax.cond inside the hot loop measured ~30% slower (Mosaic
    # cannot pipeline across the branch).
    n_full = jnp.minimum(
        jnp.minimum(qpos_min + 1, total_len) // CK, n_chunks)

    @pl.when(n_chunks > 0)
    def _():
        k_copy(0, 0).start()
        v_copy(0, 0).start()

        def make_body(masked):
            def body(j, carry):
                m_i, l_i, acc = carry
                slot = j % 2

                @pl.when(j + 1 < n_chunks)
                def _():
                    k_copy((j + 1) % 2, j + 1).start()
                    v_copy((j + 1) % 2, j + 1).start()

                k_copy(slot, j).wait()
                s = chunk_logits(j, kbuf[slot], masked)
                m_new = jnp.maximum(m_i,
                                    jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp2(s - m_new)
                corr = jnp.exp2(m_i - m_new)
                l_i = l_i * corr + jnp.sum(p, axis=-1, keepdims=True)
                v_copy(slot, j).wait()
                pv = jax.lax.dot_general(
                    p.astype(vbuf.dtype), vbuf[slot],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc * corr + pv
                return m_new, l_i, acc
            return body

        m0 = jnp.full((G4, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((G4, 1), jnp.float32)
        a0 = jnp.zeros((G4, d), jnp.float32)
        m_f, l_f, acc = jax.lax.fori_loop(0, n_chunks,
                                          make_body(True), (m0, l0, a0),
                                          unroll=False)
        o_ref[0] = (acc / jnp.maximum(l_f, 1e-9)).astype(
            o_ref.dtype).reshape(GH, BQ, d)

        # ------------- metric pass: only in-window q blocks -------------
        if record_metrics:
            in_window = (q_offset + q_start + BQ > total_len - window) & (
                q_start < seq_len)

            @pl.when(in_window)
            def _():
                k_copy(0, 0).start()

                def mbody(j, _):
                    slot = j % 2

                    @pl.when(j + 1 < n_chunks)
                    def _():
                        k_copy((j + 1) % 2, j + 1).start()

                    k_copy(slot, j).wait()
                    s = chunk_logits(j, kbuf[slot], True)
                    col = j * CK + colc
                    p = jnp.exp2(s - m_f) / jnp.maximum(l_f, 1e-9)
                    if use_l2:
                        p = p * p
                    rec = ((qpos >= total_len - window)
                           & (qpos < total_len)
                           & (col <= qpos - buffer_len))
                    # per-QUERY-HEAD rows (the maxpool in the epilogue is
                    # per head, so the GQA fold stays outside)
                    mrows = jnp.sum(
                        jnp.where(rec, p, 0.0).reshape(GH, BQ, CK),
                        axis=1)                               # [GH, CK]
                    off = pl.multiple_of(j * CK, CK)
                    m_ref[0, :GH, pl.ds(off, CK)] += mrows
                    return ()

                jax.lax.fori_loop(0, n_chunks, mbody, (), unroll=False)

    @pl.when(n_chunks == 0)
    def _():
        o_ref[0] = jnp.zeros((GH, BQ, d), o_ref.dtype)


# the metric-defining k=7 maxpool MUST stay identical to the XLA oracle's
# (kernel-vs-oracle parity contract) - one shared implementation
from kvcompress_tpu.ops.attention import _maxpool1d_k7  # noqa: E402


@functools.partial(
    jax.jit,
    static_argnames=("scale", "metric_window", "metric_block", "use_l2",
                     "use_average", "use_maxpool", "record_metrics",
                     "q_block", "chunk", "interpret", "logit_cap"))
def prefill_attention(
    query: jax.Array,   # [Tq, H_q, d] (padded; rows >= seq_len are masked)
    key: jax.Array,     # [Tk, H_kv, d] (Tk >= Tq: cached prefix + chunk)
    value: jax.Array,   # [Tk, H_kv, d]
    seq_len: jax.Array,  # [] i32 actual length of the query chunk
    scale: float,
    *,
    metric_window: int = 32,
    metric_block: int = 1024,   # unused (no blocking needed); kept for API
    buffer_len: jax.Array | int = 0,
    use_l2: bool = True,
    use_average: bool = False,
    use_maxpool: bool = True,
    record_metrics: bool = True,
    q_block: int = 256,
    chunk: int = 512,
    interpret: bool = False,
    logit_cap: Optional[float] = None,
    q_offset: jax.Array | int = 0,  # [] i32 tokens already cached
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops.attention.prefill_attention (same
    output/metric contract): returns (output [Tq, H_q, d],
    kv_metrics [Tk, H_kv] f32). With q_offset > 0 this is a chunked-prefill
    continuation: key/value carry the cached prefix followed by the chunk's
    fresh KVs and metrics cover all Tk columns (the metric window must fit
    inside the chunk - the engine splits prompts that way)."""
    Tq, Hq, d = query.shape
    Tk, Hkv, _ = key.shape
    qpk = Hq // Hkv

    BQ = min(q_block, Tq)
    CK = min(chunk, Tk)
    # Tq/Tk must tile by BQ/CK (prefill buckets are powers of two >= 128;
    # a continuation's Tk = prefix + chunk may need a smaller CK, e.g.
    # 6144 + 128 tiles by 128)
    while CK > 128 and Tk % CK:
        CK //= 2
    assert Tq % BQ == 0 and Tk % CK == 0, (Tq, Tk, BQ, CK)
    n_qb = Tq // BQ

    # GQA head-group size: as many q heads per step as keep the [GH*BQ, CK]
    # logits tile within the VMEM budget. Hard cap at 8: the metric output
    # block is fixed at 8 sublane rows (out_shape below), so a larger GH
    # would write m_ref past the block for small BQ buckets.
    GH = min(qpk, 8)
    while GH > 1 and (GH * BQ > 1024 or qpk % GH):
        GH -= 1
    n_sub = qpk // GH

    q4 = jnp.transpose(query, (1, 0, 2)).reshape(
        Hkv * n_sub, GH, Tq, d)                   # head-major groups
    kT = jnp.transpose(key, (1, 0, 2))            # [Hkv, Tk, d]
    vT = jnp.transpose(value, (1, 0, 2))

    dims = jnp.stack([
        jnp.asarray(seq_len, jnp.int32),
        jnp.asarray(metric_window, jnp.int32),
        jnp.asarray(buffer_len, jnp.int32),
        jnp.asarray(q_offset, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hkv * n_sub, n_qb),
        in_specs=[
            pl.BlockSpec((1, GH, BQ, d), lambda g, qb, *_: (g, 0, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, GH, BQ, d), lambda g, qb, *_: (g, 0, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Tk), lambda g, qb, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CK, d), key.dtype),
            pltpu.VMEM((2, CK, d), value.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, scale=scale, q_block=BQ, chunk=CK, use_l2=use_l2,
        record_metrics=record_metrics, group=GH, n_sub=n_sub,
        logit_cap=logit_cap or 0.0)
    out, m_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Hkv * n_sub, GH, Tq, d), query.dtype),
            jax.ShapeDtypeStruct((Hkv * n_sub, 8, Tk), jnp.float32),
        ],
        interpret=interpret,
    )(dims, q4, kT, vT)

    output = jnp.transpose(
        out.reshape(Hq, Tq, d), (1, 0, 2))        # [Tq, Hq, d]

    if not record_metrics:
        return output, jnp.zeros((Tk, Hkv), jnp.float32)

    total_len = jnp.asarray(q_offset, jnp.int32) + jnp.asarray(
        seq_len, jnp.int32)
    # XLA epilogue (reference flash_attn.py:1196-1210 + metrics.py:413-427):
    # avg-mode rescale, per-query-head maxpool, GQA fold, zero the padding.
    m = m_rows[:, :GH, :].reshape(Hq, Tk)
    if use_average:
        w = jnp.minimum(jnp.asarray(metric_window, jnp.float32),
                        total_len.astype(jnp.float32))
        kpos = jnp.arange(Tk, dtype=jnp.float32)[None, :]
        m = m * ((kpos + 1.0) / w)
    if use_maxpool:
        m = _maxpool1d_k7(m)
    kv_metrics = m.reshape(Hkv, qpk, Tk).sum(axis=1).T  # [Tk, Hkv]
    kv_metrics = jnp.where(
        jnp.arange(Tk)[:, None] < total_len, kv_metrics, 0.0)
    return output, kv_metrics
