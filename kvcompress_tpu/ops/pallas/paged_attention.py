"""Pallas TPU decode kernel: paged attention over per-(seq, kv-head) block
tables with per-KV eviction-metric emission.

Replaces csrc/attention/kvcompress_attention_kernels.cu (v1/v2) of the
reference. Key semantic match: for every attended KV whose position is
outside the sequence's metric-collection buffer, emit the squared normalized
attention probability summed over the query heads of the group
(kernel metric write :297-314 + CompressionMetrics.aggregate_decode
metrics.py:429-439, fused).

Design (one grid step per (seq, kv_head)):
- phase A: stream this head's K blocks HBM->VMEM through a double-buffered
  multi-block chunk pipeline (block ids scalar-prefetched from the per-head
  block table), computing the full logits row [qpk, n] in VMEM. KV positions
  ride along with each K chunk for metric gating.
- phase B: exact softmax over the valid context (no online rescaling needed:
  the logits row for one head fits VMEM even at 32k context), then the
  metric contribution row.
- phase C: stream V blocks the same way, accumulating out += probs @ V.

K and V are each read exactly once per step - the kernel is HBM-bandwidth
bound, which is the speed-of-light regime for single-token decode.

The metric contributions are returned densely [S, H_kv, n] and scatter-added
into the running metric tensor by XLA outside the kernel (per-head physical
slots are disjoint, so this is race-free and fuses with the surrounding
program).
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
    ctx_ref,        # [S, H] i32
    bt_ref,         # [S, H, nb] i32
    # inputs
    q_ref,          # [1, 1, QP, d] VMEM
    k_hbm,          # [num_blocks, bs, d] ANY
    v_hbm,          # [num_blocks, bs, d] ANY
    # outputs
    o_ref,          # [1, 1, QP, d] VMEM
    mo_ref,         # [1, 1, 1, n] f32 VMEM
    # scratch
    logits,         # [QP, n] f32
    kbuf,           # [2, C, bs, d]
    vbuf,           # [2, C, bs, d]
    ksem, vsem,
    *,
    scale: float,
    block_size: int,
    chunk_blocks: int,
    use_l2: bool,
    record_metrics: bool,
    qpk_real: int,
    logit_cap: float = 0.0,
):
    s = pl.program_id(0)
    h = pl.program_id(1)
    C = chunk_blocks
    bs = block_size
    nb = bt_ref.shape[-1]
    n = nb * bs
    QP, d = q_ref.shape[2], q_ref.shape[3]

    ctx = ctx_ref[s, h]
    nb_alloc = (ctx + bs - 1) // bs
    chunks_alloc = (nb_alloc + C - 1) // C

    def k_copy(slot, j, i):
        bid = bt_ref[s, h, j * C + i]
        return pltpu.make_async_copy(
            k_hbm.at[bid], kbuf.at[slot, i], ksem.at[slot])

    def v_copy(slot, j, i):
        bid = bt_ref[s, h, j * C + i]
        return pltpu.make_async_copy(
            v_hbm.at[bid], vbuf.at[slot, i], vsem.at[slot])

    # Whole chunks are always copied (stale block-table entries still hold
    # valid block ids; out-of-context columns are masked in phase B), so
    # starts/waits are unconditional and statically unrolled over C.
    def start_chunk(copy_fn, slot, j):
        for i in range(C):
            copy_fn(slot, j, i).start()

    def wait_chunk(copy_fn, slot, j):
        for i in range(C):
            copy_fn(slot, j, i).wait()

    q = q_ref[0, 0].astype(jnp.float32)  # [QP, d]

    # ---------------- phase A: stream K, fill logits ----------------
    @pl.when(chunks_alloc > 0)
    def _():
        start_chunk(k_copy, 0, 0)

        def body(j, _):
            slot = j % 2
            nxt = (j + 1) % 2

            @pl.when(j + 1 < chunks_alloc)
            def _():
                start_chunk(k_copy, nxt, j + 1)

            wait_chunk(k_copy, slot, j)
            kc = kbuf[slot].reshape(C * bs, d).astype(jnp.float32)
            off = pl.multiple_of(j * C * bs, min(C * bs, 128))
            logits[:, pl.ds(off, C * bs)] = (
                jax.lax.dot_general(
                    q, kc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale)
            return ()

        jax.lax.fori_loop(0, chunks_alloc, body, (), unroll=False)

    # ---------------- phase B: softmax + metric row ----------------
    col = jax.lax.broadcasted_iota(jnp.int32, (QP, n), 1)
    valid = col < ctx
    # stale region (never written this step) masked via valid
    lg = logits[...]
    if logit_cap:
        lg = logit_cap * jnp.tanh(lg / logit_cap)
    lg = jnp.where(valid, lg, NEG_INF)
    m = jnp.max(lg, axis=-1, keepdims=True)
    e = jnp.exp(lg - m)
    e = jnp.where(valid, e, 0.0)
    l = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / (l + 1e-9)
    logits[...] = probs  # reuse scratch for phase C

    if record_metrics:
        contrib = probs * probs if use_l2 else probs
        gate = (col[:1] < ctx).astype(jnp.float32)
        # only the real query heads of the group (rows beyond qpk are pads);
        # the position/buffer gate is applied in the XLA scatter epilogue
        mo_ref[0, 0, 0, :] = jnp.sum(contrib[:qpk_real], axis=0) * gate[0]
    else:
        mo_ref[0, 0, 0, :] = jnp.zeros((n,), jnp.float32)

    # ---------------- phase C: stream V, accumulate out ----------------
    o_ref[0, 0] = jnp.zeros((QP, d), o_ref.dtype)

    @pl.when(chunks_alloc > 0)
    def _():
        start_chunk(v_copy, 0, 0)

        def body(j, acc):
            slot = j % 2
            nxt = (j + 1) % 2

            @pl.when(j + 1 < chunks_alloc)
            def _():
                start_chunk(v_copy, nxt, j + 1)

            wait_chunk(v_copy, slot, j)
            vc = vbuf[slot].reshape(C * bs, d).astype(jnp.float32)
            off = pl.multiple_of(j * C * bs, min(C * bs, 128))
            pj = logits[:, pl.ds(off, C * bs)]
            return acc + jax.lax.dot_general(
                pj, vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, chunks_alloc, body,
                                jnp.zeros((QP, d), jnp.float32),
                                unroll=False)
        o_ref[0, 0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "use_l2", "record_metrics", "chunk_blocks",
                     "interpret", "logit_cap"))
def paged_decode_attention(
    query: jax.Array,        # [S, H_q, d]
    k_cache: jax.Array,      # [num_blocks, bs, d]
    v_cache: jax.Array,
    kv_metrics: jax.Array,   # [num_blocks, bs] f32
    kv_positions: jax.Array,  # [num_blocks, bs] i32
    block_tables_l: jax.Array,   # [S, H_kv, nb] i32
    context_lens_l: jax.Array,   # [S, H_kv] i32
    last_positions: jax.Array,   # [S] i32
    buffer_len: jax.Array,       # [S] i32
    scale: float,
    *,
    active: Optional[jax.Array] = None,
    use_l2: bool = True,
    record_metrics: bool = True,
    chunk_blocks: int = 4,
    interpret: bool = False,
    logit_cap: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops.attention.paged_decode_attention."""
    S, Hq, d = query.shape
    _, Hkv, nb = block_tables_l.shape
    num_blocks, bs, _ = k_cache.shape
    qpk = Hq // Hkv

    # chunk stores into the logits row must be 128-lane aligned: pick
    # C so C*bs is a multiple of 128 and pad the table width to a multiple
    # of C (padding block ids point at the trash block; masked by ctx)
    if nb * bs <= 128:
        C = nb
    else:
        C = max(chunk_blocks, max(1, 128 // bs))
        pad = (-nb) % C
        if pad:
            block_tables_l = jnp.pad(block_tables_l,
                                     ((0, 0), (0, 0), (0, pad)))
            nb = nb + pad
    n = nb * bs

    QP = max(qpk, 8)  # pad query group to the f32 sublane tile
    q = query.reshape(S, Hkv, qpk, d)
    if QP != qpk:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, QP - qpk), (0, 0)))

    ctx = context_lens_l
    if active is not None:
        ctx = jnp.where(active[:, None], ctx, 0)
    last_rec = last_positions - buffer_len

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, Hkv),
        in_specs=[
            pl.BlockSpec((1, 1, QP, d), lambda s, h, *_: (s, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, QP, d), lambda s, h, *_: (s, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda s, h, *_: (s, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((QP, n), jnp.float32),
            pltpu.VMEM((2, C, bs, d), k_cache.dtype),
            pltpu.VMEM((2, C, bs, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, scale=scale, block_size=bs, chunk_blocks=C,
        use_l2=use_l2, record_metrics=record_metrics, qpk_real=qpk,
        logit_cap=logit_cap or 0.0)
    out, m_contrib = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S, Hkv, QP, d), query.dtype),
            jax.ShapeDtypeStruct((S, Hkv, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(ctx, block_tables_l, q, k_cache, v_cache)

    out = out[:, :, :qpk, :].reshape(S, Hq, d)
    if record_metrics:
        phys = (
            block_tables_l[..., None] * bs
            + jnp.arange(bs, dtype=jnp.int32)
        ).reshape(S, Hkv, n)
        valid = jnp.arange(n, dtype=jnp.int32)[None, None, :] < ctx[..., None]
        # metric-buffer gate (kernel emits ungated contributions):
        # record only KVs with position <= last_position - buffer_len
        pos = kv_positions.reshape(-1)[jnp.where(valid, phys, 0)]
        rec = valid & (pos <= last_rec[:, None, None])
        flat_phys = jnp.where(rec, phys, 0).reshape(-1)
        vals = jnp.where(rec, m_contrib[:, :, 0, :], 0.0).reshape(-1)
        kv_metrics = kv_metrics.reshape(-1).at[flat_phys].add(vals).reshape(
            kv_metrics.shape)
    return out, kv_metrics


# ---------------------------------------------------------------------------
# Fused variant: the new token's K/V are written into the paged cache by the
# kernel itself (cache buffers aliased in-place), eliminating the per-layer
# XLA scatters that dominate small-batch decode steps on TPU. Metric
# contributions are returned densely in logical-index space so the engine can
# accumulate them across a multi-step burst and scatter once per burst.
# ---------------------------------------------------------------------------


def _fused_kernel(
    # scalar prefetch
    ctx_ref,        # [S, H] i32 (INCLUDING the new token; 0 = inactive)
    bt_ref,         # [S, H, nb] i32
    # inputs
    q_ref,          # [1, 1, QP, d] VMEM
    newk_ref,       # [1, 1, 1, d] VMEM
    newv_ref,       # [1, 1, 1, d] VMEM
    k_hbm,          # [num_blocks, bs, d] ANY (aliased with k_out)
    v_hbm,          # ANY (aliased with v_out)
    # outputs
    o_ref,          # [1, 1, QP, d] VMEM
    mo_ref,         # [1, 1, 1, n] f32 VMEM
    k_out,          # ANY (alias of k_hbm)
    v_out,          # ANY (alias of v_hbm)
    # scratch
    logits,         # [QP, n] f32
    kbuf,           # [2, C, bs, d]
    vbuf,           # [2, C, bs, d]
    wblk,           # [2, bs, d] staging for the new-KV block RMW
    ksem, vsem, wsem,
    *,
    scale: float,
    block_size: int,
    chunk_blocks: int,
    use_l2: bool,
    record_metrics: bool,
    qpk_real: int,
    logit_cap: float = 0.0,
):
    s = pl.program_id(0)
    h = pl.program_id(1)
    C = chunk_blocks
    bs = block_size
    nb = bt_ref.shape[-1]
    n = nb * bs
    QP, d = q_ref.shape[2], q_ref.shape[3]

    ctx = ctx_ref[s, h]
    nb_alloc = (ctx + bs - 1) // bs
    chunks_alloc = (nb_alloc + C - 1) // C

    # ---- phase 0: write the new KV into its slot (before reads) ----
    # bf16 tiling forbids single-sublane DMA, so read-modify-write the
    # whole [bs, d] cache block: DMA in, insert the new row in VMEM,
    # DMA back. Each (seq, head) owns its blocks, so this is race-free.
    @pl.when(ctx > 0)
    def _():
        last = ctx - 1
        wbid = bt_ref[s, h, last // bs]
        woff = last % bs
        rk = pltpu.make_async_copy(k_out.at[wbid], wblk.at[0], wsem.at[0])
        rv = pltpu.make_async_copy(v_out.at[wbid], wblk.at[1], wsem.at[1])
        rk.start()
        rv.start()
        rk.wait()
        rv.wait()
        row = jax.lax.broadcasted_iota(jnp.int32, (bs, d), 0)
        wblk[0] = jnp.where(row == woff, newk_ref[0, 0], wblk[0])
        wblk[1] = jnp.where(row == woff, newv_ref[0, 0], wblk[1])
        wk = pltpu.make_async_copy(wblk.at[0], k_out.at[wbid], wsem.at[0])
        wv = pltpu.make_async_copy(wblk.at[1], v_out.at[wbid], wsem.at[1])
        wk.start()
        wv.start()
        wk.wait()
        wv.wait()

    # reads go through the aliased OUTPUT refs so they observe the phase-0
    # write of the new KV
    def k_copy(slot, j, i):
        bid = bt_ref[s, h, j * C + i]
        return pltpu.make_async_copy(
            k_out.at[bid], kbuf.at[slot, i], ksem.at[slot])

    def v_copy(slot, j, i):
        bid = bt_ref[s, h, j * C + i]
        return pltpu.make_async_copy(
            v_out.at[bid], vbuf.at[slot, i], vsem.at[slot])

    def start_chunk(copy_fn, slot, j):
        for i in range(C):
            copy_fn(slot, j, i).start()

    def wait_chunk(copy_fn, slot, j):
        for i in range(C):
            copy_fn(slot, j, i).wait()

    q = q_ref[0, 0].astype(jnp.float32)

    # ---- phase A: stream K, fill logits ----
    @pl.when(chunks_alloc > 0)
    def _():
        start_chunk(k_copy, 0, 0)

        def body(j, _):
            slot = j % 2
            nxt = (j + 1) % 2

            @pl.when(j + 1 < chunks_alloc)
            def _():
                start_chunk(k_copy, nxt, j + 1)

            wait_chunk(k_copy, slot, j)
            kc = kbuf[slot].reshape(C * bs, d).astype(jnp.float32)
            off = pl.multiple_of(j * C * bs, min(C * bs, 128))
            logits[:, pl.ds(off, C * bs)] = (
                jax.lax.dot_general(
                    q, kc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale)
            return ()

        jax.lax.fori_loop(0, chunks_alloc, body, (), unroll=False)

    # ---- phase B: softmax + metric row ----
    col = jax.lax.broadcasted_iota(jnp.int32, (QP, n), 1)
    valid = col < ctx
    lg = logits[...]
    if logit_cap:
        lg = logit_cap * jnp.tanh(lg / logit_cap)
    lg = jnp.where(valid, lg, NEG_INF)
    m = jnp.max(lg, axis=-1, keepdims=True)
    e = jnp.exp(lg - m)
    e = jnp.where(valid, e, 0.0)
    l = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / (l + 1e-9)
    logits[...] = probs

    if record_metrics:
        contrib = probs * probs if use_l2 else probs
        gate = (col[:1] < ctx).astype(jnp.float32)
        mo_ref[0, 0, 0, :] = jnp.sum(contrib[:qpk_real], axis=0) * gate[0]
    else:
        mo_ref[0, 0, 0, :] = jnp.zeros((n,), jnp.float32)

    # ---- phase C: stream V, accumulate out ----
    o_ref[0, 0] = jnp.zeros((QP, d), o_ref.dtype)

    @pl.when(chunks_alloc > 0)
    def _():
        start_chunk(v_copy, 0, 0)

        def body(j, acc):
            slot = j % 2
            nxt = (j + 1) % 2

            @pl.when(j + 1 < chunks_alloc)
            def _():
                start_chunk(v_copy, nxt, j + 1)

            wait_chunk(v_copy, slot, j)
            vc = vbuf[slot].reshape(C * bs, d).astype(jnp.float32)
            off = pl.multiple_of(j * C * bs, min(C * bs, 128))
            pj = logits[:, pl.ds(off, C * bs)]
            return acc + jax.lax.dot_general(
                pj, vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, chunks_alloc, body,
                                jnp.zeros((QP, d), jnp.float32),
                                unroll=False)
        o_ref[0, 0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "use_l2", "record_metrics", "chunk_blocks",
                     "interpret", "logit_cap"))
def paged_decode_attention_fused(
    query: jax.Array,        # [S, H_q, d]
    new_k: jax.Array,        # [S, H_kv, d] the new token's K (this layer)
    new_v: jax.Array,        # [S, H_kv, d]
    k_cache: jax.Array,      # [num_blocks, bs, d] (donated)
    v_cache: jax.Array,      # (donated)
    block_tables_l: jax.Array,   # [S, H_kv, nb] i32
    context_lens_l: jax.Array,   # [S, H_kv] i32 INCLUDING the new token;
    #                              0 for inactive slots
    scale: float,
    *,
    use_l2: bool = True,
    record_metrics: bool = True,
    chunk_blocks: int = 4,
    interpret: bool = False,
    logit_cap: Optional[float] = None,
):
    """Write-new-KV + attend + emit dense metric contributions, one kernel.

    Returns (out [S, H_q, d], m_contrib [S, H_kv, n] f32 in LOGICAL index
    space, k_cache', v_cache'). The caller accumulates m_contrib across a
    decode burst and scatter-adds once (see engine/programs.py).
    """
    S, Hq, d = query.shape
    _, Hkv, nb = block_tables_l.shape
    num_blocks, bs, _ = k_cache.shape
    qpk = Hq // Hkv

    if nb * bs <= 128:
        C = nb
    else:
        C = max(chunk_blocks, max(1, 128 // bs))
        pad = (-nb) % C
        if pad:
            block_tables_l = jnp.pad(block_tables_l,
                                     ((0, 0), (0, 0), (0, pad)))
            nb = nb + pad
    n = nb * bs

    QP = max(qpk, 8)
    q = query.reshape(S, Hkv, qpk, d)
    if QP != qpk:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, QP - qpk), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, Hkv),
        in_specs=[
            pl.BlockSpec((1, 1, QP, d), lambda s, h, *_: (s, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, d), lambda s, h, *_: (s, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, d), lambda s, h, *_: (s, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, QP, d), lambda s, h, *_: (s, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda s, h, *_: (s, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((QP, n), jnp.float32),
            pltpu.VMEM((2, C, bs, d), k_cache.dtype),
            pltpu.VMEM((2, C, bs, d), v_cache.dtype),
            pltpu.VMEM((2, bs, d), k_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fused_kernel, scale=scale, block_size=bs, chunk_blocks=C,
        use_l2=use_l2, record_metrics=record_metrics, qpk_real=qpk,
        logit_cap=logit_cap or 0.0)
    out, m_contrib, k_cache, v_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S, Hkv, QP, d), query.dtype),
            jax.ShapeDtypeStruct((S, Hkv, 1, n), jnp.float32),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={5: 2, 6: 3},
        interpret=interpret,
    )(context_lens_l, block_tables_l,
      q, new_k.reshape(S, Hkv, 1, d), new_v.reshape(S, Hkv, 1, d),
      k_cache, v_cache)

    out = out[:, :, :qpk, :].reshape(S, Hq, d)
    return out, m_contrib[:, :, 0, :], k_cache, v_cache


# ---------------------------------------------------------------------------
# Tail variant: the production decode kernel. The newest KVs of the current
# multi-step burst live in a small dense "tail" buffer (engine carry) instead
# of being written into the paged cache every step; attention covers
# [paged cached part] + [tail]. The paged cache is read-only here (no
# in-kernel RMW writes - those serialized DMA round-trips dominated the old
# fused kernel), and K/V cache writes happen ONCE per burst as a single XLA
# scatter (engine/programs.py flush). All block copies are issued upfront
# into a whole-context VMEM stage, so the DMA stream runs at gather
# speed-of-light instead of chaining per-chunk waits.
# ---------------------------------------------------------------------------


def _tail_kernel(
    # scalar prefetch
    ctx_ref,        # [S, H] i32 total context INCLUDING tail (0 = inactive)
    tlen_ref,       # [S] i32 tail length (active steps so far this burst)
    bt_ref,         # [S, H, nb] i32
    # inputs / outputs / scratch, parsed by `quantized` (int8 cache mode
    # adds scale-plane operands + stages)
    *refs,
    scale: float,
    block_size: int,
    head_group: int,
    use_l2: bool,
    record_metrics: bool,
    qpk_real: int,
    logit_cap: float = 0.0,
    quantized: bool = False,
):
    """One grid step = one (sequence, head group): per-grid-step fixed
    overhead dominates this kernel (measured context-independent ~4us), so
    HG heads amortise it. All HG heads' block copies are issued upfront,
    then each head computes its exact softmax + metric rows.

    int8 cache mode: K/V blocks arrive as int8 (HALF the decode HBM
    traffic); per-KV scales come PRE-GATHERED to lane-aligned [1,HG,1,n]
    VMEM rows (a [nb,bs]-tiled scale stage cannot relayout to an n-lane
    vector on Mosaic) and are folded into the logit columns / probability
    rows, so dequantized K/V never materialize (see ops/kv_quant.py)."""
    if quantized:
        (q_ref, tailk_ref, tailv_ref, ksr_ref, vsr_ref, k_hbm, v_hbm,
         o_ref, mo_ref, mt_ref, kbuf, vbuf, ksem, vsem) = refs
    else:
        (q_ref, tailk_ref, tailv_ref, k_hbm, v_hbm,
         o_ref, mo_ref, mt_ref, kbuf, vbuf, ksem, vsem) = refs
        ksr_ref = vsr_ref = None
    sidx = pl.program_id(0)
    g = pl.program_id(1)
    HG = head_group
    bs = block_size
    nb = bt_ref.shape[-1]
    n = nb * bs
    QP, d = q_ref.shape[2], q_ref.shape[3]
    KT = tailk_ref.shape[2]

    tlen = tlen_ref[sidx]
    U = 8

    # ---- issue ALL HG heads' block copies upfront ----
    for hh in range(HG):
        h = g * HG + hh
        cached_h = jnp.maximum(ctx_ref[sidx, h] - tlen, 0)
        nbc = (cached_h + bs - 1) // bs
        n_groups = (nbc + U - 1) // U

        def start_group(gg, _, hh=hh, h=h, nbc=nbc):
            for u in range(U):
                i = gg * U + u

                @pl.when(i < nbc)
                def _():
                    bid = bt_ref[sidx, h, i]
                    pltpu.make_async_copy(k_hbm.at[bid], kbuf.at[hh, i],
                                          ksem).start()
                    pltpu.make_async_copy(v_hbm.at[bid], vbuf.at[hh, i],
                                          vsem).start()
            return ()

        jax.lax.fori_loop(0, n_groups, start_group, (), unroll=False)

    # ---- per head: wait its copies, then compute ----
    # NOTE (ordering assumption): all HG heads' block copies signal ONE
    # shared (ksem, vsem); waiting nbc(h) counts before head h's matmul
    # is only sound because same-semaphore DMAs complete in issue order
    # on the TPU DMA engine (per-queue FIFO). If that ever changes, give
    # each head its own shaped semaphore lane. Validated on-chip via
    # kernel-test/run.py (interpret mode cannot model DMA completion).
    for hh in range(HG):
        h = g * HG + hh
        ctx = ctx_ref[sidx, h]
        cached = jnp.maximum(ctx - tlen, 0)
        nbc = (cached + bs - 1) // bs
        n_groups = (nbc + U - 1) // U

        def wait_kv(gg, _, nbc=nbc):
            for u in range(U):
                i = gg * U + u

                @pl.when(i < nbc)
                def _():
                    pltpu.make_async_copy(k_hbm.at[0], kbuf.at[0, 0],
                                          ksem).wait()
                    pltpu.make_async_copy(v_hbm.at[0], vbuf.at[0, 0],
                                          vsem).wait()
            return ()

        jax.lax.fori_loop(0, n_groups, wait_kv, (), unroll=False)

        q = q_ref[0, hh]                          # [QP, d] native dtype
        kall = kbuf[hh].reshape(n, d)
        if quantized:
            kall = kall.astype(q.dtype)  # int8 -> compute dtype (exact)
        lg_c = jax.lax.dot_general(
            q, kall, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [QP, n]
        if quantized:
            # fold per-KV k scales into the logit columns (stale columns
            # are masked to NEG_INF below, so garbage scales are inert)
            lg_c = lg_c * ksr_ref[0, hh]          # [QP, n] * [1, n]
        tk = tailk_ref[0, hh]                                # [KT, d]
        lg_t = jax.lax.dot_general(
            q, tk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [QP, KT]
        if logit_cap:
            lg_c = logit_cap * jnp.tanh(lg_c / logit_cap)
            lg_t = logit_cap * jnp.tanh(lg_t / logit_cap)

        col = jax.lax.broadcasted_iota(jnp.int32, (QP, n), 1)
        valid_c = col < cached
        colt = jax.lax.broadcasted_iota(jnp.int32, (QP, KT), 1)
        valid_t = (colt < tlen) & (ctx > 0)
        lg_c = jnp.where(valid_c, lg_c, NEG_INF)
        lg_t = jnp.where(valid_t, lg_t, NEG_INF)

        m = jnp.maximum(jnp.max(lg_c, axis=-1, keepdims=True),
                        jnp.max(lg_t, axis=-1, keepdims=True))
        e_c = jnp.where(valid_c, jnp.exp(lg_c - m), 0.0)
        e_t = jnp.where(valid_t, jnp.exp(lg_t - m), 0.0)
        l = (jnp.sum(e_c, axis=-1, keepdims=True)
             + jnp.sum(e_t, axis=-1, keepdims=True) + 1e-9)
        p_c = e_c / l
        p_t = e_t / l

        if record_metrics:
            c_c = p_c * p_c if use_l2 else p_c
            c_t = p_t * p_t if use_l2 else p_t
            mo_ref[0, hh, 0, :] = jnp.sum(c_c[:qpk_real], axis=0)
            mt_ref[0, hh, 0, :] = jnp.sum(c_t[:qpk_real], axis=0)
        else:
            mo_ref[0, hh, 0, :] = jnp.zeros((n,), jnp.float32)
            mt_ref[0, hh, 0, :] = jnp.zeros((KT,), jnp.float32)

        # zero never-written stale V rows: their probs are 0, but 0 * NaN
        # (uninitialised VMEM) would still poison the matmul accumulator
        vrow = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        vall = jnp.where(vrow < cached, vbuf[hh].reshape(n, d), 0)
        if quantized:
            vall = vall.astype(q.dtype)
            # fold per-KV v scales into the probability row (zero the
            # columns beyond the cached context)
            vsflat = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) < cached,
                vsr_ref[0, hh], 0.0)
            p_c = p_c * vsflat
        pc = p_c.astype(vall.dtype)
        acc = jax.lax.dot_general(pc, vall, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        tv = tailv_ref[0, hh]
        acc = acc + jax.lax.dot_general(
            p_t.astype(tv.dtype), tv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, hh] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "use_l2", "record_metrics", "interpret",
                     "logit_cap"))
def paged_decode_attention_tail(
    query: jax.Array,        # [S, H_q, d]
    tail_k: jax.Array,       # [S, H_kv, KT, d] burst tail (row tlen-1 = newest)
    tail_v: jax.Array,       # [S, H_kv, KT, d]
    tail_len: jax.Array,     # [S] i32 valid tail rows (this burst, incl. now)
    k_cache: jax.Array,      # [num_blocks, bs, d] (read-only)
    v_cache: jax.Array,
    block_tables_l: jax.Array,   # [S, H_kv, nb] i32
    context_lens_l: jax.Array,   # [S, H_kv] i32 INCLUDING tail; 0 inactive
    scale: float,
    *,
    use_l2: bool = True,
    record_metrics: bool = True,
    interpret: bool = False,
    logit_cap: Optional[float] = None,
    k_scale: Optional[jax.Array] = None,  # int8 cache: [blocks, bs] f32
    v_scale: Optional[jax.Array] = None,
):
    """Decode attention over [paged cache (read-only)] + [dense burst tail].

    Returns (out [S, H_q, d], m_cached [S, H_kv, n] f32 in logical index
    space, m_tail [S, H_kv, KT] f32). The engine accumulates both across the
    burst and scatters once (see engine/programs.py)."""
    S, Hq, d = query.shape
    _, Hkv, nb = block_tables_l.shape
    num_blocks, bs, _ = k_cache.shape
    qpk = Hq // Hkv
    KT = tail_k.shape[2]
    quantized = k_scale is not None

    # The block tables ride in SMEM via scalar prefetch; at wide tables and
    # large batches [S, H, nb] i32 overflows the ~1 MB SMEM budget. Chunk
    # the sequence axis into separate kernel calls (semantics-preserving:
    # sequences are independent) sized to stay under half the budget.
    smem_budget = 448 * 1024
    if S * Hkv * nb * 4 > smem_budget:
        chunk = max(1, smem_budget // (Hkv * nb * 4))
        while S % chunk:
            chunk -= 1
        outs = []
        for i in range(0, S, chunk):
            sl = slice(i, i + chunk)
            outs.append(paged_decode_attention_tail(
                query[sl], tail_k[sl], tail_v[sl], tail_len[sl],
                k_cache, v_cache, block_tables_l[sl], context_lens_l[sl],
                scale, use_l2=use_l2, record_metrics=record_metrics,
                interpret=interpret, logit_cap=logit_cap,
                k_scale=k_scale, v_scale=v_scale))
        return tuple(jnp.concatenate([o[j] for o in outs], axis=0)
                     for j in range(3))

    # pad table width so n is a multiple of 128 lanes
    if nb * bs > 128:
        C = max(1, 128 // bs)
        pad = (-nb) % C
        if pad:
            block_tables_l = jnp.pad(block_tables_l,
                                     ((0, 0), (0, 0), (0, pad)))
            nb = nb + pad
    n = nb * bs

    QP = max(qpk, 8)
    q = query.reshape(S, Hkv, qpk, d)
    if QP != qpk:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, QP - qpk), (0, 0)))

    # head group size: as many heads as fit the VMEM stage budget
    # (per-grid-step fixed overhead dominates, so bigger groups win)
    itemsize = (1 if k_cache.dtype == jnp.int8
                else 2 if k_cache.dtype in (jnp.bfloat16, jnp.float16)
                else 4)
    per_head = nb * bs * d * itemsize * 2  # K + V stage
    if quantized:
        per_head += nb * bs * 8            # + f32 scale stages
    budget = 10 * 1024 * 1024
    HG = max(1, min(Hkv, budget // max(per_head, 1)))
    while Hkv % HG != 0:
        HG -= 1
    n_groups = Hkv // HG

    in_specs = [
        pl.BlockSpec((1, HG, QP, d), lambda s, g, *_: (s, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, HG, KT, d), lambda s, g, *_: (s, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, HG, KT, d), lambda s, g, *_: (s, g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [context_lens_l, tail_len, block_tables_l, q, tail_k, tail_v]
    if quantized:
        # pre-gather scale rows to lane-aligned [S, Hkv, 1, n] (a tiny
        # fraction of the int8 K/V bytes; a [nb, bs]-tiled stage cannot
        # relayout to n lanes inside the kernel)
        phys = (block_tables_l[..., None] * bs
                + jnp.arange(bs, dtype=jnp.int32)).reshape(S, Hkv, 1, n)
        ks_rows = k_scale.reshape(-1)[phys]
        vs_rows = v_scale.reshape(-1)[phys]
        in_specs += [
            pl.BlockSpec((1, HG, 1, n), lambda s, g, *_: (s, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HG, 1, n), lambda s, g, *_: (s, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [ks_rows, vs_rows]
    in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY)]
    operands += [k_cache, v_cache]
    scratch = [
        pltpu.VMEM((HG, nb, bs, d), k_cache.dtype),
        pltpu.VMEM((HG, nb, bs, d), v_cache.dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, n_groups),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, HG, QP, d), lambda s, g, *_: (s, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HG, 1, n), lambda s, g, *_: (s, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HG, 1, KT), lambda s, g, *_: (s, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _tail_kernel, scale=scale, block_size=bs, head_group=HG,
        use_l2=use_l2, record_metrics=record_metrics, qpk_real=qpk,
        logit_cap=logit_cap or 0.0, quantized=quantized)
    out, m_cached, m_tail = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S, Hkv, QP, d), query.dtype),
            jax.ShapeDtypeStruct((S, Hkv, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((S, Hkv, 1, KT), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    out = out[:, :, :qpk, :].reshape(S, Hq, d)
    return out, m_cached[:, :, 0, :], m_tail[:, :, 0, :]
