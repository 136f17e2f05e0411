"""JAX eviction pipeline vs the numpy oracle (kvcompress_tpu/ops/eviction_ref).

Mirrors the role of the reference's tests/kernels/test_kvcompress_eviction.py:
kernel (here: XLA program) outputs are compared against loop-based reference
implementations over randomized parameter grids.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvcompress_tpu.core.state import CacheState, init_cache_state, stack_pop
from kvcompress_tpu.kvcompress import eviction as ev
from kvcompress_tpu.ops import eviction_ref as ref


def make_case(rng, B=2, L=3, H=4, nb=6, bs=8, compressed=False):
    """Random per-head contexts with unique metrics and positions."""
    n = nb * bs
    ctx = rng.integers(0, n + 1, size=(B, L, H)).astype(np.int32)
    # ensure at least one head has data
    ctx[:, 0, 0] = np.maximum(ctx[:, 0, 0], bs)
    total = B * L * H * n
    metrics = rng.permutation(total).astype(np.float32).reshape(B, L, H, n)
    metrics /= total
    positions = np.full((B, L, H, n), -1, dtype=np.int32)
    last_pos = np.zeros(B, dtype=np.int32)
    for b in range(B):
        last_pos[b] = int(ctx[b].max()) + rng.integers(0, 4)
        for l in range(L):
            for h in range(H):
                c = ctx[b, l, h]
                if compressed:
                    # survivors of earlier compression: sorted random subset
                    pos = np.sort(
                        rng.choice(last_pos[b] + 1, size=c, replace=False)
                    )
                else:
                    pos = np.arange(c)
                positions[b, l, h, :c] = pos
    return metrics, positions, ctx, last_pos


def budgets(rng, metrics, positions, ctx, last_pos, protected, bs, frac=0.5):
    """Feasible eviction budgets per sequence."""
    B = ctx.shape[0]
    out = np.zeros(B, dtype=np.int32)
    for b in range(B):
        evictable = (
            (np.arange(metrics.shape[-1])[None, None, :] < ctx[b][..., None])
            & (positions[b] <= last_pos[b] - protected[b])
            & (positions[b] >= 0)
        )
        # count fully evictable blocks per head conservatively
        n_fin = 0
        for l in range(ctx.shape[1]):
            for h in range(ctx.shape[2]):
                hang = ref.hanging_token_count(ctx[b, l, h:h + 1], bs)[0]
                cnt = evictable[l, h].sum()
                if cnt >= hang:
                    n_fin += 1 + (cnt - hang) // bs
        out[b] = int(n_fin * frac)
    return out


@pytest.mark.parametrize("compressed", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_schedule_evictions_matches_oracle(seed, compressed):
    rng = np.random.default_rng(seed)
    bs = 8
    metrics, positions, ctx, last_pos = make_case(rng, compressed=compressed)
    protected = rng.integers(0, 6, size=ctx.shape[0]).astype(np.int32)
    eb = budgets(rng, metrics, positions, ctx, last_pos, protected, bs)

    want_mask, want_kv, want_blk = ref.ref_schedule_evictions(
        metrics, positions, ctx, last_pos, protected, eb, bs)

    got = jax.jit(ev.schedule_evictions, static_argnums=(6, 7))(
        jnp.asarray(metrics), jnp.asarray(positions), jnp.asarray(ctx),
        jnp.asarray(last_pos), jnp.asarray(protected), jnp.asarray(eb), bs, 0)

    np.testing.assert_array_equal(np.asarray(got.evicted_block_count), want_blk)
    np.testing.assert_array_equal(np.asarray(got.evicted_kv_count), want_kv)
    np.testing.assert_array_equal(np.asarray(got.evicted_mask), want_mask)


def test_schedule_respects_protected_window():
    rng = np.random.default_rng(3)
    bs = 4
    metrics, positions, ctx, last_pos = make_case(rng, B=1, L=2, H=2, nb=4,
                                                  bs=bs)
    protected = np.array([5], dtype=np.int32)
    eb = budgets(rng, metrics, positions, ctx, last_pos, protected, bs,
                 frac=1.0)
    got = ev.schedule_evictions(
        jnp.asarray(metrics), jnp.asarray(positions), jnp.asarray(ctx),
        jnp.asarray(last_pos), jnp.asarray(protected), jnp.asarray(eb), bs)
    mask = np.asarray(got.evicted_mask)
    assert mask.any()
    assert (positions[mask] <= last_pos[0] - protected[0]).all()


def test_moves_match_oracle():
    rng = np.random.default_rng(4)
    B, L, H, nb, bs = 2, 2, 3, 5, 8
    n = nb * bs
    metrics, positions, ctx, last_pos = make_case(rng, B, L, H, nb, bs)
    protected = np.zeros(B, dtype=np.int32)
    eb = budgets(rng, metrics, positions, ctx, last_pos, protected, bs)
    mask, kv_count, blk_count = ref.ref_schedule_evictions(
        metrics, positions, ctx, last_pos, protected, eb, bs)

    # sequential block tables
    bt = np.arange(1, 1 + B * L * H * nb, dtype=np.int32).reshape(B, L, H, nb)
    moves_ref = ref.ref_schedule_moves(mask, kv_count, ctx)

    got = jax.jit(ev.plan_cache_moves, static_argnums=(4, 5))(
        jnp.asarray(mask), jnp.asarray(kv_count), jnp.asarray(ctx),
        jnp.asarray(bt), bs, 4096)
    dst = np.asarray(got.dst)[np.asarray(got.valid)]
    src = np.asarray(got.src)[np.asarray(got.valid)]

    want_pairs = set()
    for (b, l, h), pairs in moves_ref.items():
        for d, s in pairs:
            dp = bt[b, l, h, d // bs] * bs + d % bs
            sp = bt[b, l, h, s // bs] * bs + s % bs
            want_pairs.add((dp, sp))
    got_pairs = set(zip(dst.tolist(), src.tolist()))
    assert got_pairs == want_pairs


def test_execute_moves_matches_oracle():
    rng = np.random.default_rng(5)
    B, L, H, nb, bs, hd = 1, 2, 2, 4, 4, 8
    num_blocks = 1 + B * L * H * nb
    metrics, positions, ctx, last_pos = make_case(rng, B, L, H, nb, bs)
    protected = np.zeros(B, dtype=np.int32)
    eb = budgets(rng, metrics, positions, ctx, last_pos, protected, bs)
    mask, kv_count, _ = ref.ref_schedule_evictions(
        metrics, positions, ctx, last_pos, protected, eb, bs)
    bt = np.arange(1, num_blocks, dtype=np.int32).reshape(B, L, H, nb)

    k = rng.standard_normal((num_blocks, bs, hd)).astype(np.float32)
    v = rng.standard_normal((num_blocks, bs, hd)).astype(np.float32)
    m = rng.standard_normal((num_blocks, bs)).astype(np.float32)
    p = rng.integers(0, 100, size=(num_blocks, bs)).astype(np.int32)

    moves_ref = ref.ref_schedule_moves(mask, kv_count, ctx)
    k2, v2, m2, p2 = k.copy(), v.copy(), m.copy(), p.copy()
    ref.ref_execute_moves(k2, v2, m2, p2, bt, moves_ref, bs)

    plan = ev.plan_cache_moves(
        jnp.asarray(mask), jnp.asarray(kv_count), jnp.asarray(ctx),
        jnp.asarray(bt), bs, 1024)
    gk, gv, gm, gp = ev.execute_cache_moves(
        jnp.asarray(k), jnp.asarray(v), jnp.asarray(m), jnp.asarray(p), plan)

    # trash block 0 may differ; compare allocated blocks only
    np.testing.assert_allclose(np.asarray(gk)[1:], k2[1:], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(gv)[1:], v2[1:], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(gm)[1:], m2[1:], rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(gp)[1:], p2[1:])


def build_state(rng, L, S, H, nb_max, bs, hd, num_blocks, seq_lens):
    """Host-built CacheState with sequentially allocated sequences."""
    state = init_cache_state(num_blocks, bs, hd, L, S, H, nb_max,
                             cache_dtype=jnp.float32)
    bt = np.zeros((L, S, H, nb_max), dtype=np.int32)
    ctx = np.zeros((L, S, H), dtype=np.int32)
    positions = np.full((num_blocks, bs), -1, dtype=np.int32)
    metrics = np.zeros((num_blocks, bs), dtype=np.float32)
    next_block = 1
    for s, ln in enumerate(seq_lens):
        if ln == 0:
            continue
        nb_seq = -(-ln // bs)
        for l in range(L):
            for h in range(H):
                ids = np.arange(next_block, next_block + nb_seq)
                next_block += nb_seq
                bt[l, s, h, :nb_seq] = ids
                ctx[l, s, h] = ln
                flat_pos = np.arange(nb_seq * bs)
                pos = np.where(flat_pos < ln, flat_pos, -1)
                positions[ids] = pos.reshape(nb_seq, bs)
                metrics[ids] = rng.random((nb_seq, bs)).astype(np.float32)
    free_ids = np.arange(next_block, num_blocks, dtype=np.int32)[::-1]
    stack = np.zeros((1, num_blocks), dtype=np.int32)
    stack[0, :len(free_ids)] = free_ids
    state = CacheState(
        k_cache=jnp.asarray(
            rng.standard_normal((num_blocks, bs, hd)).astype(np.float32)),
        v_cache=jnp.asarray(
            rng.standard_normal((num_blocks, bs, hd)).astype(np.float32)),
        kv_metrics=jnp.asarray(metrics),
        kv_positions=jnp.asarray(positions),
        block_tables=jnp.asarray(bt),
        context_lens=jnp.asarray(ctx),
        free_stack=jnp.asarray(stack),
        free_top=jnp.asarray([len(free_ids)], dtype=jnp.int32),
    )
    return state


def test_run_compression_end_to_end():
    rng = np.random.default_rng(6)
    L, S, H, nb, bs, hd = 2, 4, 2, 8, 4, 8
    seq_lens = [30, 17, 0, 9]
    num_blocks = 1 + L * H * sum(-(-ln // bs) for ln in seq_lens) + 16
    state = build_state(rng, L, S, H, nb, bs, hd, num_blocks, seq_lens)

    slots = np.array([0, 1], dtype=np.int32)
    last_pos = np.array([29, 16], dtype=np.int32)
    protected = np.array([4, 4], dtype=np.int32)
    eb = np.array([L * H * 2, L * H * 1], dtype=np.int32)  # 2 / 1 blocks/head

    free_top_before = int(state.free_top[0])
    new_state, blk_count, new_ctx = jax.jit(
        ev.run_compression, static_argnames=("nb", "moves_cap"),
        donate_argnums=(0,),
    )(state, jnp.asarray(slots), jnp.asarray(last_pos),
      jnp.asarray(protected), jnp.asarray(eb), nb=nb, moves_cap=1024)

    blk_count = np.asarray(blk_count)
    assert blk_count.sum(axis=(1, 2)).tolist() == eb.tolist()
    # freed blocks returned to the stack
    assert int(new_state.free_top[0]) == free_top_before + blk_count.sum()
    # context lens shrunk by (e-1)*bs + hanging per head
    new_ctx = np.asarray(new_ctx)
    ctx_after = np.asarray(new_state.context_lens)
    for i, s in enumerate(slots):
        np.testing.assert_array_equal(
            ctx_after[:, s, :], new_ctx[i].reshape(L, H))
    # untouched sequence unchanged
    np.testing.assert_array_equal(
        np.asarray(state.context_lens)[:, 3, :] if False else
        ctx_after[:, 3, :],
        np.full((L, H), 9))
    # all surviving positions are contiguous slots (compacted)
    pos_after = np.asarray(new_state.kv_positions)
    bt_after = np.asarray(new_state.block_tables)
    for i, s in enumerate(slots):
        for l in range(L):
            for h in range(H):
                c = ctx_after[l, s, h]
                nblk = -(-c // bs)
                ids = bt_after[l, s, h, :nblk]
                flat = pos_after[ids].reshape(-1)[:c]
                assert (flat >= 0).all()
                # protected window survived
                assert (flat <= last_pos[i]).all()
                protected_positions = set(
                    range(last_pos[i] - protected[i] + 1, last_pos[i]))
                surviving = set(flat.tolist())
                orig = set(range(0, last_pos[i] + 1))
                assert (protected_positions & orig) <= surviving


def test_stack_pop_push_roundtrip():
    state = init_cache_state(16, 4, 8, 1, 2, 1, 4)
    # need [S=2, H=1]: head axis is the last one (single partition)
    need = jnp.asarray(np.array([[True], [True]]))
    ids, top = stack_pop(state.free_stack, state.free_top, need,
                         head_axis=1)
    ids_np = np.asarray(ids)
    assert int(top[0]) == int(state.free_top[0]) - 2
    popped = {int(ids_np[0, 0]), int(ids_np[1, 0])}
    assert len(popped) == 2 and 0 not in popped


def test_partitioned_stacks_shard_local():
    """With G partitions, blocks popped for head h come from partition
    h // (H/G)'s contiguous id range - the TP shard-locality invariant."""
    G, H = 4, 8
    num_blocks = 64
    state = init_cache_state(num_blocks, 4, 8, 1, 2, H, 4,
                             num_block_partitions=G)
    cap = num_blocks // G
    need = jnp.ones((2, 3, H), bool)  # [L=2, S=3, H]
    ids, top = stack_pop(state.free_stack, state.free_top, need,
                         head_axis=2)
    ids_np = np.asarray(ids)
    for h in range(H):
        g = h // (H // G)
        blocks = ids_np[:, :, h].ravel()
        assert ((blocks >= g * cap) & (blocks < (g + 1) * cap)).all(), h
    # push back and verify tops restore
    from kvcompress_tpu.core.state import stack_push
    stack2, top2 = stack_push(state.free_stack, top, ids,
                              jnp.ones_like(need), head_axis=2)
    np.testing.assert_array_equal(np.asarray(top2),
                                  np.asarray(state.free_top))
