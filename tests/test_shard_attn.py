"""Production Pallas tail-decode kernel under a sharded mesh (shard_map,
interpret mode on the virtual CPU mesh): per-shard results must equal the
unsharded kernel, with block ids rebased to each shard's pool partition -
validating the head-sharded TP design end to end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvcompress_tpu.core.state import init_cache_state, stack_pop
from kvcompress_tpu.ops.pallas import paged_attention as ppa
from kvcompress_tpu.parallel import mesh as pmesh
from kvcompress_tpu.parallel.shard_attn import (
    paged_decode_attention_tail_sharded)


def test_tail_kernel_sharded_matches_unsharded():
    tp = 4
    if len(jax.devices()) < tp:
        pytest.skip("needs 4 virtual devices")
    mesh = pmesh.build_mesh(tp_size=tp)

    S, Hq, Hkv, d = 2, 8, 4, 128
    bs, nb, KT = 4, 4, 8
    num_blocks = 64
    rng = np.random.default_rng(0)

    # allocate blocks through the PARTITIONED allocator so every head's
    # blocks fall in its shard's pool range
    state = init_cache_state(num_blocks, bs, d, 1, S, Hkv, nb,
                             cache_dtype=jnp.float32,
                             num_block_partitions=tp)
    need = jnp.ones((1, S, Hkv, nb), bool)
    ids, _ = stack_pop(state.free_stack, state.free_top, need, head_axis=2)
    bt = np.asarray(ids)[0]                       # [S, Hkv, nb]

    kc = rng.standard_normal((num_blocks, bs, d)).astype(np.float32)
    vc = rng.standard_normal((num_blocks, bs, d)).astype(np.float32)
    q = rng.standard_normal((S, Hq, d)).astype(np.float32)
    tk = rng.standard_normal((S, Hkv, KT, d)).astype(np.float32)
    tv = rng.standard_normal((S, Hkv, KT, d)).astype(np.float32)
    tlen = np.asarray([2, 3], np.int32)
    ctx = np.asarray(rng.integers(4, nb * bs, size=(S, Hkv)), np.int32)

    out_ref, mc_ref, mt_ref = ppa.paged_decode_attention_tail(
        jnp.asarray(q), jnp.asarray(tk), jnp.asarray(tv),
        jnp.asarray(tlen), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(bt), jnp.asarray(ctx), d ** -0.5,
        use_l2=True, record_metrics=True, interpret=True)

    out, mc, mt = paged_decode_attention_tail_sharded(
        mesh, jnp.asarray(q), jnp.asarray(tk), jnp.asarray(tv),
        jnp.asarray(tlen), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(bt), jnp.asarray(ctx), d ** -0.5,
        use_l2=True, record_metrics=True, interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mc), np.asarray(mc_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mt), np.asarray(mt_ref),
                               rtol=1e-5, atol=1e-5)
