"""Pallas paged decode kernel vs the XLA reference path (interpret mode on
CPU; the same comparison runs compiled on real TPU via tests/tpu/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvcompress_tpu.ops import attention as att
from kvcompress_tpu.ops.pallas import paged_attention as ppa


def make_decode_case(rng, S=3, Hq=8, Hkv=2, d=128, nb=8, bs=16,
                     dtype=np.float32):
    num_blocks = 1 + S * Hkv * nb
    q = rng.standard_normal((S, Hq, d)).astype(dtype)
    k_cache = rng.standard_normal((num_blocks, bs, d)).astype(dtype)
    v_cache = rng.standard_normal((num_blocks, bs, d)).astype(dtype)
    metrics = rng.random((num_blocks, bs)).astype(np.float32)
    # shuffled block assignment to exercise scattered DMA
    ids = rng.permutation(np.arange(1, num_blocks)).astype(np.int32)
    bt = ids.reshape(S, Hkv, nb)
    ctx = rng.integers(1, nb * bs + 1, size=(S, Hkv)).astype(np.int32)
    positions = np.full((num_blocks, bs), -1, np.int32)
    for s in range(S):
        for h in range(Hkv):
            c = ctx[s, h]
            flat = np.arange(nb * bs)
            positions[bt[s, h]] = np.where(flat < c, flat,
                                           -1).reshape(nb, bs)
    last_pos = ctx.max(axis=1).astype(np.int32) + 1
    buffer_len = rng.integers(0, 3, size=S).astype(np.int32)
    return (q, k_cache, v_cache, metrics, positions, bt, ctx, last_pos,
            buffer_len)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("record", [True, False])
def test_pallas_matches_xla(seed, record):
    rng = np.random.default_rng(seed)
    (q, k, v, m, pos, bt, ctx, last_pos, buf) = make_decode_case(rng)
    scale = 0.11
    active = np.array([True, True, False])

    args = [jnp.asarray(x) for x in (q, k, v, m, pos, bt, ctx, last_pos,
                                     buf)]
    out_ref, m_ref = att.paged_decode_attention(
        *args, scale, active=jnp.asarray(active), use_l2=True,
        record_metrics=record)
    out_p, m_p = ppa.paged_decode_attention(
        *args, scale, active=jnp.asarray(active), use_l2=True,
        record_metrics=record, interpret=True)

    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_ref),
                               rtol=2e-4, atol=2e-5)


def test_pallas_inactive_seqs_zero():
    rng = np.random.default_rng(2)
    (q, k, v, m, pos, bt, ctx, last_pos, buf) = make_decode_case(rng, S=2)
    active = np.array([False, False])
    args = [jnp.asarray(x) for x in (q, k, v, m, pos, bt, ctx, last_pos,
                                     buf)]
    out, m2 = ppa.paged_decode_attention(
        *args, 0.1, active=jnp.asarray(active), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    np.testing.assert_array_equal(np.asarray(m2), m)
