"""Attention + cache op tests vs direct numpy oracles (the pattern of the
reference's tests/kernels/test_kvcompress_attention.py and
test_kvcompress_cache.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvcompress_tpu.ops import attention as att


def np_softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def np_maxpool7(x):
    T = x.shape[-1]
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(3, 3)],
                constant_values=-np.inf)
    return np.max(
        np.stack([xp[..., s:s + T] for s in range(7)], axis=0), axis=0)


def test_write_to_cache():
    rng = np.random.default_rng(0)
    nb, bs, d, T, H = 8, 4, 8, 5, 3
    k_cache = np.zeros((nb, bs, d), np.float32)
    v_cache = np.zeros((nb, bs, d), np.float32)
    metrics = np.full((nb, bs), 7.0, np.float32)
    positions = np.full((nb, bs), -1, np.int32)
    key = rng.standard_normal((T, H, d)).astype(np.float32)
    value = rng.standard_normal((T, H, d)).astype(np.float32)
    slots = rng.choice(nb * bs - bs, size=(T, H), replace=False).astype(
        np.int32) + bs  # avoid trash block
    slots[-1, -1] = -1  # padded write
    pos = np.arange(T, dtype=np.int32)

    k2, v2, m2, p2 = att.write_to_cache(
        jnp.asarray(k_cache), jnp.asarray(v_cache), jnp.asarray(metrics),
        jnp.asarray(positions), jnp.asarray(key), jnp.asarray(value),
        jnp.asarray(slots), jnp.asarray(pos))
    k2, v2, m2, p2 = map(np.asarray, (k2, v2, m2, p2))
    for t in range(T):
        for h in range(H):
            s = slots[t, h]
            if s < 0:
                continue
            np.testing.assert_allclose(k2.reshape(-1, d)[s], key[t, h])
            np.testing.assert_allclose(v2.reshape(-1, d)[s], value[t, h])
            assert m2.reshape(-1)[s] == 0.0
            assert p2.reshape(-1)[s] == t
    # untouched slots keep old values
    untouched = np.setdiff1d(np.arange(nb * bs),
                             slots[slots >= 0].reshape(-1))
    untouched = untouched[untouched >= bs]
    assert (m2.reshape(-1)[untouched] == 7.0).all()


@pytest.mark.parametrize("use_l2,use_maxpool,buffer_len",
                         [(True, True, 0), (True, False, 2),
                          (False, False, 0)])
def test_prefill_attention_vs_oracle(use_l2, use_maxpool, buffer_len):
    rng = np.random.default_rng(1)
    T, Hq, Hkv, d = 24, 4, 2, 8
    seq_len = 19
    w = 8
    scale = d ** -0.5
    q = rng.standard_normal((T, Hq, d)).astype(np.float32)
    k = rng.standard_normal((T, Hkv, d)).astype(np.float32)
    v = rng.standard_normal((T, Hkv, d)).astype(np.float32)
    qpk = Hq // Hkv

    out, metrics = att.prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(seq_len), scale, metric_window=w, metric_block=w,
        buffer_len=buffer_len, use_l2=use_l2, use_maxpool=use_maxpool,
        q_chunk=7)
    out, metrics = np.asarray(out), np.asarray(metrics)

    # oracle output
    krep = np.repeat(k, qpk, axis=1)
    vrep = np.repeat(v, qpk, axis=1)
    m_q = np.zeros((Hq, seq_len), np.float64)
    for i in range(seq_len):
        logits = scale * np.einsum("hd,khd->hk", q[i], krep[:i + 1])
        probs = np_softmax(logits, axis=-1)
        o = np.einsum("hk,khd->hd", probs, vrep[:i + 1])
        np.testing.assert_allclose(out[i], o, rtol=2e-4, atol=2e-4)
        if i >= seq_len - w:
            p = probs ** 2 if use_l2 else probs
            for j in range(i + 1):
                if j <= i - buffer_len:
                    m_q[:, j] += p[:, j]
    if use_maxpool:
        full = np.zeros((Hq, seq_len))
        full[:, :m_q.shape[1]] = m_q
        m_q = np_maxpool7(full)
    want = m_q.reshape(Hkv, qpk, seq_len).sum(axis=1).T
    np.testing.assert_allclose(metrics[:seq_len], want, rtol=1e-3, atol=1e-4)
    assert (metrics[seq_len:] == 0).all()


def test_prefill_metric_multiblock_consistency():
    """Without maxpool, chunked metric collection must equal single-chunk."""
    rng = np.random.default_rng(2)
    T, Hq, Hkv, d = 33, 4, 4, 8
    seq_len = 30
    q = rng.standard_normal((T, Hq, d)).astype(np.float32)
    k = rng.standard_normal((T, Hkv, d)).astype(np.float32)
    v = rng.standard_normal((T, Hkv, d)).astype(np.float32)

    kwargs = dict(scale=0.3, metric_window=16, buffer_len=0, use_l2=True,
                  use_maxpool=False)
    _, m1 = att.prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seq_len),
        metric_block=16, **kwargs)
    _, m2 = att.prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seq_len),
        metric_block=4, **kwargs)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=2e-4,
                               atol=1e-5)


def test_paged_decode_attention_vs_oracle():
    rng = np.random.default_rng(3)
    S, Hq, Hkv, d, nb, bs = 3, 4, 2, 8, 4, 4
    num_blocks = 1 + S * Hkv * nb
    qpk = Hq // Hkv
    scale = 0.35

    q = rng.standard_normal((S, Hq, d)).astype(np.float32)
    k_cache = rng.standard_normal((num_blocks, bs, d)).astype(np.float32)
    v_cache = rng.standard_normal((num_blocks, bs, d)).astype(np.float32)
    metrics0 = rng.random((num_blocks, bs)).astype(np.float32)
    bt = np.arange(1, num_blocks, dtype=np.int32).reshape(S, Hkv, nb)
    ctx = rng.integers(1, nb * bs + 1, size=(S, Hkv)).astype(np.int32)
    positions = np.full((num_blocks, bs), -1, np.int32)
    for s in range(S):
        for h in range(Hkv):
            c = ctx[s, h]
            flat = np.arange(nb * bs)
            positions[bt[s, h]] = np.where(
                flat < c, flat, -1).reshape(nb, bs)
    last_pos = ctx.max(axis=1).astype(np.int32) + 2
    buffer_len = np.array([0, 1, 3], dtype=np.int32)

    out, new_metrics = att.paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.asarray(metrics0), jnp.asarray(positions), jnp.asarray(bt),
        jnp.asarray(ctx), jnp.asarray(last_pos), jnp.asarray(buffer_len),
        scale)
    out, new_metrics = np.asarray(out), np.asarray(new_metrics.copy())

    want_metrics = metrics0.copy()
    for s in range(S):
        for h in range(Hkv):
            c = ctx[s, h]
            phys = (bt[s, h][:, None] * bs + np.arange(bs)).reshape(-1)[:c]
            kk = k_cache.reshape(-1, d)[phys]
            vv = v_cache.reshape(-1, d)[phys]
            for g in range(qpk):
                qh = h * qpk + g
                logits = scale * (kk @ q[s, qh])
                probs = np_softmax(logits)
                o = probs @ vv
                np.testing.assert_allclose(out[s, qh], o, rtol=2e-4,
                                           atol=2e-4)
                rec = positions.reshape(-1)[phys] <= (
                    last_pos[s] - buffer_len[s])
                np.add.at(want_metrics.reshape(-1), phys[rec],
                          (probs ** 2)[rec])
    np.testing.assert_allclose(new_metrics, want_metrics, rtol=1e-4,
                               atol=1e-5)


def test_prefill_metric_multiblock_consistency_with_maxpool():
    """Chunked metric collection must equal single-chunk WITH maxpool too:
    the pool applies once to the accumulated rows (pallas epilogue
    ordering), never per chunk (sum(maxpool(chunk)) != maxpool(sum))."""
    rng = np.random.default_rng(7)
    T, Hq, Hkv, d = 33, 4, 4, 8
    seq_len = 30
    q = jnp.asarray(rng.standard_normal((T, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, Hkv, d)), jnp.float32)
    kw = dict(metric_window=24, use_l2=True, use_maxpool=True)
    _, m_one = att.prefill_attention(q, k, v, jnp.asarray(seq_len),
                                     d ** -0.5, metric_block=24, **kw)
    _, m_chunked = att.prefill_attention(q, k, v, jnp.asarray(seq_len),
                                         d ** -0.5, metric_block=8, **kw)
    np.testing.assert_allclose(np.asarray(m_chunked), np.asarray(m_one),
                               rtol=1e-4, atol=1e-5)


def test_prefill_use_average_window_is_dynamic():
    """avg-mode normalizes by min(metric_window, seq_len) - the DYNAMIC
    length, not the padded bucket T (pallas epilogue parity)."""
    rng = np.random.default_rng(8)
    T, Hq, Hkv, d = 32, 2, 2, 8
    seq_len = 10
    q = jnp.asarray(rng.standard_normal((T, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, Hkv, d)), jnp.float32)
    kw = dict(metric_window=32, metric_block=32, use_l2=True,
              use_maxpool=False)
    _, m_avg = att.prefill_attention(q, k, v, jnp.asarray(seq_len),
                                     d ** -0.5, use_average=True, **kw)
    _, m_raw = att.prefill_attention(q, k, v, jnp.asarray(seq_len),
                                     d ** -0.5, use_average=False, **kw)
    # rescale factor at key j is (j+1)/min(window, seq_len) = (j+1)/10
    j = np.arange(seq_len)
    np.testing.assert_allclose(
        np.asarray(m_avg)[:seq_len],
        np.asarray(m_raw)[:seq_len] * ((j + 1) / 10.0)[:, None],
        rtol=1e-4, atol=1e-6)
