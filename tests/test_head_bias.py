"""KV head-bias: loading, position binning, and effect on eviction.

The reference applies a per-(layer, head, position-bin) bias to metrics
before the eviction sort (vllm/kvcompress/metrics.py:44-81
KVHeadBias.get_bias_for_position; applied in schedule_evictions :510-544)
and tests compression WITH bias end-to-end
(tests/kvcompress/test_random_digit_repeat.py:239-284). These tests pin the
same contract: bias must actually redirect evictions, file formats round-trip,
and the engine-level kv_head_bias_file config changes compression behavior.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.kvcompress import eviction as ev
from kvcompress_tpu.kvcompress.head_bias import KVHeadBias, load_kv_head_bias


def test_load_npz_roundtrip(tmp_path):
    bias = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    bins = np.array([0, 100, 1000, 10000], dtype=np.int32)
    path = tmp_path / "bias.npz"
    np.savez(path, bias=bias, pos_bins=bins)
    hb = load_kv_head_bias(str(path))
    np.testing.assert_array_equal(np.asarray(hb.bias), bias)
    np.testing.assert_array_equal(np.asarray(hb.position_bins), bins)


def test_apply_head_bias_position_binning():
    """Each KV picks the bias of the last bin whose start is <= position;
    empty slots (position -1) get zero bias
    (reference metrics.py:54-81: searchsorted over bin starts)."""
    B, L, H, n = 1, 1, 2, 8
    metrics = np.zeros((B, L, H, n), np.float32)
    positions = np.array([-1, 0, 5, 99, 100, 150, 1000, 2500],
                         np.int32).reshape(1, 1, 1, n)
    positions = np.broadcast_to(positions, (B, L, H, n))
    bins = jnp.asarray([0, 100, 1000], jnp.int32)
    bias = jnp.asarray(
        np.stack([
            np.tile(np.array([1.0, 2.0, 3.0], np.float32), (1, 1)),
            np.tile(np.array([10.0, 20.0, 30.0], np.float32), (1, 1)),
        ], axis=1).reshape(L, H, 3))
    out = ev.apply_head_bias(
        jnp.asarray(metrics), jnp.asarray(positions), bias, bins, weight=1.0)
    out = np.asarray(out)
    # head 0: bins -> [skip, 1, 1, 1, 2, 2, 3, 3]
    np.testing.assert_allclose(out[0, 0, 0],
                               [0.0, 1, 1, 1, 2, 2, 3, 3])
    np.testing.assert_allclose(out[0, 0, 1],
                               [0.0, 10, 10, 10, 20, 20, 30, 30])
    # weight scales the bias
    out2 = np.asarray(ev.apply_head_bias(
        jnp.asarray(metrics), jnp.asarray(positions), bias, bins,
        weight=0.5))
    np.testing.assert_allclose(out2[0, 0, 1],
                               [0.0, 5, 5, 5, 10, 10, 15, 15])


def test_bias_redirects_evictions():
    """With uniform metrics, a strongly negative bias on one head must pull
    the whole eviction budget onto that head."""
    B, L, H, nb, bs = 1, 2, 4, 4, 4
    n = nb * bs
    rng = np.random.default_rng(0)
    metrics = rng.uniform(1.0, 2.0, size=(B, L, H, n)).astype(np.float32)
    positions = np.broadcast_to(
        np.arange(n, dtype=np.int32), (B, L, H, n)).copy()
    ctx = np.full((B, L, H), n, np.int32)
    last_pos = np.array([n - 1], np.int32)
    protected = np.array([0], np.int32)
    budget = np.array([4], np.int32)  # evict 4 blocks

    def run(bias_val):
        bias = np.zeros((L, H, 1), np.float32)
        bias[:, 2, 0] = bias_val  # head 2 biased
        m = ev.apply_head_bias(
            jnp.asarray(metrics), jnp.asarray(positions),
            jnp.asarray(bias), jnp.asarray([0], jnp.int32), weight=1.0)
        sched = ev.schedule_evictions(
            m, jnp.asarray(positions), jnp.asarray(ctx),
            jnp.asarray(last_pos), jnp.asarray(protected),
            jnp.asarray(budget), bs)
        return np.asarray(sched.evicted_block_count)

    base = run(0.0)
    pulled = run(-100.0)   # lower metric = evicted first
    pushed = run(+100.0)   # raised metric = protected

    assert base.sum() == 4 and pulled.sum() == 4 and pushed.sum() == 4
    # negative bias concentrates every evicted block on head 2
    assert pulled[0, :, 2].sum() == 4, pulled
    # positive bias keeps head 2 untouched
    assert pushed[0, :, 2].sum() == 0, pushed
    # and the unbiased run is NOT already concentrated (the test would be
    # vacuous otherwise)
    assert base[0, :, 2].sum() < 4, base


def test_engine_kv_head_bias_file_changes_compression(tmp_path):
    """End-to-end: the same workload with/without kv_head_bias_file must
    produce different per-head context lengths, with the biased head
    compressed hardest (reference test_random_digit_repeat.py:239-284)."""
    from tests.test_engine import make_engine, run_all, tiny_params  # noqa
    from kvcompress_tpu.models.llama import init_llama_params
    from kvcompress_tpu.sampling_params import SamplingParams
    from tests.test_engine import tiny_cfg

    params = init_llama_params(tiny_cfg().model, seed=0, dtype=jnp.float32)
    L, H = 2, 2
    bias = np.zeros((L, H, 1), np.float32)
    bias[:, 1, 0] = -1e6  # force head 1 to evict first everywhere
    path = tmp_path / "bias.npz"
    np.savez(path, bias=bias, pos_bins=np.array([0], np.int32))

    def head_ctx(bias_file):
        eng = make_engine(params, kv_head_bias_file=bias_file,
                          compression_interval=2)
        prompt = list(np.random.default_rng(0).integers(1, 100, size=40))
        eng.add_request("r", prompt_token_ids=prompt,
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=40, ignore_eos=True,
                            max_cache_tokens=16, protected_window_size=4,
                            compress_once=False))
        for _ in range(12):  # enough steps for several compression rounds
            eng.step()
        assert eng.has_unfinished_requests()
        eng._flush_pending()  # drain the in-flight burst before reading state
        # slot 0 holds the only sequence
        return np.asarray(eng.state.context_lens)[:, 0, :]  # [L, H]

    ctx_plain = head_ctx(None)
    ctx_bias = head_ctx(str(path))
    assert not np.array_equal(ctx_plain, ctx_bias), (
        "bias file had no effect on compression")
    # the biased head holds fewer KVs than its sibling in every layer
    assert (ctx_bias[:, 1] <= ctx_bias[:, 0]).all(), ctx_bias
    assert (ctx_bias[:, 1] < ctx_bias[:, 0]).any(), ctx_bias
