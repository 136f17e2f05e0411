"""Block-accounting sanitizer (utils/invariants.py): clean serving passes
the checker, and seeded corruption of each invariant is CAUGHT (the
race-detection posture of the reference's kernel-test sanitizer harness,
kernel-test/run.sh, re-targeted at this runtime's failure modes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.sampling_params import SamplingParams
from kvcompress_tpu.utils.invariants import (assert_block_invariants,
                                             check_block_invariants)
from tests.test_engine import VOCAB, tiny_cfg, run_all


@pytest.fixture(scope="module")
def params():
    return init_llama_params(tiny_cfg().model, seed=0, dtype=jnp.float32)


def _serve(eng, n=3, compress=True, max_tokens=8):
    rng = np.random.default_rng(0)
    for i in range(n):
        kw = dict(max_cache_tokens=16, protected_window_size=4) \
            if compress else {}
        eng.add_request(None,
                        prompt_token_ids=rng.integers(
                            0, VOCAB, size=25).tolist(),
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=max_tokens,
                            ignore_eos=True, **kw))
    return run_all(eng)


def test_clean_after_serving_with_compression(params):
    eng = LLMEngine(tiny_cfg(), params, num_blocks=256, attn_impl="xla")
    _serve(eng)
    assert eng.scheduler.total_evicted_kvs > 0
    assert check_block_invariants(eng.state) == []


def test_clean_with_prefix_pool(params):
    cfg = tiny_cfg()
    cfg.kvcompress.enabled = False
    cfg.cache.enable_prefix_caching = True
    eng = LLMEngine(cfg, params, num_blocks=256, attn_impl="xla")
    _serve(eng, compress=False)
    assert len(eng.prefix_pool) > 0
    assert check_block_invariants(eng.state, eng.prefix_pool) == []


def test_checker_runs_every_step_under_env(params, monkeypatch):
    monkeypatch.setenv("KVC_CHECK_INVARIANTS", "1")
    eng = LLMEngine(tiny_cfg(), params, num_blocks=256, attn_impl="xla")
    assert eng._check_invariants
    _serve(eng, n=2)  # any violation would raise inside step()


def test_catches_aliasing_and_use_after_free(params):
    eng = LLMEngine(tiny_cfg(), params, num_blocks=256, attn_impl="xla")
    _serve(eng, n=1, compress=False, max_tokens=4)
    # park one live sequence so tables are non-trivial
    rng = np.random.default_rng(1)
    eng.add_request("live", prompt_token_ids=rng.integers(
        0, VOCAB, size=25).tolist(),
        sampling_params=SamplingParams(temperature=0.0, max_tokens=64,
                                       ignore_eos=True))
    for _ in range(4):
        eng.step()
    state = eng.state
    bt = np.asarray(state.block_tables)
    ctx = np.asarray(state.context_lens)
    # find two live table entries and alias one onto the other
    l, s, h = np.argwhere(ctx > 4)[0]
    assert check_block_invariants(state) == []
    bt2 = bt.copy()
    bt2[l, s, h, 1] = bt2[l, s, h, 0]  # I1 aliasing
    bad = state.__class__(**{**{f: getattr(state, f) for f in (
        "k_cache", "v_cache", "kv_metrics", "kv_positions",
        "context_lens", "free_stack", "free_top", "k_scale", "v_scale")},
        "block_tables": jnp.asarray(bt2)})
    errs = check_block_invariants(bad)
    assert any("I1" in e for e in errs), errs

    # use-after-free: push a LIVE block onto its partition's free stack
    stack = np.asarray(state.free_stack).copy()
    top = np.asarray(state.free_top).copy()
    live_id = int(bt[l, s, h, 0])
    g = live_id // stack.shape[1]
    stack[g, top[g]] = live_id
    top[g] += 1
    bad2 = state.__class__(**{**{f: getattr(state, f) for f in (
        "k_cache", "v_cache", "kv_metrics", "kv_positions",
        "block_tables", "context_lens", "k_scale", "v_scale")},
        "free_stack": jnp.asarray(stack), "free_top": jnp.asarray(top)})
    errs = check_block_invariants(bad2)
    assert any("I2" in e for e in errs), errs
    with pytest.raises(AssertionError, match="invariants violated"):
        assert_block_invariants(bad2)


def test_catches_leak_and_shard_violation(params):
    cfg = tiny_cfg()
    cfg.parallel.tensor_parallel_size = 2  # 2 partitions
    eng = LLMEngine(cfg, params, num_blocks=256, attn_impl="xla")
    _serve(eng, n=1, compress=False, max_tokens=4)
    state = eng.state
    assert check_block_invariants(state) == []
    # leak: drop one free id
    top = np.asarray(state.free_top).copy()
    top[0] -= 1
    bad = state.__class__(**{**{f: getattr(state, f) for f in (
        "k_cache", "v_cache", "kv_metrics", "kv_positions",
        "block_tables", "context_lens", "free_stack", "k_scale",
        "v_scale")}, "free_top": jnp.asarray(top)})
    errs = check_block_invariants(bad)
    assert any("I4 conservation" in e and "leak" in e for e in errs), errs
