"""Prefix caching: copy-on-hit pool (core/prefix_cache.py + the
harvest/adopt/release programs in engine/programs.py).

Reference parity target: vllm/core/block_manager_v2.py +
block/prefix_caching_block.py (--enable-prefix-caching for the vanilla,
non-KVC path; the reference's KVC manager cannot use it either). Contract
pinned here: a prompt sharing a cached prefix produces BIT-EXACT greedy
output while skipping the cached blocks' prefill compute; compressed
sequences never contribute; pooled blocks are released (never preempting
a running sequence) under memory pressure.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.core.prefix_cache import PrefixPool, chain_hashes
from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.sampling_params import SamplingParams
from tests.test_engine import VOCAB, tiny_cfg, run_all


# ------------------------------------------------------------------ unit
def test_chain_hashes_prefix_property():
    ids_a = list(range(40))
    ids_b = list(range(24)) + [99] * 16
    ca = chain_hashes(ids_a, 4, 10)
    cb = chain_hashes(ids_b, 4, 10)
    assert ca[:6] == cb[:6]          # identical first 24 tokens
    assert ca[6:] != cb[6:]          # divergence poisons every later hash
    assert len(set(ca)) == 10


def test_pool_lookup_longest_pow2_and_lru():
    pool = PrefixPool(block_size=4, layers_x_heads=4, max_pool_blocks=1000)
    ids = list(range(60))
    n = pool.wants(ids)
    assert n == 14  # (60-1)//4 full blocks
    pool.contribute(ids, blocks="dummy", n_blocks=n)
    assert pool.wants(ids) == 0  # dedup
    # same full prompt: longest pow2 prefix = 8 blocks (32 tokens),
    # capped below 14 to pow2
    entry, hit = pool.lookup(ids)
    assert hit == 8 and entry.blocks == "dummy"
    # shorter shared prefix
    entry, hit = pool.lookup(ids[:17] + [777] * 10)
    assert hit == 4  # 16 shared tokens = 4 blocks
    # no shared prefix
    assert pool.lookup([999] * 30) is None
    # budget: a second entry that would exceed max_pool_blocks is refused
    small = PrefixPool(block_size=4, layers_x_heads=4, max_pool_blocks=60)
    assert small.wants(ids) == 14  # 56 <= 60
    small.contribute(ids, "d", 14)
    assert small.wants([5] * 60) == 0  # 56 + x > 60
    # LRU pop empties the index
    e = small.pop_lru()
    assert e is not None and len(small) == 0 and small.pool_blocks == 0
    assert small.lookup(ids) is None


# ---------------------------------------------------------------- engine
def _pc_engine(params, num_blocks=512, **cache_kw):
    cfg = tiny_cfg()
    cfg.kvcompress.enabled = False
    cfg.cache.enable_prefix_caching = True
    for k, v in cache_kw.items():
        setattr(cfg.cache, k, v)
    return LLMEngine(cfg, params, num_blocks=num_blocks, attn_impl="xla")


@pytest.fixture(scope="module")
def params():
    return init_llama_params(tiny_cfg().model, seed=0, dtype=jnp.float32)


def _greedy(eng, prompt, max_tokens=8):
    rid = eng.add_request(None, prompt_token_ids=list(prompt),
                          sampling_params=SamplingParams(
                              temperature=0.0, max_tokens=max_tokens,
                              ignore_eos=True))
    return run_all(eng)[rid].outputs[0].token_ids


def test_hit_output_exactly_matches_cold(params):
    rng = np.random.default_rng(0)
    shared = rng.integers(0, VOCAB, size=33).tolist()
    tail_a, tail_b = [7, 8, 9], [11, 12, 13, 14]

    cold = LLMEngine(tiny_cfg(), params, num_blocks=512, attn_impl="xla")
    cold.cfg.kvcompress.enabled = False
    ref_a = _greedy(cold, shared + tail_a)
    ref_b = _greedy(cold, shared + tail_b)

    eng = _pc_engine(params)
    got_a = _greedy(eng, shared + tail_a)   # cold: contributes at finish
    assert eng.stats.counters.get("prefix_cache_contributions", 0) == 1
    got_b = _greedy(eng, shared + tail_b)   # hits the pooled prefix
    assert eng.stats.counters.get("prefix_cache_hits", 0) == 1
    # pow2 hit: 36-token prompt shares 33 -> 8 full blocks of 4
    assert eng.stats.counters.get("prefix_cache_hit_tokens", 0) == 32
    assert got_a == ref_a
    assert got_b == ref_b


def test_identical_prompt_reuses_all_but_last_block(params):
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, VOCAB, size=33).tolist()
    eng = _pc_engine(params)
    first = _greedy(eng, prompt)
    second = _greedy(eng, prompt)
    assert first == second
    assert eng.stats.counters.get("prefix_cache_hit_tokens", 0) == 32


def test_compressed_sequences_do_not_contribute(params):
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, VOCAB, size=33).tolist()
    cfg = tiny_cfg()
    cfg.cache.enable_prefix_caching = True
    eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
    rid = eng.add_request(None, prompt_token_ids=prompt,
                          sampling_params=SamplingParams(
                              temperature=0.0, max_tokens=8,
                              ignore_eos=True, max_cache_tokens=16,
                              protected_window_size=4))
    run_all(eng)
    assert eng.scheduler.total_evicted_kvs > 0
    assert eng.stats.counters.get("prefix_cache_contributions", 0) == 0
    assert len(eng.prefix_pool) == 0


def test_pool_released_under_pressure_before_preempting(params):
    """Fill the pool, then submit prompts that need the pooled blocks:
    the engine must evict pool entries (not preempt / not deadlock) and
    serve everything."""
    rng = np.random.default_rng(3)
    # sized so the burst FITS on its own (no legitimate preemption) but
    # not alongside the pooled prefixes; pool fraction 0.9 lets the pool
    # grow until real pressure hits
    eng = _pc_engine(params, num_blocks=176, prefix_pool_fraction=0.9)
    prompts = [rng.integers(0, VOCAB, size=25).tolist() for _ in range(4)]
    for p in prompts:
        _greedy(eng, p, max_tokens=4)
    assert len(eng.prefix_pool) >= 2  # pool holds several prefixes
    # now a burst of fresh prompts that cannot fit alongside the pool
    rids = [eng.add_request(None, prompt_token_ids=rng.integers(
                0, VOCAB, size=30).tolist(),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=4, ignore_eos=True))
            for _ in range(3)]
    outs = run_all(eng)
    assert all(len(outs[r].outputs[0].token_ids) == 4 for r in rids)
    assert eng.stats.counters.get("prefix_cache_evictions", 0) > 0
    assert eng.stats.counters.get("preemptions", 0) == 0


def test_hit_with_sampling_features_still_exact(params):
    """Seeded sampling + logprobs on a prefix-hit prompt must match the
    cold path (the continuation program carries the same sampling
    tensors)."""
    rng = np.random.default_rng(4)
    shared = rng.integers(0, VOCAB, size=33).tolist()
    sp = lambda: SamplingParams(  # noqa: E731
        temperature=0.8, seed=5, max_tokens=6, ignore_eos=True,
        logprobs=2)

    def run(eng, prompt):
        rid = eng.add_request(None, prompt_token_ids=list(prompt),
                              sampling_params=sp())
        out = run_all(eng)[rid].outputs[0]
        return out.token_ids, out.logprobs

    cold = LLMEngine(tiny_cfg(), params, num_blocks=512, attn_impl="xla")
    cold.cfg.kvcompress.enabled = False
    ref_ids, ref_lp = run(cold, shared + [3, 4])
    eng = _pc_engine(params)
    _ = run(eng, shared + [1, 2])          # seed the pool
    got_ids, got_lp = run(eng, shared + [3, 4])
    assert eng.stats.counters.get("prefix_cache_hits", 0) == 1
    assert got_ids == ref_ids
    assert got_lp is not None and len(got_lp) == len(ref_lp)
    for g, r in zip(got_lp, ref_lp):
        assert set(g) == set(r)
        for k in g:
            assert abs(g[k] - r[k]) < 2e-3
