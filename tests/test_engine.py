"""End-to-end engine tests on a tiny random Llama (CPU).

Covers the behaviours of the reference's engine/scheduler tests plus the
compression-correctness invariants of tests/kvcompress/test_random_digit_repeat.py
that don't need trained weights: exact no-compression parity against HF
greedy decoding, no-op-compression parity, block accounting under
compression, continuous batching, and preemption recovery.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.config import (CacheConfig, EngineConfig, KVCompressConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.sampling_params import SamplingParams

VOCAB = 128


def tiny_cfg(max_num_seqs=4, max_model_len=64, block_size=4,
             compression_interval=4, **kvc_kw) -> EngineConfig:
    model = ModelConfig(
        num_layers=2, num_heads=4, num_kv_heads=2, head_size=16,
        hidden_size=64, intermediate_size=128, vocab_size=VOCAB,
        max_model_len=max_model_len, rope_theta=10000.0)
    return EngineConfig(
        model=model,
        cache=CacheConfig(block_size=block_size, cache_dtype="float32"),
        kvcompress=KVCompressConfig(
            compression_interval=compression_interval,
            max_cache_moves_per_compression=4096,
            max_kv_per_compression=65536, **kvc_kw),
        scheduler=SchedulerConfig(
            max_num_seqs=max_num_seqs, max_model_len=max_model_len,
            prefill_buckets=(16, 32, 64)),
        parallel=ParallelConfig(),
    )


@pytest.fixture(scope="module")
def tiny_params():
    cfg = tiny_cfg()
    return init_llama_params(cfg.model, seed=0, dtype=jnp.float32)


def make_engine(params, num_blocks=512, **cfg_kw) -> LLMEngine:
    cfg = tiny_cfg(**cfg_kw)
    return LLMEngine(cfg, params, num_blocks=num_blocks, attn_impl="xla")


def run_all(engine):
    outs = {}
    steps = 0
    while engine.has_unfinished_requests():
        for out in engine.step():
            outs[out.request_id] = out
        steps += 1
        assert steps < 2000, "engine did not converge"
    return outs


def greedy_tokens(engine, prompt, max_tokens, **sp_kw):
    rid = engine.add_request(
        None, prompt_token_ids=prompt,
        sampling_params=SamplingParams(temperature=0.0,
                                       max_tokens=max_tokens,
                                       ignore_eos=True, **sp_kw))
    return run_all(engine)[rid].outputs[0].token_ids


def test_engine_matches_hf_greedy(tiny_params):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    # mirror the jax params into an HF model for the oracle
    cfg = tiny_cfg()
    hf_cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    p = tiny_params
    sd = {}
    sd["model.embed_tokens.weight"] = np.asarray(p["embed"], np.float32)
    sd["model.norm.weight"] = np.asarray(p["final_norm"], np.float32)
    sd["lm_head.weight"] = np.asarray(p["lm_head"], np.float32)
    lw = p["layers"]
    for i in range(2):
        pre = f"model.layers.{i}."
        sd[pre + "input_layernorm.weight"] = np.asarray(lw["input_norm"][i])
        sd[pre + "post_attention_layernorm.weight"] = np.asarray(
            lw["post_attn_norm"][i])
        for ours, theirs in [("wq", "self_attn.q_proj"),
                             ("wk", "self_attn.k_proj"),
                             ("wv", "self_attn.v_proj"),
                             ("wo", "self_attn.o_proj"),
                             ("w_gate", "mlp.gate_proj"),
                             ("w_up", "mlp.up_proj"),
                             ("w_down", "mlp.down_proj")]:
            sd[pre + theirs + ".weight"] = np.asarray(lw[ours][i]).T
    hf.load_state_dict({k: torch.tensor(v.copy()) for k, v in sd.items()})

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, VOCAB, size=13).tolist()
    want = hf.generate(
        torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
        pad_token_id=0)[0, len(prompt):].tolist()

    engine = make_engine(tiny_params)
    got = greedy_tokens(engine, prompt, 6)
    assert got == want


def test_noop_compression_parity(tiny_params):
    """Compression with protected window >= sequence length must not change
    greedy outputs (nothing is evictable)."""
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, VOCAB, size=21).tolist()

    e1 = make_engine(tiny_params)
    e1.cfg.kvcompress.enabled = False
    base = greedy_tokens(e1, prompt, 8)

    e2 = make_engine(tiny_params, compression_interval=2)
    got = greedy_tokens(e2, prompt, 8, target_compression_rate=0.5,
                        protected_window_size=64,
                        metric_collection_buffer_size=0)
    assert got == base


def test_compression_frees_blocks(tiny_params):
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, VOCAB, size=32).tolist()
    engine = make_engine(tiny_params, compression_interval=2)
    rid = engine.add_request(
        None, prompt_token_ids=prompt,
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=10, ignore_eos=True,
            max_cache_tokens=8, protected_window_size=4, compress_once=True))
    free0 = engine.scheduler.free_blocks
    outs = run_all(engine)
    assert len(outs[rid].outputs[0].token_ids) == 10
    st = engine.stats.snapshot()["counters"]
    assert st.get("compression_rounds", 0) >= 1
    assert st.get("evicted_kvs", 0) > 0
    # all blocks returned after the request finished
    assert engine.scheduler.free_blocks == free0
    assert int(engine.state.free_top.sum()) == free0


def test_continual_compression_rate(tiny_params):
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, VOCAB, size=24).tolist()
    engine = make_engine(tiny_params, compression_interval=3)
    rid = engine.add_request(
        None, prompt_token_ids=prompt,
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=16, ignore_eos=True,
            target_compression_rate=0.5, protected_window_size=4,
            compress_once=False))
    outs = run_all(engine)
    assert len(outs[rid].outputs[0].token_ids) == 16
    assert engine.scheduler.total_evicted_kvs > 0
    assert int(engine.state.free_top.sum()) == engine.scheduler.free_blocks


def test_continuous_batching(tiny_params):
    rng = np.random.default_rng(4)
    engine = make_engine(tiny_params, max_num_seqs=3)
    rids = []
    for i in range(5):
        prompt = rng.integers(0, VOCAB, size=int(rng.integers(5, 20))).tolist()
        rids.append(engine.add_request(
            None, prompt_token_ids=prompt,
            sampling_params=SamplingParams(temperature=0.0,
                                           max_tokens=4 + i,
                                           ignore_eos=True)))
    outs = run_all(engine)
    assert set(outs) == set(rids)
    for i, rid in enumerate(rids):
        assert len(outs[rid].outputs[0].token_ids) == 4 + i
    # cache fully drained
    assert int(engine.state.free_top.sum()) == engine.scheduler.free_blocks
    assert np.asarray(engine.state.context_lens).sum() == 0


def test_preemption_recovery(tiny_params):
    """With a cache too small for both sequences, the engine must preempt by
    recompute and still finish everything."""
    rng = np.random.default_rng(5)
    # each seq of len 16 needs L*H*4 = 16 blocks; give room for ~1.5 seqs
    engine = make_engine(tiny_params, num_blocks=45, max_num_seqs=2)
    engine.cfg.kvcompress.enabled = False
    rids = [
        engine.add_request(
            None,
            prompt_token_ids=rng.integers(0, VOCAB, size=14).tolist(),
            sampling_params=SamplingParams(temperature=0.0, max_tokens=6,
                                           ignore_eos=True))
        for _ in range(2)
    ]
    outs = run_all(engine)
    assert set(outs) == set(rids)
    for rid in rids:
        assert len(outs[rid].outputs[0].token_ids) == 6


def test_multi_step_decode_parity(tiny_params):
    """k-step device decode must produce exactly the same greedy tokens and
    respect max_tokens / EOS on device."""
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, VOCAB, size=15).tolist()

    e1 = make_engine(tiny_params)
    base = greedy_tokens(e1, prompt, 11)

    e2 = make_engine(tiny_params)
    e2.multi_step = 4
    got = greedy_tokens(e2, prompt, 11)  # 11 not divisible by 4
    assert got == base
    assert int(e2.state.free_top.sum()) == e2.scheduler.free_blocks

    # EOS termination on device: pick the model's 3rd greedy token as "eos"
    eos = base[2]
    e3 = make_engine(tiny_params)
    e3.multi_step = 4
    e3.eos_token_ids = {eos}
    rid = e3.add_request(None, prompt_token_ids=prompt,
                         sampling_params=SamplingParams(
                             temperature=0.0, max_tokens=11))
    out = run_all(e3)[rid].outputs[0]
    expect = base[:base.index(eos) + 1]  # stop at FIRST eos occurrence
    assert out.token_ids == expect
    assert out.finish_reason == "stop"


def test_multi_step_with_compression(tiny_params):
    rng = np.random.default_rng(8)
    prompt = rng.integers(0, VOCAB, size=24).tolist()
    e1 = make_engine(tiny_params, compression_interval=4)
    base = greedy_tokens(e1, prompt, 12, target_compression_rate=0.5,
                         protected_window_size=64)

    e2 = make_engine(tiny_params, compression_interval=4)
    e2.multi_step = 4
    got = greedy_tokens(e2, prompt, 12, target_compression_rate=0.5,
                        protected_window_size=64)
    assert got == base


def test_sampling_temperature(tiny_params):
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, VOCAB, size=8).tolist()
    engine = make_engine(tiny_params)
    rid = engine.add_request(
        None, prompt_token_ids=prompt,
        sampling_params=SamplingParams(temperature=1.0, top_k=20,
                                       max_tokens=8, ignore_eos=True))
    outs = run_all(engine)
    assert len(outs[rid].outputs[0].token_ids) == 8


def test_fused_pallas_path_matches_xla(tiny_params):
    """The fused decode path (pallas kernel in interpret mode on CPU: in-
    kernel KV writes, burst-dense metric accumulation) must produce the same
    tokens AND the same metric state as the XLA path."""
    rng = np.random.default_rng(9)
    prompt = rng.integers(0, VOCAB, size=22).tolist()

    outs = {}
    metrics = {}
    for impl in ["xla", "interpret"]:
        cfg = tiny_cfg(compression_interval=3)
        eng = LLMEngine(cfg, tiny_params, num_blocks=512, attn_impl=impl)
        eng.multi_step = 4
        rid = eng.add_request(
            None, prompt_token_ids=prompt,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=12, ignore_eos=True,
                target_compression_rate=0.5, protected_window_size=8,
                metric_collection_buffer_size=2))
        outs[impl] = run_all(eng)[rid].outputs[0].token_ids
        metrics[impl] = np.asarray(eng.state.kv_metrics)
    assert outs["interpret"] == outs["xla"]


def test_fused_metrics_match_xla_state(tiny_params):
    """Run a fixed number of decode steps (no finish) under both impls and
    compare the full metric tensors - validates in-kernel metric emission +
    burst scatter against the XLA oracle."""
    rng = np.random.default_rng(10)
    prompt = rng.integers(0, VOCAB, size=13).tolist()
    states = {}
    for impl in ["xla", "interpret"]:
        cfg = tiny_cfg()
        cfg.kvcompress.enabled = False
        eng = LLMEngine(cfg, tiny_params, num_blocks=512, attn_impl=impl)
        eng.multi_step = 3
        eng.add_request(None, prompt_token_ids=prompt,
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=6, ignore_eos=True))
        while eng.has_unfinished_requests():
            eng.step()
        states[impl] = (np.asarray(eng.state.kv_metrics),
                        np.asarray(eng.state.kv_positions),
                        np.asarray(eng.state.k_cache))
    m_x, p_x, k_x = states["xla"]
    m_p, p_p, k_p = states["interpret"]
    np.testing.assert_array_equal(p_p[1:], p_x[1:])
    # the flash prefill's online softmax reorders reductions, so hidden
    # states (and the K projections derived from them) drift at f32 eps
    np.testing.assert_allclose(k_p[1:], k_x[1:], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(m_p[1:], m_x[1:], rtol=1e-4, atol=1e-5)
