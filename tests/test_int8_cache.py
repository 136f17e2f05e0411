"""Int8 quantized KV cache (per-KV scales; the reference's
--kv-cache-dtype fp8 counterpart, csrc/cache_kernels.cu convert_fp8).

Covers: write/read roundtrip error bound, pallas tail kernel (interpret)
vs the XLA int8 oracle, compaction carrying scales, and end-to-end engine
greedy agreement between int8 and f32 caches WITH compression.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvcompress_tpu.core.state import init_cache_state, stack_pop
from kvcompress_tpu.ops import attention as att
from kvcompress_tpu.ops.kv_quant import dequantize_kv, quantize_kv
from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.sampling_params import SamplingParams
from tests.test_engine import VOCAB, tiny_cfg, run_all


def test_quantize_roundtrip(rng):
    x = rng.standard_normal((8, 4, 64)).astype(np.float32) * 3.0
    q, s = quantize_kv(jnp.asarray(x))
    back = np.asarray(dequantize_kv(q, s))
    err = np.abs(back - x).max(axis=-1) / np.abs(x).max(axis=-1)
    assert err.max() < 1 / 127 + 1e-6


def test_write_read_paged_attention_int8_close_to_f32(rng):
    S, Hq, Hkv, d, bs, nb = 2, 4, 2, 32, 4, 4
    num_blocks = 64
    state = init_cache_state(num_blocks, bs, d, 1, S, Hkv, nb,
                             cache_dtype=jnp.float32)
    qstate = init_cache_state(num_blocks, bs, d, 1, S, Hkv, nb,
                              cache_dtype=jnp.int8)
    need = jnp.ones((1, S, Hkv, nb), bool)
    ids, _ = stack_pop(state.free_stack, state.free_top, need, head_axis=2)
    bt = np.asarray(ids)[0]                      # [S, Hkv, nb]
    ctx = np.asarray([[9, 13], [5, 16]], np.int32)

    # write each context position through write_to_cache (both dtypes)
    f = dict(k=state.k_cache, v=state.v_cache, m=state.kv_metrics,
             p=state.kv_positions)
    qd = dict(k=qstate.k_cache, v=qstate.v_cache, m=qstate.kv_metrics,
              p=qstate.kv_positions, ks=qstate.k_scale, vs=qstate.v_scale)
    for t in range(int(ctx.max())):
        key = rng.standard_normal((1, Hkv, d)).astype(np.float32)
        val = rng.standard_normal((1, Hkv, d)).astype(np.float32)
        for s_ in range(S):
            sm = np.full((1, Hkv), -1, np.int32)
            for h in range(Hkv):
                if t < ctx[s_, h]:
                    sm[0, h] = bt[s_, h, t // bs] * bs + t % bs
            pos = np.asarray([t], np.int32)
            f["k"], f["v"], f["m"], f["p"] = att.write_to_cache(
                f["k"], f["v"], f["m"], f["p"], jnp.asarray(key),
                jnp.asarray(val), jnp.asarray(sm), jnp.asarray(pos))
            (qd["k"], qd["v"], qd["m"], qd["p"], qd["ks"],
             qd["vs"]) = att.write_to_cache(
                qd["k"], qd["v"], qd["m"], qd["p"], jnp.asarray(key),
                jnp.asarray(val), jnp.asarray(sm), jnp.asarray(pos),
                k_scale=qd["ks"], v_scale=qd["vs"])

    q = rng.standard_normal((S, Hq, d)).astype(np.float32)
    out_f, _ = att.paged_decode_attention(
        jnp.asarray(q), f["k"], f["v"], f["m"], f["p"], jnp.asarray(bt),
        jnp.asarray(ctx), jnp.asarray(ctx.max(axis=1)),
        jnp.zeros((S,), jnp.int32), d ** -0.5)
    out_q, _ = att.paged_decode_attention(
        jnp.asarray(q), qd["k"], qd["v"], qd["m"], qd["p"], jnp.asarray(bt),
        jnp.asarray(ctx), jnp.asarray(ctx.max(axis=1)),
        jnp.zeros((S,), jnp.int32), d ** -0.5,
        k_scale=qd["ks"], v_scale=qd["vs"])
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_f),
                               rtol=0.05, atol=0.05)


def test_tail_kernel_int8_matches_xla_oracle(rng):
    from kvcompress_tpu.ops.pallas import paged_attention as ppa

    S, Hq, Hkv, d = 2, 4, 2, 128
    bs, nb, KT = 4, 4, 4
    num_blocks = 64
    state = init_cache_state(num_blocks, bs, d, 1, S, Hkv, nb,
                             cache_dtype=jnp.int8)
    need = jnp.ones((1, S, Hkv, nb), bool)
    ids, _ = stack_pop(state.free_stack, state.free_top, need, head_axis=2)
    bt = np.asarray(ids)[0]

    k8 = rng.integers(-127, 128, (num_blocks, bs, d)).astype(np.int8)
    v8 = rng.integers(-127, 128, (num_blocks, bs, d)).astype(np.int8)
    ks = rng.random((num_blocks, bs)).astype(np.float32) * 0.02 + 0.001
    vs = rng.random((num_blocks, bs)).astype(np.float32) * 0.02 + 0.001
    q = rng.standard_normal((S, Hq, d)).astype(np.float32)
    tk = rng.standard_normal((S, Hkv, KT, d)).astype(np.float32)
    tv = rng.standard_normal((S, Hkv, KT, d)).astype(np.float32)
    tlen = np.asarray([2, 1], np.int32)
    ctx = np.asarray([[9, 13], [5, 16]], np.int32)

    out, mc, mt = ppa.paged_decode_attention_tail(
        jnp.asarray(q), jnp.asarray(tk), jnp.asarray(tv),
        jnp.asarray(tlen), jnp.asarray(k8), jnp.asarray(v8),
        jnp.asarray(bt), jnp.asarray(ctx), d ** -0.5,
        use_l2=True, record_metrics=True, interpret=True,
        k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs))

    # XLA oracle: dequantize the cached part densely, run the same math
    kd = np.asarray(dequantize_kv(jnp.asarray(k8), jnp.asarray(ks)))
    vd = np.asarray(dequantize_kv(jnp.asarray(v8), jnp.asarray(vs)))
    qpk = Hq // Hkv
    for s_ in range(S):
        for h in range(Hkv):
            cached = max(int(ctx[s_, h]) - int(tlen[s_]), 0)
            phys = [bt[s_, h, i // bs] * bs + i % bs for i in range(cached)]
            krows = kd.reshape(-1, d)[phys] if phys else np.zeros((0, d))
            vrows = vd.reshape(-1, d)[phys] if phys else np.zeros((0, d))
            krows = np.concatenate([krows, tk[s_, h, :tlen[s_]]], axis=0)
            vrows = np.concatenate([vrows, tv[s_, h, :tlen[s_]]], axis=0)
            for qi in range(qpk):
                qq = q[s_, h * qpk + qi]
                lg = krows @ qq * d ** -0.5
                p = np.exp(lg - lg.max())
                p = p / p.sum()
                ref = p @ vrows
                got = np.asarray(out[s_, h * qpk + qi])
                np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_engine_int8_cache_with_compression(tiny_params=None):
    cfg_f = tiny_cfg()
    cfg_q = tiny_cfg()
    cfg_q.cache.cache_dtype = "int8"
    params = init_llama_params(cfg_f.model, seed=0, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, VOCAB, size=n).tolist() for n in (24, 17)]

    def run(cfg):
        eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla")
        rids = []
        for p in prompts:
            rids.append(eng.add_request(
                None, prompt_token_ids=p,
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=12, ignore_eos=True,
                    max_cache_tokens=16, protected_window_size=4)))
        outs = run_all(eng)
        assert eng.scheduler.total_evicted_kvs > 0
        return [outs[r].outputs[0].token_ids for r in rids]

    ref = run(cfg_f)
    got = run(cfg_q)
    # int8 error (~0.8%) may flip late tokens on a random model; require
    # strong prefix agreement
    agree = np.mean([np.mean([a == b for a, b in zip(x, y)])
                     for x, y in zip(got, ref)])
    assert agree >= 0.75, (got, ref)


def test_engine_int8_cache_interpret_tail():
    """The production tail-kernel path (interpret mode) runs the int8
    cache end to end: same program structure the TPU uses."""
    cfg = tiny_cfg()
    cfg.cache.cache_dtype = "int8"
    params = init_llama_params(cfg.model, seed=0, dtype=jnp.float32)
    eng = LLMEngine(cfg, params, num_blocks=512, attn_impl="interpret")
    eng.multi_step = 4  # force the burst/tail path
    rng = np.random.default_rng(4)
    rid = eng.add_request(
        None, prompt_token_ids=rng.integers(0, VOCAB, size=20).tolist(),
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=8, ignore_eos=True,
            max_cache_tokens=16, protected_window_size=4))
    outs = run_all(eng)
    assert len(outs[rid].outputs[0].token_ids) == 8
    assert eng.scheduler.total_evicted_kvs > 0
