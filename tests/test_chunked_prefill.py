"""Chunked prefill: prompts longer than the largest prefill bucket run as
sequential chunk programs over the same cache slot (beyond-parity: the
reference rejects chunked prefill with KVC, vllm/config.py).

Three levels:
- kernel: pallas continuation (q_offset > 0, Tk > Tq) vs the XLA oracle;
- oracle: chunk-wise XLA calls stitch to exactly the unchunked pass
  (outputs AND final metrics);
- engine: a chunked engine (small largest bucket) produces exactly the
  same greedy tokens as an unchunked engine (big bucket), with continual
  compression on - evictions depend on the metric rows, so equality here
  exercises the prefix metric write-back too.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                   KVCompressConfig, ModelConfig,
                                   ParallelConfig, SchedulerConfig)
from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.ops import attention as att
from kvcompress_tpu.ops.pallas import prefill_attention as ppf
from kvcompress_tpu.sampling_params import SamplingParams

VOCAB = 128


@pytest.mark.parametrize("P,Tq,chunk_len", [(128, 128, 128), (256, 128, 90)])
def test_cont_kernel_vs_xla(P, Tq, chunk_len):
    """Pallas continuation kernel (prefix + chunk) vs the XLA oracle."""
    rng = np.random.default_rng(P + chunk_len)
    Hq, Hkv, d = 4, 2, 128
    scale = d ** -0.5
    Tk = P + Tq
    q = jnp.asarray(rng.standard_normal((Tq, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((Tk, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((Tk, Hkv, d)), jnp.float32)
    kw = dict(metric_window=32, buffer_len=jnp.asarray(4), use_l2=True,
              use_average=False, use_maxpool=True)

    out_ref, m_ref = att.prefill_attention(
        q, k, v, jnp.asarray(chunk_len), scale, q_offset=P, **kw)
    out, m = ppf.prefill_attention(
        q, k, v, jnp.asarray(chunk_len), scale, q_offset=P,
        q_block=128, chunk=128, interpret=True, **kw)

    mask = np.arange(Tq)[:, None] < chunk_len
    np.testing.assert_allclose(
        np.asarray(out) * mask[..., None],
        np.asarray(out_ref) * mask[..., None], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=2e-5, atol=2e-5)


def test_chunked_oracle_stitches_to_unchunked():
    """Chunk-wise XLA passes reproduce the unchunked outputs and metrics."""
    rng = np.random.default_rng(0)
    P, B = 200, 128          # prompt 200, chunk at 128
    rem = P - B
    Hq, Hkv, d = 4, 2, 32
    scale = d ** -0.5
    q = jnp.asarray(rng.standard_normal((P, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((P, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((P, Hkv, d)), jnp.float32)
    kw = dict(metric_window=32, buffer_len=jnp.asarray(2), use_l2=True,
              use_average=False, use_maxpool=True)

    out_full, m_full = att.prefill_attention(
        q, k, v, jnp.asarray(P), scale, **kw)
    out_c1, _ = att.prefill_attention(
        q[:B], k[:B], v[:B], jnp.asarray(B), scale, **kw)
    out_c2, m_c2 = att.prefill_attention(
        q[B:], k, v, jnp.asarray(rem), scale, q_offset=B, **kw)

    np.testing.assert_allclose(np.asarray(out_c1), np.asarray(out_full[:B]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_c2), np.asarray(out_full[B:]),
                               rtol=2e-5, atol=2e-5)
    # the final chunk's metric pass covers the whole prompt
    np.testing.assert_allclose(np.asarray(m_c2), np.asarray(m_full),
                               rtol=2e-5, atol=2e-5)


def _cfg(buckets, max_model_len=1280) -> EngineConfig:
    model = ModelConfig(
        num_layers=2, num_heads=4, num_kv_heads=2, head_size=16,
        hidden_size=64, intermediate_size=128, vocab_size=VOCAB,
        max_model_len=max_model_len, rope_theta=10000.0)
    return EngineConfig(
        model=model,
        cache=CacheConfig(block_size=16, cache_dtype="float32"),
        kvcompress=KVCompressConfig(
            compression_interval=4,
            max_cache_moves_per_compression=1 << 15,
            max_kv_per_compression=1 << 18),
        scheduler=SchedulerConfig(
            max_num_seqs=2, max_model_len=max_model_len,
            prefill_buckets=buckets),
        parallel=ParallelConfig(),
    )


@pytest.fixture(scope="module")
def params():
    return init_llama_params(_cfg((1280,)).model, seed=0,
                             dtype=jnp.float32)


def _greedy(engine, prompt, n=8, **sp):
    rid = engine.add_request(
        None, prompt_token_ids=prompt,
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=n, ignore_eos=True, **sp))
    steps = 0
    outs = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            outs[out.request_id] = out
        steps += 1
        assert steps < 500
    return outs[rid].outputs[0].token_ids


@pytest.mark.parametrize("plen", [700, 530])
def test_engine_chunked_equals_unchunked(params, plen):
    # plen=700 -> chunks (0,512)+(512,188); plen=530 -> steal path:
    # (0,512)+(512,18) has a sub-window tail, so the split shifts to
    # (0,384)+(384,146)
    rng = np.random.default_rng(plen)
    prompt = rng.integers(0, VOCAB, size=plen).tolist()
    kw = dict(max_cache_tokens=128, protected_window_size=16,
              compress_once=False)

    big = LLMEngine(_cfg((1280,)), params, num_blocks=4096, attn_impl="xla")
    assert big._plan_prefill_chunks(plen) is None
    ref = _greedy(big, prompt, **kw)
    del big

    small = LLMEngine(_cfg((128, 512)), params, num_blocks=4096,
                      attn_impl="xla")
    chunks = small._plan_prefill_chunks(plen)
    assert chunks is not None and len(chunks) >= 2
    assert all(off % 128 == 0 for off, _ in chunks)
    window = small.cfg.kvcompress.prefill_metric_collection_window_size
    assert chunks[-1][1] >= window
    got = _greedy(small, prompt, **kw)

    assert got == ref


def test_engine_chunked_three_chunks(params):
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, VOCAB, size=1100).tolist()

    big = LLMEngine(_cfg((1280,)), params, num_blocks=4096, attn_impl="xla")
    ref = _greedy(big, prompt)
    del big

    small = LLMEngine(_cfg((512,)), params, num_blocks=4096,
                      attn_impl="xla")
    assert len(small._plan_prefill_chunks(1100)) == 3
    got = _greedy(small, prompt)
    assert got == ref
