"""Weight-only int8 quantization: engine runs end-to-end quantized and the
model output stays close to full precision (reference quantization stack,
tpu_int8 method)."""

import numpy as np
import jax.numpy as jnp

from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.quantization import quantize_params
from kvcompress_tpu.sampling_params import SamplingParams
from tests.test_engine import VOCAB, tiny_cfg, run_all


def test_quantized_engine_outputs_close():
    cfg = tiny_cfg()
    params = init_llama_params(cfg.model, seed=0, dtype=jnp.float32)
    qparams = quantize_params(params)
    # quantized leaves replace the originals
    assert "wq_q8" in qparams["layers"] and "wq" not in qparams["layers"]
    assert qparams["layers"]["wq_q8"].dtype == jnp.int8
    assert "embed_q8" in qparams

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, VOCAB, size=9).tolist()

    outs = {}
    for name, p in (("fp", params), ("int8", qparams)):
        eng = LLMEngine(tiny_cfg(), p, num_blocks=512, attn_impl="xla")
        rid = eng.add_request(None, prompt_token_ids=prompt,
                              sampling_params=SamplingParams(
                                  temperature=0.0, max_tokens=6,
                                  ignore_eos=True))
        outs[name] = run_all(eng)[rid].outputs[0].token_ids
    # random tiny models have near-uniform logits, so exact token equality
    # is not guaranteed; require a majority match as the closeness signal
    matches = sum(a == b for a, b in zip(outs["fp"], outs["int8"]))
    assert matches >= 4, outs


def test_quantized_prefill_logits_close():
    from kvcompress_tpu.models import decoder as D
    from tests.test_llama_parity import (build_cache_and_tables,
                                         make_prefill_slot_map)

    cfg = tiny_cfg().model
    params = init_llama_params(cfg, seed=0, dtype=jnp.float32)
    qparams = quantize_params(params)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, VOCAB, size=11).tolist()
    T_pad = 16

    logits = {}
    for name, p in (("fp", params), ("int8", qparams)):
        cache, bt, bs = build_cache_and_tables(cfg, 16)
        sm = make_prefill_slot_map(bt[:, 0], len(prompt), T_pad, bs)
        tokens = np.zeros(T_pad, np.int32)
        tokens[:len(prompt)] = prompt
        hidden, _ = D.prefill(p, cfg, jnp.asarray(tokens),
                              jnp.asarray(len(prompt)), jnp.asarray(sm),
                              cache, jnp.asarray(0),
                              D.AttentionSpec(mode="prefill"))
        logits[name] = np.asarray(D.compute_logits(p, cfg, hidden))
    a, b = logits["fp"], logits["int8"]
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99, cos


# ---------------------------------------------------------------------------
# FP8 (e4m3) weight path (reference fp8 quantization, the 70B flagship
# bench format - benchmarks/scripts/benchmark_llama3_70b.sh)
# ---------------------------------------------------------------------------

def test_fp8_roundtrip_error_small():
    from kvcompress_tpu.quantization import fp8
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
    q, s = fp8._quantize(w, axis=-2)
    assert q.dtype == jnp.float8_e4m3fn
    back = np.asarray(q.astype(jnp.float32) * s)
    rel = np.linalg.norm(back - np.asarray(w)) / np.linalg.norm(np.asarray(w))
    assert rel < 0.04, rel  # e4m3 has 3 mantissa bits: ~2-4% RMS


def test_fp8_engine_exact_on_trained_model():
    """fp8 weight noise (~3% RMS) legitimately flips argmax on a RANDOM
    tiny model whose logits are near-uniform, so the engine contract is
    pinned on the trained filler-copier (peaked logits): the fp8-quantized
    engine must still produce exact greedy copies."""
    import os

    import pytest

    from kvcompress_tpu.quantization.fp8 import (
        quantize_params as quantize_fp8)
    import tests.test_compression_exactness as tce

    if not os.path.exists(tce._ARTIFACT):
        pytest.skip("filler_copier artifact missing")
    from kvcompress_tpu.utils.params_io import load_params_npz
    params = load_params_npz(tce._ARTIFACT)
    cfg = tce.copier_model_config()
    qparams = quantize_fp8(params)
    assert qparams["layers"]["wq_q8"].dtype == jnp.float8_e4m3fn
    assert "embed_q8" in qparams and qparams[
        "embed_q8"].dtype == jnp.float8_e4m3fn

    prompts, expected = tce._prompts(6)
    got = tce._generate(tce.make_engine(cfg, qparams), prompts)
    assert got == expected, "fp8 engine broke exact greedy copies"


def test_fp8_prefill_logits_close():
    from kvcompress_tpu.models import decoder as D
    from kvcompress_tpu.quantization.fp8 import (
        quantize_params as quantize_fp8)
    from tests.test_llama_parity import (build_cache_and_tables,
                                         make_prefill_slot_map)

    cfg = tiny_cfg().model
    params = init_llama_params(cfg, seed=0, dtype=jnp.float32)
    qparams = quantize_fp8(params)
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, VOCAB, size=11).tolist()
    T_pad = 16
    logits = {}
    for name, p in (("fp", params), ("fp8", qparams)):
        cache, bt, bs = build_cache_and_tables(cfg, 16)
        sm = make_prefill_slot_map(bt[:, 0], len(prompt), T_pad, bs)
        tokens = np.zeros(T_pad, np.int32)
        tokens[:len(prompt)] = prompt
        hidden, _ = D.prefill(p, cfg, jnp.asarray(tokens),
                              jnp.asarray(len(prompt)), jnp.asarray(sm),
                              cache, jnp.asarray(0),
                              D.AttentionSpec(mode="prefill"))
        logits[name] = np.asarray(D.compute_logits(p, cfg, hidden))
    a, b = logits["fp"], logits["fp8"]
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99, cos


def test_fp8_params_shard_under_tp():
    """fp8 leaves reuse the _q8/_scale naming, so the megatron sharding
    specs (parallel/mesh.py) apply unchanged."""
    from kvcompress_tpu.parallel.mesh import param_specs
    from kvcompress_tpu.quantization.fp8 import (
        quantize_params as quantize_fp8)
    from jax.sharding import PartitionSpec as P

    cfg = tiny_cfg()
    params = quantize_fp8(init_llama_params(cfg.model, seed=0,
                                            dtype=jnp.float32))
    specs = param_specs(params)
    assert specs["layers"]["wq_q8"] == P(None, None, "model")
    assert specs["layers"]["wq_scale"] == P(None, None, "model")
    assert specs["layers"]["wo_q8"] == P(None, "model", None)
    assert specs["layers"]["wo_scale"] == P(None, None, None)
