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
