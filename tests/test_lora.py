"""LoRA serving: batched multi-adapter decode must match dense-merged
weights exactly (the oracle for the bank-gather apply), and adapterless
sequences must be unaffected - the correctness contract of the reference's
punica BGMV path (vllm/lora/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.config import LoRAConfig
from kvcompress_tpu.lora import LoRARequest
from kvcompress_tpu.models.llama import init_llama_params
from kvcompress_tpu.sampling_params import SamplingParams
from tests.test_engine import VOCAB, tiny_cfg, run_all


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = init_llama_params(cfg.model, seed=0, dtype=jnp.float32)
    rng = np.random.default_rng(42)
    mc = cfg.model
    L, D = mc.num_layers, mc.hidden_size
    Hq, Hkv, d = mc.num_heads, mc.num_kv_heads, mc.head_size
    I, r = mc.intermediate_size, 4
    dims = {"wq": (D, Hq * d), "wk": (D, Hkv * d), "wv": (D, Hkv * d),
            "wo": (Hq * d, D), "w_gate": (D, I), "w_up": (D, I),
            "w_down": (I, D)}
    weights = {}
    for t, (din, dout) in dims.items():
        A = rng.standard_normal((L, din, r)).astype(np.float32) * 0.05
        B = rng.standard_normal((L, r, dout)).astype(np.float32) * 0.05
        weights[t] = (A, B)
    scaling = 2.0
    return cfg, params, weights, scaling


def merged_params(params, weights, scaling):
    merged = {k: v for k, v in params.items()}
    merged["layers"] = dict(params["layers"])
    for t, (A, B) in weights.items():
        delta = scaling * np.einsum("lir,lro->lio", A, B)
        merged["layers"][t] = params["layers"][t] + jnp.asarray(delta)
    return merged


def test_lora_matches_merged_weights(setup):
    cfg, params, weights, scaling = setup
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, VOCAB, size=9).tolist()

    cfg_l = tiny_cfg()
    cfg_l.lora = LoRAConfig(enable_lora=True, max_loras=2, max_lora_rank=8)
    eng = LLMEngine(cfg_l, params, num_blocks=512, attn_impl="xla")
    req = LoRARequest("adapter_a", 1)
    eng.add_lora(req, weights=weights, scaling=scaling)
    rid = eng.add_request(None, prompt_token_ids=prompt,
                          sampling_params=SamplingParams(
                              temperature=0.0, max_tokens=8,
                              ignore_eos=True),
                          lora_request=req)
    lora_out = run_all(eng)[rid].outputs[0].token_ids

    eng_m = LLMEngine(tiny_cfg(), merged_params(params, weights, scaling),
                      num_blocks=512, attn_impl="xla")
    rid = eng_m.add_request(None, prompt_token_ids=prompt,
                            sampling_params=SamplingParams(
                                temperature=0.0, max_tokens=8,
                                ignore_eos=True))
    merged_out = run_all(eng_m)[rid].outputs[0].token_ids
    assert lora_out == merged_out


def test_lora_and_base_in_one_batch(setup):
    cfg, params, weights, scaling = setup
    rng = np.random.default_rng(1)
    p1 = rng.integers(0, VOCAB, size=8).tolist()
    p2 = rng.integers(0, VOCAB, size=8).tolist()

    # baseline (no lora engine at all)
    eng0 = LLMEngine(tiny_cfg(), params, num_blocks=512, attn_impl="xla")
    rid = eng0.add_request(None, prompt_token_ids=p2,
                           sampling_params=SamplingParams(
                               temperature=0.0, max_tokens=6,
                               ignore_eos=True))
    base_out = run_all(eng0)[rid].outputs[0].token_ids

    cfg_l = tiny_cfg()
    cfg_l.lora = LoRAConfig(enable_lora=True, max_loras=2, max_lora_rank=8)
    eng = LLMEngine(cfg_l, params, num_blocks=512, attn_impl="xla")
    req = LoRARequest("adapter_a", 1)
    eng.add_lora(req, weights=weights, scaling=scaling)
    r1 = eng.add_request(None, prompt_token_ids=p1,
                         sampling_params=SamplingParams(
                             temperature=0.0, max_tokens=6,
                             ignore_eos=True), lora_request=req)
    r2 = eng.add_request(None, prompt_token_ids=p2,
                         sampling_params=SamplingParams(
                             temperature=0.0, max_tokens=6,
                             ignore_eos=True))  # no adapter
    outs = run_all(eng)
    # the adapterless sequence in the mixed batch matches the plain engine
    assert outs[r2].outputs[0].token_ids == base_out
    # and the lora sequence differs from its own base run
    eng0b = LLMEngine(tiny_cfg(), params, num_blocks=512, attn_impl="xla")
    rid = eng0b.add_request(None, prompt_token_ids=p1,
                            sampling_params=SamplingParams(
                                temperature=0.0, max_tokens=6,
                                ignore_eos=True))
    assert outs[r1].outputs[0].token_ids != run_all(
        eng0b)[rid].outputs[0].token_ids
