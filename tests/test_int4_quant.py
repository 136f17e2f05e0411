"""Int4 group quantization (AWQ/GPTQ-class): round-trip error bounds,
checkpoint unpacking against independently-written packers, and engine
greedy parity between the q4 runtime format and its explicit dequant
(reference vllm/model_executor/layers/quantization/awq.py, gptq.py;
csrc/quantization/awq/dequantize.cuh, gptq/qdq_4.cuh)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from kvcompress_tpu.quantization import int4

AWQ_ORDER = [0, 4, 1, 5, 2, 6, 3, 7]


# ------------------------------------------------------ independent packers
def awq_pack_cols(vals: np.ndarray) -> np.ndarray:
    """uint [..., N] -> int32 [..., N/8], AWQ nibble order (the inverse of
    the module's unpack, written from the triton kernel's shift table)."""
    *lead, N = vals.shape
    v = vals.reshape(*lead, N // 8, 8).astype(np.uint32)
    packed = np.zeros((*lead, N // 8), np.uint32)
    for j in range(8):
        packed |= v[..., j] << (AWQ_ORDER[j] * 4)
    return packed.view(np.int32)


def gptq_pack_rows(vals: np.ndarray) -> np.ndarray:
    """uint [K, N] -> int32 [K/8, N], sequential nibble order along K."""
    K, N = vals.shape
    v = vals.reshape(K // 8, 8, N).astype(np.uint32)
    packed = np.zeros((K // 8, N), np.uint32)
    for j in range(8):
        packed |= v[:, j, :] << (j * 4)
    return packed.view(np.int32)


def gptq_pack_cols(vals: np.ndarray) -> np.ndarray:
    """uint [..., N] -> int32 [..., N/8], sequential nibble order."""
    *lead, N = vals.shape
    v = vals.reshape(*lead, N // 8, 8).astype(np.uint32)
    packed = np.zeros((*lead, N // 8), np.uint32)
    for j in range(8):
        packed |= v[..., j] << (j * 4)
    return packed.view(np.int32)


# ----------------------------------------------------------------- roundtrip
def test_group_quant_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(128, 64)).astype(np.float32)
    q, s, z = int4._quantize_group(jnp.asarray(w), 32)
    assert q.dtype == jnp.uint4
    wd = np.asarray(int4.dequant(
        {"w_q4": q, "w_scale4": s, "w_zero4": z}, "w", jnp.float32))
    # max error is half a quantization step per group
    step = np.asarray(s).repeat(32, axis=0)
    assert np.max(np.abs(wd - w) / step) <= 0.5 + 1e-4


def test_quantize_params_skips_indivisible():
    params = {"layers": {"wq": jnp.ones((2, 48, 64)),
                         "w_up": jnp.ones((2, 128, 64))}}
    out = int4.quantize_params(params, group_size=128)
    assert "wq" in out["layers"]            # 48 % 128 != 0: untouched
    assert "w_up_q4" in out["layers"]


# ------------------------------------------------------------- HF unpacking
@pytest.mark.parametrize("method", ["awq", "gptq"])
def test_hf_unpack_matches_manual_dequant(method):
    rng = np.random.default_rng(1)
    K, N, g = 64, 32, 16
    w_int = rng.integers(0, 16, size=(K, N)).astype(np.uint32)
    zeros = rng.integers(1, 15, size=(K // g, N)).astype(np.uint32)
    scales = (rng.random((K // g, N)).astype(np.float32) + 0.1)

    if method == "awq":
        tensors = {
            "model.layers.0.self_attn.q_proj.qweight": awq_pack_cols(w_int),
            "model.layers.0.self_attn.q_proj.qzeros": awq_pack_cols(zeros),
            "model.layers.0.self_attn.q_proj.scales": scales,
        }
        cfg = {"quant_method": "awq", "bits": 4, "group_size": g}
    else:
        tensors = {
            "model.layers.0.self_attn.q_proj.qweight":
                gptq_pack_rows(w_int),
            # gptq stores zero-1 (the kernel adds it back, q_gemm.cu:261)
            "model.layers.0.self_attn.q_proj.qzeros":
                gptq_pack_cols(zeros - 1),
            "model.layers.0.self_attn.q_proj.scales": scales,
        }
        cfg = {"quant_method": "gptq", "bits": 4, "group_size": g,
               "desc_act": False}

    out = int4.dequantize_hf_tensors(tensors, cfg)
    got = out["model.layers.0.self_attn.q_proj.weight"]
    exp = ((w_int.reshape(K // g, g, N).astype(np.float32)
            - zeros[:, None, :]) * scales[:, None, :]).reshape(K, N).T
    np.testing.assert_allclose(got, exp, rtol=1e-6)
    assert "model.layers.0.self_attn.q_proj.qweight" not in out


def test_gptq_desc_act_rejected():
    with pytest.raises(ValueError, match="desc_act"):
        int4.dequantize_hf_tensors(
            {"x.qweight": np.zeros((1, 1), np.int32)},
            {"quant_method": "gptq", "bits": 4, "desc_act": True})


# ----------------------------------------------------- checkpoint + engine
def test_awq_checkpoint_loads_like_plain(tmp_path):
    """An AWQ-packed llama checkpoint must load to the same params as the
    equivalent plain-float checkpoint."""
    from safetensors.numpy import save_file
    from kvcompress_tpu.models.weights import load_model

    rng = np.random.default_rng(2)
    D, I, V, g = 64, 128, 96, 16
    hf_cfg = {
        "architectures": ["LlamaForCausalLM"], "model_type": "llama",
        "hidden_size": D, "intermediate_size": I, "num_hidden_layers": 1,
        "num_attention_heads": 4, "num_key_value_heads": 4,
        "vocab_size": V, "max_position_embeddings": 128,
        "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
    }
    proj_dims = {"self_attn.q_proj": (D, D), "self_attn.k_proj": (D, D),
                 "self_attn.v_proj": (D, D), "self_attn.o_proj": (D, D),
                 "mlp.gate_proj": (D, I), "mlp.up_proj": (D, I),
                 "mlp.down_proj": (I, D)}
    plain, packed = {}, {}
    for name, (K, N) in proj_dims.items():
        w_int = rng.integers(0, 16, size=(K, N)).astype(np.uint32)
        zeros = rng.integers(1, 15, size=(K // g, N)).astype(np.uint32)
        scales = rng.random((K // g, N)).astype(np.float32) + 0.1
        wf = ((w_int.reshape(K // g, g, N).astype(np.float32)
               - zeros[:, None, :]) * scales[:, None, :]).reshape(K, N)
        p = f"model.layers.0.{name}"
        plain[p + ".weight"] = np.ascontiguousarray(wf.T)
        packed[p + ".qweight"] = awq_pack_cols(w_int)
        packed[p + ".qzeros"] = awq_pack_cols(zeros)
        packed[p + ".scales"] = scales
    for extra_name, shape in (("model.embed_tokens.weight", (V, D)),
                              ("model.norm.weight", (D,)),
                              ("lm_head.weight", (V, D)),
                              ("model.layers.0.input_layernorm.weight",
                               (D,)),
                              ("model.layers.0.post_attention_layernorm"
                               ".weight", (D,))):
        t = rng.normal(size=shape).astype(np.float32)
        plain[extra_name] = t
        packed[extra_name] = t

    d_plain, d_awq = str(tmp_path / "plain"), str(tmp_path / "awq")
    for d, tensors, qc in ((d_plain, plain, None), (d_awq, packed, {
            "quant_method": "awq", "bits": 4, "group_size": g})):
        os.makedirs(d)
        cfg = dict(hf_cfg)
        if qc:
            cfg["quantization_config"] = qc
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(cfg, f)
        save_file(tensors, os.path.join(d, "model.safetensors"))

    cfg_a, params_a = load_model(d_plain, dtype=jnp.float32)
    cfg_b, params_b = load_model(d_awq, dtype=jnp.float32)
    assert cfg_a.checkpoint_quantization is None
    assert cfg_b.checkpoint_quantization == "awq"
    for k in params_a["layers"]:
        np.testing.assert_allclose(np.asarray(params_a["layers"][k]),
                                   np.asarray(params_b["layers"][k]),
                                   rtol=1e-6, atol=1e-6)


def test_engine_greedy_parity_q4_vs_dequant():
    """The engine with q4 runtime weights must produce exactly the greedy
    output of the engine running the explicit dequant of those weights
    (same numbers, different storage)."""
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.models.llama import init_llama_params
    from kvcompress_tpu.sampling_params import SamplingParams
    from tests.test_tp_engine import VOCAB, tp_cfg, _run

    cfg = tp_cfg()
    params = init_llama_params(cfg.model, seed=0, dtype=jnp.float32)
    qparams = int4.quantize_params(params, group_size=16)
    assert any(k.endswith("_q4") for k in qparams["layers"])
    deq = dict(qparams)
    deq["layers"] = dict(qparams["layers"])
    for k in list(deq["layers"]):
        if k.endswith("_q4"):
            base = k[:-3]
            deq["layers"][base] = int4.dequant(
                deq["layers"], base, jnp.float32)
            for sfx in ("_q4", "_scale4", "_zero4"):
                del deq["layers"][base + sfx]

    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, VOCAB, size=20).tolist() for _ in range(2)]
    eng_q = LLMEngine(cfg, qparams, num_blocks=512, attn_impl="xla")
    eng_d = LLMEngine(cfg, deq, num_blocks=512, attn_impl="xla")
    assert _run(eng_q, prompts) == _run(eng_d, prompts)


@pytest.mark.full
def test_engine_tp4_int4_parity():
    """TP=4 with int4 weights (q4 + group scales sharded by the new mesh
    specs) matches TP=1 int4 greedy output, with compression on."""
    import jax
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.models.llama import init_llama_params
    from tests.test_tp_engine import VOCAB, tp_cfg, _run

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    params = init_llama_params(tp_cfg().model, seed=0, dtype=jnp.float32)
    qparams = int4.quantize_params(params, group_size=16)
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, VOCAB, size=n).tolist() for n in (40, 24)]
    eng1 = LLMEngine(tp_cfg(tp=1), qparams, num_blocks=512,
                     attn_impl="xla")
    eng4 = LLMEngine(tp_cfg(tp=4), qparams, num_blocks=512,
                     attn_impl="xla")
    ref = _run(eng1, prompts)
    got = _run(eng4, prompts)
    assert got == ref
