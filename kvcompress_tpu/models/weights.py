"""HuggingFace checkpoint loading (safetensors, torch-free).

Replaces the reference's model_loader stack (vllm/model_executor/model_loader/)
for the Llama family: reads config.json + *.safetensors from a local
directory, transposes projection matrices for x @ W layout, and stacks
per-layer weights on a leading [L] axis for the scan-over-layers forward."""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from kvcompress_tpu.config import ModelConfig

_LLAMA_LIKE = {
    "LlamaForCausalLM", "MistralForCausalLM", "Qwen2ForCausalLM",
}


def config_from_hf(hf_cfg: dict, model_name: str = "") -> ModelConfig:
    arch = (hf_cfg.get("architectures") or ["LlamaForCausalLM"])[0]
    if arch not in _LLAMA_LIKE:
        raise ValueError(f"unsupported architecture {arch}")
    head_size = hf_cfg.get(
        "head_dim",
        hf_cfg["hidden_size"] // hf_cfg["num_attention_heads"])
    return ModelConfig(
        model=model_name,
        num_layers=hf_cfg["num_hidden_layers"],
        num_heads=hf_cfg["num_attention_heads"],
        num_kv_heads=hf_cfg.get("num_key_value_heads",
                                hf_cfg["num_attention_heads"]),
        head_size=head_size,
        hidden_size=hf_cfg["hidden_size"],
        intermediate_size=hf_cfg["intermediate_size"],
        vocab_size=hf_cfg["vocab_size"],
        max_model_len=hf_cfg.get("max_position_embeddings", 8192),
        rope_theta=hf_cfg.get("rope_theta", 10000.0),
        rope_scaling=hf_cfg.get("rope_scaling"),
        rms_norm_eps=hf_cfg.get("rms_norm_eps", 1e-5),
        tie_word_embeddings=hf_cfg.get("tie_word_embeddings", False),
        architecture=arch,
        hidden_act=hf_cfg.get("hidden_act", "silu"),
        qkv_bias=(arch == "Qwen2ForCausalLM"
                  or hf_cfg.get("attention_bias", False)),
        sliding_window=hf_cfg.get("sliding_window"),
    )


def _read_all_tensors(model_dir: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    tensors: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors in {model_dir}")
    for f in files:
        with safe_open(os.path.join(model_dir, f), framework="np") as sf:
            for name in sf.keys():
                tensors[name] = sf.get_tensor(name)
    return tensors


def params_from_hf_state(
    t: Dict[str, np.ndarray], cfg: ModelConfig, dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    L = cfg.num_layers

    def stack(fmt: str, transpose: bool = False):
        arrs = [t[fmt.format(i)] for i in range(L)]
        out = np.stack([a.T if transpose else a for a in arrs])
        return jnp.asarray(out, dtype)

    p = "model.layers.{}."
    layers = {
        "input_norm": stack(p + "input_layernorm.weight"),
        "post_attn_norm": stack(p + "post_attention_layernorm.weight"),
        "wq": stack(p + "self_attn.q_proj.weight", transpose=True),
        "wk": stack(p + "self_attn.k_proj.weight", transpose=True),
        "wv": stack(p + "self_attn.v_proj.weight", transpose=True),
        "wo": stack(p + "self_attn.o_proj.weight", transpose=True),
        "w_gate": stack(p + "mlp.gate_proj.weight", transpose=True),
        "w_up": stack(p + "mlp.up_proj.weight", transpose=True),
        "w_down": stack(p + "mlp.down_proj.weight", transpose=True),
    }
    if cfg.qkv_bias and "model.layers.0.self_attn.q_proj.bias" in t:
        layers["bq"] = stack(p + "self_attn.q_proj.bias")
        layers["bk"] = stack(p + "self_attn.k_proj.bias")
        layers["bv"] = stack(p + "self_attn.v_proj.bias")
    params = {
        "embed": jnp.asarray(t["model.embed_tokens.weight"], dtype),
        "final_norm": jnp.asarray(t["model.norm.weight"], dtype),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(t["lm_head.weight"], dtype)
    return params


def load_model(model_dir: str, dtype=jnp.bfloat16
               ) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Load (config, params) from a local HF model directory."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg, model_name=model_dir)
    tensors = _read_all_tensors(model_dir)
    return cfg, params_from_hf_state(tensors, cfg, dtype)
