"""HuggingFace checkpoint loading (safetensors, torch-free).

Replaces the reference's model_loader stack (vllm/model_executor/model_loader/)
for every family in models/registry.py: reads config.json + *.safetensors
from a local directory, transposes projection matrices for x @ W layout, and
stacks per-layer weights on a leading [L] axis for the scan-over-layers
forward. Architecture-specific tensor-name mappings (fused qkv splits,
Conv1D layouts, MoE expert stacking) live in models/registry.py."""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from kvcompress_tpu.config import ModelConfig
from kvcompress_tpu.models.registry import (  # noqa: F401
    config_from_hf,
    params_from_hf_state,
    supported_architectures,
)


def _read_all_tensors(model_dir: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    tensors: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors"))
    if not files:
        return _read_torch_bins(model_dir)
    for f in files:
        with safe_open(os.path.join(model_dir, f), framework="np") as sf:
            for name in sf.keys():
                tensors[name] = sf.get_tensor(name)
    return tensors


def _read_torch_bins(model_dir: str) -> Dict[str, np.ndarray]:
    """pytorch_model*.bin / *.pt fallback (reference model_loader
    loader.py pt_weights_iterator): torch.load on CPU, densified to
    numpy. Used only when the directory has no safetensors."""
    files = sorted(f for f in os.listdir(model_dir)
                   if f.endswith((".bin", ".pt"))
                   and not f.endswith("training_args.bin"))
    if not files:
        raise FileNotFoundError(f"no safetensors or .bin/.pt weight "
                                f"files in {model_dir}")
    import torch
    tensors: Dict[str, np.ndarray] = {}
    for f in files:
        sd = torch.load(os.path.join(model_dir, f), map_location="cpu",
                        weights_only=True)
        for name, t in sd.items():
            if t.dtype == torch.bfloat16:
                # numpy has no bf16: round-trip through f32
                tensors[name] = t.to(torch.float32).numpy()
            else:
                tensors[name] = t.numpy()
    return tensors


def load_model(model_dir: str, dtype=jnp.bfloat16
               ) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Load (config, params) from a local HF model directory.

    AWQ/GPTQ 4-bit checkpoints (config.json `quantization_config`) are
    unpacked to float at load (quantization/int4.py
    dequantize_hf_tensors) so the per-architecture mappings work
    unchanged; `cfg.checkpoint_quantization` records the source method so
    the LLM surface re-quantizes to the int4 runtime format by default.
    A path ending in .gguf is parsed by the dependency-free GGUF loader
    (models/gguf.py; reference model_loader GGUFModelLoader)."""
    if model_dir.endswith(".gguf"):
        from kvcompress_tpu.models.gguf import load_gguf_model
        hf_cfg, tensors = load_gguf_model(model_dir)
        cfg = config_from_hf(hf_cfg, model_name=model_dir)
        return cfg, params_from_hf_state(tensors, cfg, dtype)
    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg, model_name=model_dir)
    tensors = _read_all_tensors(model_dir)
    qc = hf_cfg.get("quantization_config")
    if qc and any(k.endswith(".qweight") for k in tensors):
        from kvcompress_tpu.quantization.int4 import dequantize_hf_tensors
        tensors = dequantize_hf_tensors(tensors, qc)
        cfg.checkpoint_quantization = qc.get("quant_method")
    return cfg, params_from_hf_state(tensors, cfg, dtype)


def load_multimodal(model_dir: str, dtype=jnp.float32):
    """(kind, vision_cfg, vision_params) for a multimodal checkpoint
    (reference llava.py vision tower + multi_modal_projector, fuyu.py
    vision_embed_tokens; loaded separately from the text tower - image
    encoding runs as its own program, see models/vision.py)."""
    from kvcompress_tpu.models import vision
    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    tensors = _read_all_tensors(model_dir)
    arch = (hf_cfg.get("architectures") or [""])[0]
    if arch == "FuyuForCausalLM":
        return ("fuyu", None, vision.fuyu_params_from_hf(tensors, dtype))
    if arch == "Blip2ForConditionalGeneration":
        bcfg = vision.blip2_config_from_hf(hf_cfg)
        return ("blip2", bcfg,
                vision.blip2_params_from_hf(tensors, bcfg, dtype))
    if arch == "MiniCPMV":
        vcfg = vision.config_from_hf(hf_cfg["vision_config"], hf_cfg)
        n_heads = hf_cfg.get("resampler_num_heads",
                             max(1, hf_cfg["hidden_size"] // 128))
        return ("minicpmv", (vcfg, n_heads),
                vision.minicpmv_params_from_hf(tensors, vcfg, dtype))
    if arch == "Phi3VForCausalLM":
        pvcfg = vision.phi3v_config_from_hf(hf_cfg)
        return ("phi3v", pvcfg,
                vision.phi3v_params_from_hf(tensors, pvcfg, dtype))
    if arch == "UltravoxModel":
        ucfg = vision.ultravox_config_from_hf(hf_cfg)
        return ("ultravox", ucfg,
                vision.ultravox_params_from_hf(tensors, ucfg, dtype))
    if arch == "InternVLForConditionalGeneration":
        ivcfg = vision.internvl_config_from_hf(hf_cfg)
        return ("internvl", ivcfg,
                vision.internvl_params_from_hf(tensors, ivcfg, dtype))
    if arch == "ChameleonForConditionalGeneration":
        vqcfg = vision.chameleon_vq_config_from_hf(hf_cfg)
        img2bpe = vision.chameleon_img2bpe(hf_cfg["vocabulary_map"])
        return ("chameleon", (vqcfg, img2bpe),
                vision.chameleon_vq_params_from_hf(tensors, vqcfg, dtype))
    if arch == "PaliGemmaForConditionalGeneration":
        vcfg = vision.config_from_hf(hf_cfg["vision_config"], hf_cfg)
        return ("paligemma", vcfg,
                vision.paligemma_params_from_hf(tensors, vcfg, dtype))
    vcfg = vision.config_from_hf(hf_cfg["vision_config"], hf_cfg)
    kind = ("llava_next" if arch == "LlavaNextForConditionalGeneration"
            else "llava")
    return (kind, vcfg, vision.params_from_hf(tensors, vcfg, dtype))
