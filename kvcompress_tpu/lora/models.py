"""LoRA adapter bank: multi-adapter weights stacked for batched serving.

TPU-native re-design of the reference LoRA stack (vllm/lora/models.py
LoRAModelManager + punica SGMV/BGMV kernels): adapters live in dense bank
tensors with a leading adapter-slot axis, per-layer slices ride the
scan-over-layers xs, and the batched apply is two einsums over per-sequence
gathered A/B factors (exact BGMV semantics; XLA lowers the gather + matmul
onto the MXU). Slot 0 is the zero adapter, so sequences without LoRA are a
no-op through the same program.

Targets covered: q/k/v/o projections and the gated-MLP gate/up/down (the
reference's default target set for Llama-family models).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from kvcompress_tpu.config import ModelConfig

# bank target name -> (input_dim_attr, output_dim_fn)
_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

_HF_NAMES = {
    "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
    "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
}


def _target_dims(cfg: ModelConfig, name: str) -> Tuple[int, int]:
    D = cfg.hidden_size
    Hq, Hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
    I = cfg.intermediate_size
    return {
        "wq": (D, Hq * d), "wk": (D, Hkv * d), "wv": (D, Hkv * d),
        "wo": (Hq * d, D),
        "w_gate": (D, I), "w_up": (D, I), "w_down": (I, D),
    }[name]


@dataclasses.dataclass
class LoRABank:
    """Dense adapter bank. A[name]: [n_slots, L, in, r];
    B[name]: [n_slots, L, r, out]; scale: [n_slots] f32."""
    cfg: ModelConfig
    max_loras: int
    max_rank: int
    A: Dict[str, Any]
    B: Dict[str, Any]
    scale: Any
    name_to_slot: Dict[str, int]

    @staticmethod
    def create(cfg: ModelConfig, max_loras: int, max_rank: int,
               dtype=jnp.bfloat16) -> "LoRABank":
        L = cfg.num_layers
        n = max_loras + 1  # slot 0 = zero adapter
        A, B = {}, {}
        for t in _TARGETS:
            din, dout = _target_dims(cfg, t)
            A[t] = jnp.zeros((n, L, din, max_rank), dtype)
            B[t] = jnp.zeros((n, L, max_rank, dout), dtype)
        return LoRABank(cfg=cfg, max_loras=max_loras, max_rank=max_rank,
                       A=A, B=B, scale=jnp.zeros((n,), jnp.float32),
                       name_to_slot={})

    def add(self, name: str, slot: int,
            weights: Dict[str, Tuple[np.ndarray, np.ndarray]],
            scaling: float) -> None:
        """Install adapter tensors {target: (A [L,in,r], B [L,r,out])} into
        bank slot `slot` (1-based)."""
        assert 1 <= slot <= self.max_loras, slot
        for t, (a, b) in weights.items():
            r = a.shape[-1]
            assert r <= self.max_rank, (r, self.max_rank)
            a_pad = np.zeros(self.A[t].shape[1:], np.float32)
            b_pad = np.zeros(self.B[t].shape[1:], np.float32)
            a_pad[:, :, :r] = a
            b_pad[:, :r, :] = b
            self.A[t] = self.A[t].at[slot].set(
                jnp.asarray(a_pad, self.A[t].dtype))
            self.B[t] = self.B[t].at[slot].set(
                jnp.asarray(b_pad, self.B[t].dtype))
        self.scale = self.scale.at[slot].set(scaling)
        self.name_to_slot[name] = slot

    def remove(self, name: str) -> None:
        slot = self.name_to_slot.pop(name)
        for t in _TARGETS:
            self.A[t] = self.A[t].at[slot].set(0.0)
            self.B[t] = self.B[t].at[slot].set(0.0)
        self.scale = self.scale.at[slot].set(0.0)

    def layer_banks(self) -> Dict[str, Any]:
        """Per-target arrays transposed to [L, n, ...] so they ride the
        scan-over-layers xs alongside the base weights."""
        out = {}
        for t in _TARGETS:
            out[f"lora_{t}_A"] = jnp.swapaxes(self.A[t], 0, 1)
            out[f"lora_{t}_B"] = jnp.swapaxes(self.B[t], 0, 1)
        return out


def load_peft_adapter(adapter_dir: str, cfg: ModelConfig
                      ) -> Tuple[Dict[str, Tuple[np.ndarray, np.ndarray]],
                                 float]:
    """Read a HF PEFT checkpoint (adapter_config.json +
    adapter_model.safetensors) into per-target stacked [L, ...] factors.
    Returns (weights, scaling = lora_alpha / r)."""
    from safetensors import safe_open

    with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
        acfg = json.load(f)
    r = acfg["r"]
    scaling = acfg.get("lora_alpha", r) / r

    path = os.path.join(adapter_dir, "adapter_model.safetensors")
    tensors: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="np") as sf:
        for k in sf.keys():
            tensors[k] = sf.get_tensor(k)

    L = cfg.num_layers
    weights: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for hf_name, t in _HF_NAMES.items():
        probe = [k for k in tensors
                 if f".{hf_name}.lora_A" in k and ".layers.0." in k]
        if not probe:
            continue
        a_stack, b_stack = [], []
        for i in range(L):
            a_key = next(k for k in tensors
                         if f".layers.{i}." in k
                         and f".{hf_name}.lora_A" in k)
            b_key = next(k for k in tensors
                         if f".layers.{i}." in k
                         and f".{hf_name}.lora_B" in k)
            # HF layout: lora_A [r, in], lora_B [out, r] -> x@A^T@B^T
            a_stack.append(tensors[a_key].T)   # [in, r]
            b_stack.append(tensors[b_key].T)   # [r, out]
        weights[t] = (np.stack(a_stack), np.stack(b_stack))
    return weights, scaling


def apply_lora(h, lw: Dict[str, Any], name: str, lora_idx, lora_scale):
    """Batched LoRA delta for one projection inside the layer scan.

    h: [T, in]; lw holds lora_{name}_A [n, in, r] / _B [n, r, out] (this
    layer's slice); lora_idx: scalar (prefill) or [T] (decode batch);
    returns delta [T, out]."""
    A = lw[f"lora_{name}_A"]
    B = lw[f"lora_{name}_B"]
    if lora_idx.ndim == 0:
        # single sequence: direct slice, two small matmuls
        t = h @ A[lora_idx]
        delta = (t @ B[lora_idx]).astype(h.dtype)
        return delta * lora_scale[lora_idx].astype(h.dtype)
    Ag = A[lora_idx]                       # [T, in, r]
    Bg = B[lora_idx]                       # [T, r, out]
    t = jnp.einsum("ti,tir->tr", h, Ag)
    delta = jnp.einsum("tr,tro->to", t, Bg).astype(h.dtype)
    return delta * lora_scale[lora_idx][:, None].astype(h.dtype)
