"""Prompt-adapter (prefix-tuning) serving.

The role of reference vllm/prompt_adapter/ (644 LoC: PEFT prompt-tuning
adapters managed like LoRA): a learned soft-prompt [n_virtual, D] is
prepended to the sequence at prefill. TPU-natively this needs no model
changes at all - the virtual tokens become ordinary positions in the paged
KV cache (they are prefilled once and attended like any other token), so
decode, compression, and eviction treat them uniformly. The engine swaps
the embedding rows of the first n_virtual positions for the adapter's
vectors inside the prefill program.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from kvcompress_tpu.config import ModelConfig


@dataclasses.dataclass
class PromptAdapterBank:
    """Dense bank [n_slots, max_virtual, D]; slot 0 = empty adapter."""
    max_adapters: int
    max_virtual: int
    embeddings: Any                  # [n_slots, max_virtual, D]
    n_virtual: Any                   # [n_slots] i32
    name_to_slot: Dict[str, int]

    @staticmethod
    def create(cfg: ModelConfig, max_adapters: int, max_virtual: int,
               dtype=jnp.bfloat16) -> "PromptAdapterBank":
        return PromptAdapterBank(
            max_adapters=max_adapters, max_virtual=max_virtual,
            embeddings=jnp.zeros(
                (max_adapters + 1, max_virtual, cfg.hidden_size), dtype),
            n_virtual=jnp.zeros((max_adapters + 1,), jnp.int32),
            name_to_slot={})

    def add(self, name: str, slot: int, embeddings: np.ndarray) -> None:
        n, d = embeddings.shape
        assert 1 <= slot <= self.max_adapters
        assert n <= self.max_virtual, (n, self.max_virtual)
        pad = np.zeros((self.max_virtual, d), np.float32)
        pad[:n] = embeddings
        self.embeddings = self.embeddings.at[slot].set(
            jnp.asarray(pad, self.embeddings.dtype))
        self.n_virtual = self.n_virtual.at[slot].set(n)
        self.name_to_slot[name] = slot

    def remove(self, name: str) -> None:
        slot = self.name_to_slot.pop(name)
        self.embeddings = self.embeddings.at[slot].set(0.0)
        self.n_virtual = self.n_virtual.at[slot].set(0)


def load_peft_prompt_adapter(adapter_dir: str) -> np.ndarray:
    """Read a PEFT prompt-tuning checkpoint: adapter_model.safetensors with
    `prompt_embeddings` [n_virtual, D]."""
    from safetensors import safe_open

    path = os.path.join(adapter_dir, "adapter_model.safetensors")
    with safe_open(path, framework="np") as sf:
        for key in ("prompt_embeddings", "prompt_encoder.embedding.weight"):
            if key in sf.keys():
                return sf.get_tensor(key)
    raise ValueError(f"no prompt embeddings found in {path}")
