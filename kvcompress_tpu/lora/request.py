"""Per-request LoRA adapter reference (reference vllm/lora/request.py)."""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class LoRARequest:
    lora_name: str
    lora_int_id: int          # > 0; 0 is reserved for "no adapter"
    lora_path: Optional[str] = None

    def __post_init__(self):
        if self.lora_int_id < 1:
            raise ValueError("lora_int_id must be > 0")
