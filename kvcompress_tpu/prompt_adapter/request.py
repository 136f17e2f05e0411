"""Per-request prompt-adapter reference
(reference vllm/prompt_adapter/request.py)."""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class PromptAdapterRequest:
    prompt_adapter_name: str
    prompt_adapter_id: int            # > 0
    prompt_adapter_local_path: Optional[str] = None
    prompt_adapter_num_virtual_tokens: int = 0

    def __post_init__(self):
        if self.prompt_adapter_id < 1:
            raise ValueError("prompt_adapter_id must be > 0")
