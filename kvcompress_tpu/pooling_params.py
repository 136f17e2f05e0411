"""Pooling parameters for embedding mode (reference vllm/pooling_params.py +
model_executor/layers/pooler.py)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class PoolingParams:
    # "last": final-token hidden state (reference Pooler default for
    # llama_embedding); "mean": masked mean over the prompt; "cls": first.
    pooling_type: str = "last"
    normalize: bool = True

    def __post_init__(self):
        if self.pooling_type not in ("last", "mean", "cls"):
            raise ValueError(f"unknown pooling_type {self.pooling_type}")
