"""Per-request sampling + compression parameters.

Mirrors the reference vllm/sampling_params.py:152-196: sampling controls plus
the per-request KV-Compress knobs (max_cache_tokens, protected_window_size,
metric_collection_buffer_size, target_compression_rate, compress_once).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Union


@dataclasses.dataclass
class SamplingParams:
    n: int = 1
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    seed: Optional[int] = None
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    ignore_eos: bool = False
    max_tokens: Optional[int] = 16
    min_tokens: int = 0
    logprobs: Optional[int] = None
    logit_bias: Optional[dict] = None  # {token_id: bias}
    skip_special_tokens: bool = True
    # --- guided decoding (reference guided_decoding/) ---
    guided_regex: Optional[str] = None
    guided_choice: Optional[List[str]] = None
    guided_json: Optional[object] = None  # schema dict, {} or True

    @property
    def is_guided(self) -> bool:
        return (self.guided_regex is not None
                or self.guided_choice is not None
                or self.guided_json is not None)

    # --- KV-Compress per-request controls ---
    # Most recent tokens that can never be evicted
    # (reference sampling_params.py:152).
    protected_window_size: int = 32
    # Fraction of compressible KVs to retain (1.0 = no rate-based eviction).
    target_compression_rate: float = 1.0
    # Hard per-head cache token budget (-1 = unlimited).
    max_cache_tokens: int = -1
    # Most recent tokens whose attention is NOT yet recorded into metrics
    # (must be <= protected_window_size, reference sampling_params.py:343-346).
    metric_collection_buffer_size: int = 0
    # Compress exactly once, right after prefill.
    compress_once: bool = False

    def __post_init__(self):
        if self.metric_collection_buffer_size > self.protected_window_size:
            raise ValueError(
                "metric_collection_buffer_size must be <= protected_window_size"
            )
        if self.target_compression_rate < 1.0 and self.max_cache_tokens > 0:
            raise ValueError(
                "cannot set both target_compression_rate and max_cache_tokens"
            )
        if not 0.0 < self.target_compression_rate <= 1.0:
            raise ValueError("target_compression_rate must be in (0, 1]")

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0
