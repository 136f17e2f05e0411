"""Sequence bookkeeping (host side).

The host-visible analogue of reference vllm/sequence.py, radically slimmed:
all per-head state (context lens, block tables, metrics) lives on device in
CacheState; the host tracks only scalars needed for scheduling decisions
(lengths, slot assignment, block/KV count mirrors refreshed from device
program outputs).
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import List, Optional

from kvcompress_tpu.sampling_params import SamplingParams


class SequenceStatus(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    FINISHED_STOPPED = "finished_stopped"
    FINISHED_LENGTH = "finished_length"
    FINISHED_ABORTED = "finished_aborted"

    @property
    def is_finished(self) -> bool:
        return self.name.startswith("FINISHED")


@dataclasses.dataclass
class Sequence:
    request_id: str
    prompt_token_ids: List[int]
    sampling_params: SamplingParams
    prompt: Optional[str] = None
    arrival_time: float = dataclasses.field(default_factory=time.monotonic)

    status: SequenceStatus = SequenceStatus.WAITING
    output_token_ids: List[int] = dataclasses.field(default_factory=list)
    slot: int = -1  # batch slot index while RUNNING

    # Whether this sequence has been compressed at least once
    # (consumed by compress_once, reference kvcompress/scheduler.py:113-116).
    compressed: bool = False
    iters_since_compression: int = 0

    # Device mirrors (refreshed from program outputs; see engine step()).
    block_count: int = 0  # total allocated blocks across (layer, head)
    kv_count: int = 0     # total cached KVs across (layer, head)

    # Timing for stats.
    first_token_time: Optional[float] = None
    finish_time: Optional[float] = None

    # Incremental text / logprobs (populated by the engine).
    output_text: str = ""
    detokenizer: Optional[object] = None
    # text delta precomputed by the pooled detokenizer, awaiting consumption
    pending_delta: Optional[str] = None
    logprobs: Optional[List[dict]] = None   # per-token {id: logprob, ...}
    stop_reason: Optional[str] = None       # matched stop string
    # index into output_token_ids of tokens already emitted to streams
    stream_offset: int = 0
    # LoRA adapter bank slot (0 = no adapter)
    lora_int_id: int = 0
    # Guided-decoding automaton state (guided/processor.py)
    guided: Optional[object] = None
    # Prompt-adapter (prefix tuning) bank slot + virtual token count
    prompt_adapter_slot: int = 0
    prompt_adapter_virtual: int = 0

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_output_tokens(self) -> int:
        return len(self.output_token_ids)

    def get_len(self) -> int:
        return self.num_prompt_tokens + self.num_output_tokens

    @property
    def last_token_id(self) -> int:
        if self.output_token_ids:
            return self.output_token_ids[-1]
        return self.prompt_token_ids[-1]

    def reset_for_recompute(self) -> None:
        """Preemption-by-recompute: fold outputs into the prompt and requeue
        (reference core/scheduler.py:1648 _batch_preempt_by_recompute)."""
        self.prompt_token_ids = self.prompt_token_ids + self.output_token_ids
        self.output_token_ids = []
        self.slot = -1
        self.block_count = 0
        self.kv_count = 0
        self.compressed = False
        self.status = SequenceStatus.WAITING


@dataclasses.dataclass
class CompletionOutput:
    index: int
    text: str
    token_ids: List[int]
    finish_reason: Optional[str] = None
    logprobs: Optional[List[dict]] = None  # per-token {token_id: logprob}
    stop_reason: Optional[str] = None


@dataclasses.dataclass
class RequestOutput:
    request_id: str
    prompt: Optional[str]
    prompt_token_ids: List[int]
    outputs: List[CompletionOutput]
    finished: bool
    metrics: Optional[dict] = None
