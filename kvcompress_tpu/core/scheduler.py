"""Host-side continuous-batching scheduler.

The control-plane analogue of reference vllm/core/scheduler.py (prefill-first
policy :1060-1180, batched decode scheduling :538-663, compression scheduling
:1309-1342) and the sizing logic of vllm/kvcompress/scheduler.py:100-222.
All decisions here use only host-tracked scalars (sequence lengths, block/KV
count mirrors, free-block counter); per-head state never leaves the device.
"""

from __future__ import annotations

import collections
import dataclasses
import math
from typing import Deque, Dict, List, Optional, Tuple

from kvcompress_tpu.config import EngineConfig, cdiv, round_up
from kvcompress_tpu.sequence import Sequence, SequenceStatus


@dataclasses.dataclass
class CompressionBatch:
    seqs: List[Sequence]
    slots: List[int]
    last_positions: List[int]
    protected: List[int]
    evict_blocks: List[int]
    nb_bucket: int


class Scheduler:
    def __init__(self, cfg: EngineConfig, num_blocks: int):
        self.cfg = cfg
        self.block_size = cfg.cache.block_size
        self.waiting: Deque[Sequence] = collections.deque()
        self.running: List[Sequence] = []
        self.free_slots = list(range(cfg.scheduler.max_num_seqs))[::-1]
        # host mirror of the device free-block counter (block 0 reserved)
        self.free_blocks = num_blocks - 1
        self.total_blocks = num_blocks - 1
        self.iteration_count = 0
        self.new_tokens = 0
        self.total_evicted_kvs = 0

    # ----------------------------------------------------------- admission
    def add_seq(self, seq: Sequence) -> None:
        self.waiting.append(seq)

    def blocks_needed_for_prefill(self, seq: Sequence) -> int:
        return self.cfg.min_blocks_for_seq(seq.num_prompt_tokens)

    def can_allocate(self, seq: Sequence) -> bool:
        """Watermark admission (reference block_manager.py:356-382)."""
        if not self.free_slots:
            return False
        needed = self.blocks_needed_for_prefill(seq)
        watermark = math.ceil(self.cfg.scheduler.watermark
                              * self.total_blocks)
        return self.free_blocks - needed >= watermark

    def next_prefill(self) -> Optional[Sequence]:
        # loop, not recursion: a long run of oversized queued prompts
        # (cheap for a client to submit) would blow the recursion limit
        while self.waiting:
            seq = self.waiting[0]
            if seq.num_prompt_tokens <= self.cfg.scheduler.max_model_len:
                break
            seq.status = SequenceStatus.FINISHED_ABORTED
            self.waiting.popleft()
        if not self.waiting:
            return None
        seq = self.waiting[0]
        if not self.can_allocate(seq):
            return None
        self.waiting.popleft()
        seq.slot = self.free_slots.pop()
        seq.status = SequenceStatus.RUNNING
        seq.block_count = self.blocks_needed_for_prefill(seq)
        seq.kv_count = (seq.num_prompt_tokens * self.cfg.model.num_layers
                        * self.cfg.model.num_kv_heads)
        self.free_blocks -= seq.block_count
        self.running.append(seq)
        return seq

    # ---------------------------------------------------------- preemption
    def blocks_needed_next_decode(self, steps: int = 1) -> int:
        """Worst-case blocks a decode burst may allocate: every head of
        every running sequence crossing ceil(steps / block_size) block
        boundaries."""
        per_seq = self.cfg.model.num_layers * self.cfg.model.num_kv_heads
        crossings = cdiv(steps, self.block_size)
        return len(self.running) * per_seq * crossings

    def must_preempt(self, steps: int = 1) -> bool:
        """(reference core/scheduler.py:1299-1306)"""
        return self.free_blocks < self.blocks_needed_next_decode(steps)

    def preempt_last(self) -> Tuple[Optional[Sequence], int]:
        """Preemption by recompute: pop the most recent running sequence
        (reference core/scheduler.py:611-633). Returns (victim, slot) so the
        engine can release the victim's device blocks."""
        if not self.running:
            return None, -1
        victim = max(self.running, key=lambda s: s.arrival_time)
        self.running.remove(victim)
        slot = victim.slot
        self.free_slot(victim)
        victim.reset_for_recompute()
        self.waiting.appendleft(victim)
        return victim, slot

    def free_slot(self, seq: Sequence) -> None:
        self.free_blocks += seq.block_count
        if seq.slot >= 0:
            self.free_slots.append(seq.slot)
        seq.slot = -1

    def finish_seq(self, seq: Sequence, status: SequenceStatus) -> None:
        seq.status = status
        self.running.remove(seq)
        self.free_slot(seq)

    # --------------------------------------------------------- compression
    def _seq_evict_blocks(self, seq: Sequence) -> int:
        """Per-sequence eviction sizing
        (reference kvcompress/scheduler.py:100-181)."""
        sp = seq.sampling_params
        if sp.compress_once and seq.compressed:
            return 0
        bs = self.block_size
        L, H = self.cfg.model.num_layers, self.cfg.model.num_kv_heads
        total_heads = L * H

        if sp.max_cache_tokens >= 0:
            mct = round_up(max(sp.max_cache_tokens, 1), bs)
            max_cache_blocks = cdiv(mct * total_heads, bs)
            evict_block_count = max(0, seq.block_count - max_cache_blocks)
        elif sp.target_compression_rate < 1.0:
            protected_tokens = round_up(sp.protected_window_size, bs)
            compressible = seq.get_len() - protected_tokens
            if compressible <= 0:
                return 0
            compressible_kv = compressible * total_heads
            protected_kv = protected_tokens * total_heads
            target_kv = (math.ceil(compressible_kv
                                   * sp.target_compression_rate)
                         + protected_kv)
            evict_kv = max(0, seq.kv_count - target_kv)
            evict_block_count = cdiv(evict_kv, bs)
        else:
            return 0

        # never exceed what is evictable outside the protected window
        protected_blocks = cdiv(sp.protected_window_size, bs) * total_heads
        max_evictable = max(0, seq.block_count - protected_blocks)
        return min(evict_block_count, max_evictable)

    def schedule_compression(self, force: bool = False, n_iters: int = 1
                             ) -> Optional[CompressionBatch]:
        """Cadence + batch selection
        (reference kvcompress/scheduler.py:184-243, 565-575). n_iters is the
        number of engine iterations the next step will run (multi-step
        decode advances the cadence by k)."""
        kc = self.cfg.kvcompress
        if not kc.enabled:
            return None
        self.iteration_count += n_iters
        if not (force or self.iteration_count >= kc.compression_interval
                or (kc.new_token_limit > -1
                    and self.new_tokens > kc.new_token_limit)):
            return None
        self.iteration_count = 0
        self.new_tokens = 0

        bs = self.block_size
        L, H = self.cfg.model.num_layers, self.cfg.model.num_kv_heads
        candidates = sorted(
            self.running,
            key=lambda s: (-s.iters_since_compression, s.slot))
        batch: List[Tuple[Sequence, int]] = []
        nb_max = 0
        total_evicted_kv = 0
        for seq in candidates:
            eb = self._seq_evict_blocks(seq)
            if eb == 0:
                continue
            # Account the DEVICE WORKSPACE the round will gather
            # ([B, L, H, nb_max * bs], eviction.py gather_workspace), not
            # just the batch's own KVs: the workspace is what bounds the
            # sort memory (reference config.py:974-985), and mixing one
            # long sequence with many short ones would otherwise blow it
            # past max_kv_per_compression.
            new_nb = max(nb_max, cdiv(seq.get_len(), bs))
            if ((len(batch) + 1) * L * H * new_nb * bs
                    > kc.max_kv_per_compression):
                # SKIP, never break: candidates sort stalest-first, so a
                # single sequence too large for the workspace cap would
                # otherwise head-of-line-block every other sequence's
                # compression forever (it only grows staler)
                if not batch and not getattr(seq, "_warned_workspace",
                                             False):
                    seq._warned_workspace = True
                    import logging
                    logging.getLogger(__name__).warning(
                        "sequence %s (%d tokens) exceeds "
                        "max_kv_per_compression alone and will not be "
                        "compressed; raise the cap or lower "
                        "max_model_len", seq.request_id, seq.get_len())
                continue
            # moves <= min(holes, surviving): compaction only fills
            # eviction holes below the new context length
            # (kvcompress/eviction.py plan_cache_moves), so a 6000->128
            # compression schedules ~128 moves per head, not 5900. holes
            # <= evicted <= eb*bs; surviving = kv_count - evicted, and
            # evicted can undershoot eb*bs by up to bs-1 HANGING tokens
            # per (layer, head) (eviction.py truncate-to-block), so the
            # survivor term needs that slack - without it real moves can
            # exceed the admission estimate and the device plan silently
            # truncates past the cap (corruption). A sequence that does
            # not fit is PARTIALLY evicted (clamped block budget; the
            # next round continues) rather than skipped.
            slack = L * H * (bs - 1)
            moves = min(eb * bs,
                        max(seq.kv_count - eb * bs, 0) + slack)
            room = kc.max_cache_moves_per_compression - total_evicted_kv
            if moves > room:
                eb = min(eb, room // bs)  # conservative fallback clamp
                if eb <= 0:
                    continue
                moves = min(eb * bs,
                            max(seq.kv_count - eb * bs, 0) + slack)
            nb_max = new_nb
            total_evicted_kv += moves
            batch.append((seq, eb))

        if not batch:
            return None
        batch.sort(key=lambda t: t[0].slot)
        in_batch = {id(b[0]) for b in batch}
        for seq, _ in batch:
            seq.compressed = True
            seq.iters_since_compression = 0
        for seq in self.running:
            if id(seq) not in in_batch:
                seq.iters_since_compression += 1

        nb_bucket = max(
            cdiv(seq.get_len(), bs) for seq, _ in batch)
        return CompressionBatch(
            seqs=[s for s, _ in batch],
            slots=[s.slot for s, _ in batch],
            # last cached token position is len-1 (the newest token's KVs are
            # cached during the next forward; reference scheduler.py:256-260)
            last_positions=[s.get_len() - 1 for s, _ in batch],
            protected=[s.sampling_params.protected_window_size
                       for s, _ in batch],
            evict_blocks=[eb for _, eb in batch],
            nb_bucket=nb_bucket,
        )
