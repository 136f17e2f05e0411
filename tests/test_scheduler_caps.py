"""Compression scheduling under workspace/move caps and prefill-queue
robustness (reference kvcompress/scheduler.py:184-243 batch selection):
a sequence too large for max_kv_per_compression alone must be SKIPPED -
not head-of-line-block every other sequence forever - and oversized
waiting prompts must not recurse."""

import numpy as np
import pytest

from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                   KVCompressConfig, ModelConfig,
                                   ParallelConfig, SchedulerConfig)
from kvcompress_tpu.core.scheduler import Scheduler
from kvcompress_tpu.sampling_params import SamplingParams
from kvcompress_tpu.sequence import Sequence, SequenceStatus


def mk_cfg(max_kv=4096, max_moves=1 << 14):
    model = ModelConfig(
        num_layers=2, num_heads=4, num_kv_heads=4, head_size=16,
        hidden_size=64, intermediate_size=128, vocab_size=128,
        max_model_len=4096, dtype="float32")
    return EngineConfig(
        model=model,
        cache=CacheConfig(block_size=4, cache_dtype="float32"),
        kvcompress=KVCompressConfig(
            compression_interval=1, max_kv_per_compression=max_kv,
            max_cache_moves_per_compression=max_moves),
        scheduler=SchedulerConfig(max_num_seqs=8, max_model_len=4096),
        parallel=ParallelConfig(),
    )


def mk_running(sched, rid, n_tokens, slot):
    seq = Sequence(request_id=rid,
                   prompt_token_ids=list(range(n_tokens)),
                   sampling_params=SamplingParams(
                       temperature=0.0, max_cache_tokens=8,
                       protected_window_size=4))
    seq.status = SequenceStatus.RUNNING
    seq.slot = slot
    L, H = 2, 4
    bs = 4
    seq.block_count = L * H * ((n_tokens + bs - 1) // bs)
    seq.kv_count = n_tokens * L * H
    sched.running.append(seq)
    return seq


def test_oversized_sequence_skipped_not_blocking():
    """workspace cap: 1 seq * L * H * nb * bs must fit; the 2000-token
    sequence alone needs 2*4*500*4 = 16000 > 4096, so it can never
    compress - but the 96-token sequence behind it MUST still batch
    (the old `break` livelocked compression engine-wide)."""
    sched = Scheduler(mk_cfg(max_kv=4096), num_blocks=4096)
    big = mk_running(sched, "big", 2000, slot=0)
    small = mk_running(sched, "small", 96, slot=1)
    big.iters_since_compression = 100  # sorts first (stalest)

    batch = sched.schedule_compression(force=True)
    assert batch is not None, "oversized head-of-line blocked compression"
    assert batch.seqs == [small]
    # and repeatedly: the big one keeps getting skipped, never blocks
    small.compressed = False
    small.iters_since_compression = 1
    small.kv_count = 96 * 2 * 4
    batch2 = sched.schedule_compression(force=True)
    assert batch2 is not None and batch2.seqs == [small]


def test_moves_cap_uses_true_upper_bound():
    """eb*bs is an upper bound on compaction moves (moves <= holes <=
    evicted); the old min(eb*bs, kv_count - eb*bs) estimate could admit
    batches whose real moves exceed the cap (silently truncated on
    device -> corruption)."""
    cfg = mk_cfg(max_kv=1 << 20, max_moves=50)
    sched = Scheduler(cfg, num_blocks=4096)
    s = mk_running(sched, "s", 200, slot=0)
    eb = sched._seq_evict_blocks(s)
    # the tight estimate (survivors + hanging slack) exceeds the cap
    slack = 2 * 4 * 3
    assert min(eb * 4, s.kv_count - eb * 4 + slack) > 50
    batch = sched.schedule_compression(force=True)
    # partial eviction: the block budget is clamped so eb*bs fits the cap
    assert batch is not None
    assert batch.evict_blocks[0] * 4 <= 50
    assert batch.evict_blocks[0] < eb


def test_next_prefill_oversized_queue_no_recursion():
    sched = Scheduler(mk_cfg(), num_blocks=4096)
    for i in range(2000):
        seq = Sequence(request_id=str(i),
                       prompt_token_ids=[0] * 5000,
                       sampling_params=SamplingParams())
        sched.waiting.append(seq)
    ok = Sequence(request_id="ok", prompt_token_ids=[1, 2, 3],
                  sampling_params=SamplingParams())
    sched.waiting.append(ok)
    got = sched.next_prefill()  # old recursion: RecursionError at ~1000
    assert got is ok
    assert all(s.status == SequenceStatus.FINISHED_ABORTED
               for s in [])  # aborted ones were popped
