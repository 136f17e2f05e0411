"""Data-parallel serving: independent engine replicas over mesh slices.

The reference's data-parallel groups (vllm/distributed/parallel_state.py:
798-807 get_dp_group) exist to serve REPLICAS of the model: requests are
partitioned across copies, each copy runs its own scheduler and cache.
That is exactly what this module does in one process: `data_parallel_size`
LLMEngine replicas, each pinned to its own `tensor_parallel_size`-device
mesh slice, with least-loaded request routing in front. Decode, prefill
and compression throughput scale with dp because the replicas never
synchronize - there is no cross-replica collective at all (the weights are
read-only copies).

This is deliberately NOT slot-axis GSPMD sharding of one engine state: a
single SPMD program would replicate every prefill's compute on all data
shards and serialize scheduling decisions through one host loop; separate
replicas keep the reference's operational model (and its failure
isolation) while staying in-process.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional

import jax

from kvcompress_tpu.config import EngineConfig
from kvcompress_tpu.parallel.mesh import build_mesh


class DataParallelEngine:
    """Route requests across `data_parallel_size` LLMEngine replicas.

    Mirrors the LLMEngine surface the entrypoints use (add_request / step /
    has_unfinished_requests / abort_request), so `LLM` and the OpenAI
    server work unchanged on top."""

    def __init__(self, cfg: EngineConfig, params, *, num_blocks=None,
                 eos_token_ids=None, attn_impl: str = "auto",
                 tokenizer=None, draft=None, proposer=None):
        from kvcompress_tpu.engine.llm_engine import LLMEngine

        dp = cfg.parallel.data_parallel_size
        tp = cfg.parallel.tensor_parallel_size
        assert dp > 1, "use LLMEngine directly for data_parallel_size == 1"
        devices = jax.devices()
        if len(devices) < dp * tp:
            raise ValueError(
                f"data_parallel_size={dp} x tensor_parallel_size={tp} "
                f"needs {dp * tp} devices, have {len(devices)}")

        self.cfg = cfg
        self.replicas: List[LLMEngine] = []
        self._route: Dict[str, int] = {}  # request_id -> replica index
        self._counter = 0
        self._next_id = 0
        for r in range(dp):
            sub = devices[r * tp:(r + 1) * tp]
            mesh = build_mesh(tp, 1, devices=sub)
            rcfg = copy.copy(cfg)
            rcfg.parallel = copy.copy(cfg.parallel)
            rcfg.parallel.data_parallel_size = 1
            self.replicas.append(LLMEngine(
                rcfg, params, num_blocks=num_blocks,
                eos_token_ids=eos_token_ids, attn_impl=attn_impl,
                tokenizer=tokenizer, mesh=mesh, draft=draft,
                proposer=proposer))

    # ------------------------------------------------------------ routing
    def _pick_replica(self) -> int:
        """Least-loaded routing by live sequence count (ties broken
        round-robin so an idle fleet interleaves)."""
        loads = [(len(eng.scheduler.waiting) + len(eng.scheduler.running), i)
                 for i, eng in enumerate(self.replicas)]
        min_load = min(l for l, _ in loads)
        candidates = [i for l, i in loads if l == min_load]
        self._counter += 1
        return candidates[self._counter % len(candidates)]

    def add_request(self, request_id, **kw):
        if request_id is None:
            # replicas number requests from their OWN counters - two
            # replicas would both mint "0"; ids must be fleet-unique
            request_id = str(self._next_id)
            self._next_id += 1
        r = self._pick_replica()
        rid = self.replicas[r].add_request(request_id, **kw)
        self._route[rid] = r
        return rid

    def abort_request(self, request_id) -> None:
        # pop, not get: aborted requests often never surface a finished
        # output through step(), so the route entry would leak
        r = self._route.pop(request_id, None)
        if r is not None:
            self.replicas[r].abort_request(request_id)

    def step(self):
        outs = []
        for eng in self.replicas:
            if eng.has_unfinished_requests():
                outs.extend(eng.step())
        for o in outs:
            if o.finished:
                self._route.pop(o.request_id, None)
        return outs

    def has_unfinished_requests(self) -> bool:
        return any(e.has_unfinished_requests() for e in self.replicas)

    # ------------------------------------------------------------ stats
    @property
    def total_evicted_kvs(self) -> int:
        return sum(int(e.scheduler.total_evicted_kvs)
                   for e in self.replicas)

    @property
    def tokenizer(self):
        return self.replicas[0].tokenizer

    @property
    def programs(self):
        """Embedding mode / server surfaces reach one replica's programs
        (embeddings are read-only on the weights, any replica works)."""
        return self.replicas[0].programs

    @property
    def stats(self):
        """/metrics surface: counters and gauges summed across replicas
        into a fresh EngineStats view (histogram buckets merged too)."""
        from kvcompress_tpu.utils.metrics import EngineStats
        agg = EngineStats(prefix=self.replicas[0].stats.prefix)
        for i, e in enumerate(self.replicas):
            s = e.stats
            with s._lock:
                for k, v in s.counters.items():
                    agg.counters[k] += v
                for k, v in s.gauges.items():
                    agg.gauges[f"{k}_r{i}"] = v
                for k, h in s.histograms.items():
                    dst = agg.histograms.setdefault(k, [0] * len(h))
                    for j, c in enumerate(h):
                        dst[j] += c
                for k, v in s.hist_sum.items():
                    agg.hist_sum[k] += v
                for k, v in s.hist_count.items():
                    agg.hist_count[k] += v
        return agg
