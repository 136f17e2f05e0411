"""Engine stats: counters / gauges / timers with a Prometheus text exposition.

Promotes the reference's print-based KVC observability
(kvcompress/scheduler.py:540-544, metrics.py:797-799) plus the Prometheus
stat loggers (vllm/engine/metrics.py:30-196) into one dependency-free
registry: evicted KVs, compression rounds, preemptions, token throughput,
step latency histograms.
"""

from __future__ import annotations

import collections
import threading
import time
from typing import Dict, List


_BUCKETS = (0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0,
            2.5, 5.0, 10.0)


class EngineStats:
    def __init__(self, prefix: str = "kvc"):
        self.prefix = prefix
        self._lock = threading.Lock()
        self.counters: Dict[str, float] = collections.defaultdict(float)
        self.gauges: Dict[str, float] = {}
        self.histograms: Dict[str, List[int]] = {}
        self.hist_sum: Dict[str, float] = collections.defaultdict(float)
        self.hist_count: Dict[str, int] = collections.defaultdict(int)
        self.start_time = time.monotonic()

    def counter(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self.counters[name] += value

    def gauge(self, name: str, value: float) -> None:
        with self._lock:
            self.gauges[name] = value

    def timer(self, name: str, seconds: float) -> None:
        with self._lock:
            h = self.histograms.setdefault(name, [0] * (len(_BUCKETS) + 1))
            for i, b in enumerate(_BUCKETS):
                if seconds <= b:
                    h[i] += 1
                    break
            else:
                h[-1] += 1
            self.hist_sum[name] += seconds
            self.hist_count[name] += 1

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counters": dict(self.counters),
                "gauges": dict(self.gauges),
                "uptime_seconds": time.monotonic() - self.start_time,
            }

    def prometheus(self) -> str:
        """Render in Prometheus text exposition format."""
        lines = []
        with self._lock:
            for name, v in sorted(self.counters.items()):
                m = f"{self.prefix}_{name}_total"
                lines.append(f"# TYPE {m} counter")
                lines.append(f"{m} {v}")
            for name, v in sorted(self.gauges.items()):
                m = f"{self.prefix}_{name}"
                lines.append(f"# TYPE {m} gauge")
                lines.append(f"{m} {v}")
            for name, h in sorted(self.histograms.items()):
                m = f"{self.prefix}_{name}"
                lines.append(f"# TYPE {m} histogram")
                cum = 0
                for i, b in enumerate(_BUCKETS):
                    cum += h[i]
                    lines.append(f'{m}_bucket{{le="{b}"}} {cum}')
                cum += h[-1]
                lines.append(f'{m}_bucket{{le="+Inf"}} {cum}')
                lines.append(f"{m}_sum {self.hist_sum[name]}")
                lines.append(f"{m}_count {self.hist_count[name]}")
        return "\n".join(lines) + "\n"
