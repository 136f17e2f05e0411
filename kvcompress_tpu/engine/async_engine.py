"""Threaded engine front-end for online serving.

The role of reference vllm/engine/async_llm_engine.py: requests arrive
concurrently (HTTP handler threads), a single background thread drives
LLMEngine.step(), and callers wait on per-request events (or consume
incremental token streams)."""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.sampling_params import SamplingParams
from kvcompress_tpu.sequence import RequestOutput


class _RequestStream:
    def __init__(self):
        self.queue: "queue.Queue[Optional[RequestOutput]]" = queue.Queue()
        self.finished: Optional[RequestOutput] = None
        self.done = threading.Event()


class AsyncEngine:
    def __init__(self, engine: LLMEngine):
        self.engine = engine
        self._streams: Dict[str, _RequestStream] = {}
        self._pending: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._shutdown = False
        self._wake = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, prompt: Optional[str], prompt_token_ids,
               sampling_params: SamplingParams) -> _RequestStream:
        stream = _RequestStream()
        self._pending.put((prompt, prompt_token_ids, sampling_params,
                           stream))
        self._wake.set()
        return stream

    def generate(self, prompt, prompt_token_ids,
                 sampling_params) -> RequestOutput:
        stream = self.submit(prompt, prompt_token_ids, sampling_params)
        stream.done.wait()
        return stream.finished

    def shutdown(self):
        self._shutdown = True
        self._wake.set()
        self._thread.join(timeout=5)

    def _drain_pending(self):
        while True:
            try:
                prompt, ids, sp, stream = self._pending.get_nowait()
            except queue.Empty:
                return
            rid = self.engine.add_request(None, prompt=prompt,
                                          prompt_token_ids=ids,
                                          sampling_params=sp)
            self._streams[rid] = stream

    def _loop(self):
        while not self._shutdown:
            self._drain_pending()
            if not self.engine.has_unfinished_requests():
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            for out in self.engine.step():
                stream = self._streams.pop(out.request_id, None)
                if stream is not None:
                    stream.finished = out
                    stream.queue.put(out)
                    stream.queue.put(None)
                    stream.done.set()
