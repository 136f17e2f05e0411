"""Threaded engine front-end for online serving.

The role of reference vllm/engine/async_llm_engine.py: requests arrive
concurrently (HTTP handler threads), a single background thread drives
LLMEngine.step(), and callers wait on per-request events or consume
incremental RequestOutput streams (the engine emits an output for every
scheduled sequence each step, finished or not)."""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.sampling_params import SamplingParams
from kvcompress_tpu.sequence import RequestOutput


class RequestStream:
    """Iterable stream of RequestOutputs for one request (the last item has
    finished=True)."""

    def __init__(self, request_id: Optional[str] = None):
        self.request_id = request_id
        self.queue: "queue.Queue[Optional[RequestOutput]]" = queue.Queue()
        self.finished: Optional[RequestOutput] = None
        self.error: Optional[BaseException] = None
        self.done = threading.Event()

    def __iter__(self) -> Iterator[RequestOutput]:
        while True:
            item = self.queue.get()
            if item is None:
                return
            yield item


class EngineDeadError(RuntimeError):
    """The background engine loop crashed (reference AsyncLLMEngine
    errored/dead-engine propagation, async_llm_engine.py)."""


class AsyncEngine:
    def __init__(self, engine: LLMEngine):
        import itertools
        self.engine = engine
        self._id_counter = itertools.count()
        self._streams: Dict[str, RequestStream] = {}
        self._pending: "queue.Queue" = queue.Queue()
        self._shutdown = False
        self.errored: Optional[BaseException] = None
        self._wake = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, prompt: Optional[str], prompt_token_ids,
               sampling_params: SamplingParams,
               mm_kwargs: Optional[dict] = None) -> RequestStream:
        if self.errored is not None:
            raise EngineDeadError(
                f"engine loop crashed: {self.errored!r}") \
                from self.errored
        # assign the request id HERE so abort(stream.request_id) works
        # immediately after submit (the loop thread may not have drained
        # the add yet; an id of None would silently no-op the abort)
        rid = f"async-{next(self._id_counter)}"
        stream = RequestStream(rid)
        self._streams[rid] = stream
        self._pending.put(("add", rid, prompt, prompt_token_ids,
                           sampling_params, stream, mm_kwargs))
        self._wake.set()
        # re-check AFTER registering: if the loop died between the entry
        # check and the registration above, the death broadcast may have
        # snapshotted _streams before ours was inserted, and the stream
        # would never be finished (generate() would block forever). The
        # loop sets self.errored BEFORE snapshotting, so exactly one of
        # {broadcast, this check} always covers the stream.
        if self.errored is not None and stream.error is None:
            self._streams.pop(rid, None)
            stream.error = EngineDeadError(
                f"engine loop crashed: {self.errored!r}")
            stream.done.set()
            stream.queue.put(None)
        return stream

    def generate(self, prompt, prompt_token_ids,
                 sampling_params, mm_kwargs=None) -> RequestOutput:
        stream = self.submit(prompt, prompt_token_ids, sampling_params,
                             mm_kwargs=mm_kwargs)
        stream.done.wait()
        if stream.error is not None:
            raise stream.error
        if stream.finished is None and self.errored is not None:
            raise EngineDeadError(
                f"engine loop crashed: {self.errored!r}") \
                from self.errored
        return stream.finished

    def abort(self, request_id: str) -> None:
        # Route the abort through the loop thread: engine.abort_request
        # flushes bursts and mutates scheduler/state, which must never race
        # a step() running on the loop thread (a client disconnect can land
        # at any time). The stream is finished by the loop thread too.
        self._pending.put(("abort", request_id))
        self._wake.set()

    def shutdown(self):
        self._shutdown = True
        self._wake.set()
        self._thread.join(timeout=5)

    def _drain_pending(self):
        while True:
            try:
                item = self._pending.get_nowait()
            except queue.Empty:
                return
            if item[0] == "abort":
                rid = item[1]
                self.engine.abort_request(rid)
                stream = self._streams.pop(rid, None)
                if stream is not None:
                    stream.done.set()
                    stream.queue.put(None)
                continue
            _, rid, prompt, ids, sp, stream, mm_kwargs = item
            try:
                self.engine.add_request(rid, prompt=prompt,
                                        prompt_token_ids=ids,
                                        sampling_params=sp,
                                        **(mm_kwargs or {}))
            except Exception as e:  # noqa: BLE001
                # a BAD REQUEST (over-length prompt, invalid guided
                # schema, ...) fails ONLY its own stream - treating it as
                # an engine crash would kill every other client
                stream.error = e
                stream.done.set()
                stream.queue.put(None)
                self._streams.pop(rid, None)

    def _loop(self):
        try:
            while not self._shutdown:
                self._drain_pending()
                if not self.engine.has_unfinished_requests():
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
                    continue
                for out in self.engine.step():
                    stream = self._streams.get(out.request_id)
                    if stream is None:
                        continue
                    stream.queue.put(out)
                    if out.finished:
                        stream.finished = out
                        stream.done.set()
                        stream.queue.put(None)
                        del self._streams[out.request_id]
        except BaseException as e:  # noqa: BLE001 - propagate to callers
            self.errored = e
            for stream in list(self._streams.values()):
                stream.done.set()
                stream.queue.put(None)
            self._streams.clear()
