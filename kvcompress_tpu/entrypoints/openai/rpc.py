"""Decoupled engine front-end: the LLM engine in its OWN process, the
HTTP server talking to it over a unix-domain socket.

The role of reference vllm/entrypoints/openai/rpc/ (zmq client/server,
api_server.py:97-130 chooses in-process vs RPC): serving isolation - an
HTTP process that never blocks on device dispatch, an engine process that
never runs request parsing, and the ability to restart either side.
Transport is length-prefixed pickle over AF_UNIX (same trust boundary as
the reference's pickle-over-zmq; both ends are the same deployment).

Engine process:  serve_engine(llm_kwargs, socket_path)  - builds the LLM,
    drives an AsyncEngine, and serves any number of client connections.
Frontend:        RPCEngineClient(socket_path)  - the AsyncEngine surface
    (submit / generate / abort / errored) plus the engine-side ops the
    OpenAI server needs (metrics text, embeddings, health).

`kvc serve --rpc` wires the two together (scripts.py): it spawns the
engine process, waits for the socket, and hands the client to
OpenAIServer in place of the in-process engine.
"""

from __future__ import annotations

import os
import pickle
import queue
import socket
import struct
import threading
from typing import Any, Dict, Optional

_LEN = struct.Struct("<I")


def _send(sock: socket.socket, obj: Any) -> None:
    payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_LEN.pack(len(payload)) + payload)


def _recv(sock: socket.socket) -> Any:
    hdr = b""
    while len(hdr) < _LEN.size:
        chunk = sock.recv(_LEN.size - len(hdr))
        if not chunk:
            raise ConnectionError("rpc peer closed")
        hdr += chunk
    (n,) = _LEN.unpack(hdr)
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError("rpc peer closed")
        buf += chunk
    return pickle.loads(bytes(buf))


# --------------------------------------------------------------- server
def serve_engine(llm_kwargs: Dict[str, Any], socket_path: str,
                 ready_event=None) -> None:
    """Engine-process entry: build the LLM from kwargs, bind the socket,
    serve clients until a client sends ("shutdown",)."""
    from kvcompress_tpu.engine.async_engine import AsyncEngine
    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams  # noqa: F401

    llm = LLM(**llm_kwargs)
    engine = llm.llm_engine
    async_engine = AsyncEngine(engine)

    try:
        os.unlink(socket_path)
    except OSError:
        pass
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(socket_path)
    srv.listen(8)
    if ready_event is not None:
        ready_event.set()
    stop = threading.Event()

    def handle_client(conn: socket.socket) -> None:
        wlock = threading.Lock()

        def reply(obj):
            with wlock:
                try:
                    _send(conn, obj)
                except OSError:
                    pass

        def pump(rid, stream):
            try:
                for out in stream:
                    reply(("out", rid, out))
            finally:
                if stream.error is not None:
                    reply(("err", rid, repr(stream.error)))
                reply(("done", rid))

        try:
            while not stop.is_set():
                msg = _recv(conn)
                op = msg[0]
                if op == "submit":
                    _, rid, prompt, ids, sp, mm = msg
                    try:
                        stream = async_engine.submit(prompt, ids, sp,
                                                     mm_kwargs=mm)
                    except Exception as e:  # noqa: BLE001
                        reply(("err", rid, repr(e)))
                        reply(("done", rid))
                        continue
                    # map the server-side stream id to the client's rid
                    threading.Thread(target=pump, args=(rid, stream),
                                     daemon=True).start()
                    reply(("accepted", rid, stream.request_id))
                elif op == "abort":
                    async_engine.abort(msg[1])
                    reply(("ok", msg[1]))
                elif op == "health":
                    err = async_engine.errored
                    reply(("health", None if err is None else repr(err)))
                elif op == "metrics":
                    reply(("metrics", engine.stats.prometheus()))
                elif op == "embed":
                    import numpy as np
                    ids = np.asarray(msg[1], np.int32)
                    emb = engine.programs.embed(ids, len(ids))
                    reply(("embed", np.asarray(emb).tolist()))
                elif op == "shutdown":
                    reply(("ok", None))
                    stop.set()
                else:
                    reply(("err", None, f"unknown rpc op {op!r}"))
        except (ConnectionError, EOFError):
            pass

    def accept_loop():
        while not stop.is_set():
            srv.settimeout(0.5)
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            threading.Thread(target=handle_client, args=(conn,),
                             daemon=True).start()

    accept_loop()
    async_engine.shutdown()
    srv.close()
    try:
        os.unlink(socket_path)
    except OSError:
        pass


# --------------------------------------------------------------- client
class RPCStream:
    """Client-side mirror of async_engine.RequestStream."""

    def __init__(self, request_id: str):
        self.request_id = request_id
        self.queue: "queue.Queue" = queue.Queue()
        self.finished = None
        self.error: Optional[BaseException] = None
        self.done = threading.Event()

    def __iter__(self):
        while True:
            item = self.queue.get()
            if item is None:
                return
            yield item


class RPCEngineClient:
    """AsyncEngine-compatible surface over the unix socket."""

    def __init__(self, socket_path: str, connect_timeout: float = 60.0):
        import itertools
        import time
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        deadline = time.monotonic() + connect_timeout
        while True:
            try:
                self._sock.connect(socket_path)
                break
            except OSError:
                if time.monotonic() > deadline:
                    raise
                time.sleep(0.2)
        self._ids = itertools.count()
        self._streams: Dict[str, RPCStream] = {}
        self._replies: "queue.Queue" = queue.Queue()
        self._wlock = threading.Lock()
        self.errored: Optional[BaseException] = None
        self._reader = threading.Thread(target=self._read_loop,
                                        daemon=True)
        self._reader.start()

    # --------------------------------------------------------- plumbing
    def _read_loop(self):
        try:
            while True:
                msg = _recv(self._sock)
                kind = msg[0]
                if kind == "out":
                    _, rid, out = msg
                    s = self._streams.get(rid)
                    if s is not None:
                        s.queue.put(out)
                        if out.finished:
                            s.finished = out
                elif kind == "err":
                    _, rid, err = msg
                    s = self._streams.get(rid)
                    if s is not None:
                        s.error = RuntimeError(err)
                elif kind == "done":
                    _, rid = msg
                    s = self._streams.pop(rid, None)
                    if s is not None:
                        s.done.set()
                        s.queue.put(None)
                else:
                    self._replies.put(msg)
        except (ConnectionError, EOFError, OSError) as e:
            self.errored = e
            for s in list(self._streams.values()):
                s.error = s.error or e
                s.done.set()
                s.queue.put(None)
            self._streams.clear()

    def _call(self, *msg, expect: str):
        with self._wlock:
            _send(self._sock, msg)
        while True:
            reply = self._replies.get(timeout=120)
            if reply[0] == expect or reply[0] in ("err",):
                return reply

    # ---------------------------------------------------- engine surface
    def submit(self, prompt, prompt_token_ids, sampling_params,
               mm_kwargs=None) -> RPCStream:
        if self.errored is not None:
            raise RuntimeError(f"rpc engine lost: {self.errored!r}")
        rid = f"rpc-{next(self._ids)}"
        stream = RPCStream(rid)
        self._streams[rid] = stream
        with self._wlock:
            _send(self._sock, ("submit", rid, prompt, prompt_token_ids,
                               sampling_params, mm_kwargs))
        return stream

    def generate(self, prompt, prompt_token_ids, sampling_params,
                 mm_kwargs=None):
        stream = self.submit(prompt, prompt_token_ids, sampling_params,
                             mm_kwargs=mm_kwargs)
        stream.done.wait()
        if stream.error is not None:
            raise stream.error
        if stream.finished is None:
            raise RuntimeError(
                f"rpc engine lost mid-request: {self.errored!r}")
        return stream.finished

    def abort(self, request_id: str) -> None:
        with self._wlock:
            _send(self._sock, ("abort", request_id))

    def metrics_text(self) -> str:
        return self._call("metrics", expect="metrics")[1]

    def embed(self, ids):
        reply = self._call("embed", list(ids), expect="embed")
        if reply[0] == "err":
            raise RuntimeError(reply[2])
        return reply[1]

    def health(self) -> Optional[str]:
        return self._call("health", expect="health")[1]

    def shutdown(self) -> None:
        try:
            with self._wlock:
                _send(self._sock, ("shutdown",))
        except OSError:
            pass
        self._sock.close()


def spawn_engine_process(llm_kwargs: Dict[str, Any],
                         socket_path: Optional[str] = None):
    """Start the engine in a fresh spawned process; returns
    (process, socket_path). The caller connects an RPCEngineClient once
    the socket appears (the client retries while connecting)."""
    import multiprocessing as mp
    import tempfile
    if socket_path is None:
        socket_path = os.path.join(
            tempfile.mkdtemp(prefix="kvc_rpc_"), "engine.sock")
    ctx = mp.get_context("spawn")  # never fork live JAX state
    proc = ctx.Process(target=serve_engine,
                       args=(llm_kwargs, socket_path), daemon=True)
    proc.start()
    return proc, socket_path
