"""OpenAI-compatible HTTP server (stdlib-only: http.server + threads).

The serving surface of reference vllm/entrypoints/openai/api_server.py:
/v1/completions, /v1/chat/completions (both with SSE streaming, logprobs,
logit_bias), /v1/models, /health, /metrics (Prometheus), /tokenize,
/detokenize — with the KV-Compress per-request fields accepted on both
completion endpoints."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

from kvcompress_tpu.engine.async_engine import AsyncEngine
from kvcompress_tpu.entrypoints.openai import protocol as proto


def _apply_chat_template(tokenizer, messages) -> str:
    if hasattr(tokenizer, "apply_chat_template") and getattr(
            tokenizer, "chat_template", None):
        return tokenizer.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True)
    # fallback: simple role-tagged concatenation
    parts = [f"{m['role']}: {m['content']}" for m in messages]
    parts.append("assistant:")
    return "\n".join(parts)


class OpenAIServer:
    def __init__(self, engine=None, model_name: str = "model", llm=None,
                 rpc=None, tokenizer=None):
        """llm: the entrypoints.llm.LLM wrapper, when available - enables
        image content parts in /v1/chat/completions (reference
        entrypoints/chat_utils.py parse_image; base64 data URLs only:
        this deployment is zero-egress, remote image fetch is rejected
        loudly rather than hanging).

        rpc: an entrypoints.openai.rpc.RPCEngineClient in place of the
        in-process engine (reference api_server.py:97-130 RPC mode): the
        engine runs in its own process; this front-end keeps only the
        tokenizer (pass it explicitly) and proxies metrics/embeddings
        over the socket."""
        self.rpc = rpc
        if rpc is not None:
            assert engine is None, "pass either engine or rpc, not both"
            self.async_engine = rpc
            self.engine = None
            self.tokenizer = tokenizer
        else:
            self.async_engine = AsyncEngine(engine)
            self.engine = engine
            self.tokenizer = engine.tokenizer
        self.model_name = model_name
        self.llm = llm
        self._image_processor = None
        self._httpd: Optional[ThreadingHTTPServer] = None

    # ------------------------------------------------------------ handlers
    def handle(self, method: str, path: str,
               body: Optional[Dict[str, Any]]) -> tuple:
        try:
            if method == "GET" and path == "/health":
                return 200, {"status": "ok"}
            if method == "GET" and path == "/v1/models":
                return 200, {"object": "list", "data": [{
                    "id": self.model_name, "object": "model",
                    "created": 0, "owned_by": "kvcompress-tpu"}]}
            if method == "GET" and path == "/metrics":
                if self.rpc is not None:
                    return 200, self.rpc.metrics_text()
                return 200, self.engine.stats.prometheus()
            if method == "POST" and path == "/v1/completions":
                return self._completions(body)
            if method == "POST" and path == "/v1/chat/completions":
                return self._chat(body)
            if method == "POST" and path == "/v1/embeddings":
                return self._embeddings(body)
            if method == "POST" and path == "/generate":
                return self._generate(dict(body))
            if method == "POST" and path == "/tokenize":
                ids = self.tokenizer.encode(body["prompt"])
                return 200, {"tokens": ids, "count": len(ids)}
            if method == "POST" and path == "/detokenize":
                return 200, {"prompt": self.tokenizer.decode(body["tokens"])}
            return 404, proto.error_response("not found", 404)
        except (KeyError, ValueError, TypeError) as e:
            return 400, proto.error_response(str(e))

    def _completions(self, body: Dict[str, Any]) -> tuple:
        prompt = body.get("prompt")
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
            ids, text = prompt, None
        else:
            if isinstance(prompt, list):
                prompt = prompt[0]
            text, ids = prompt, None
        if body.get("n", 1) != 1 or body.get("best_of", 1) != 1:
            return 400, proto.error_response(
                "n>1 / best_of are unsupported with KV-Compress "
                "(single-sequence groups only, as in the reference)")
        sp = proto.sampling_params_from_request(body)
        if body.get("stream"):
            stream = self.async_engine.submit(text, ids, sp)
            return 200, ("sse", self._sse_completion(stream))
        out = self.async_engine.generate(text, ids, sp)
        n_prompt = len(out.prompt_token_ids)
        return 200, proto.completion_response(self.model_name, n_prompt,
                                              out.outputs, self.tokenizer)

    def _generate(self, body: Dict[str, Any]) -> tuple:
        """Legacy demo endpoint (reference vllm/entrypoints/api_server.py:
        40-88): {"prompt", "stream", **SamplingParams} -> {"text":
        [prompt + completion]}; streaming emits NUL-terminated JSON
        snapshots of the full text so far, as the reference does."""
        prompt = body.pop("prompt")
        stream = body.pop("stream", False)
        if isinstance(prompt, list) and prompt and isinstance(
                prompt[0], int):
            text, ids = None, prompt
        else:
            text, ids = prompt, None
        sp = proto.sampling_params_from_request(body)
        if stream:
            rs = self.async_engine.submit(text, ids, sp)

            def gen():
                for out in rs:
                    full = [(out.prompt or "") + o.text
                            for o in out.outputs]
                    yield (json.dumps({"text": full}) + "\0").encode()
                # the iterator ends on error too (bad request failing in
                # the loop thread, or a dead engine); without this the
                # client would see HTTP 200 with an empty/truncated body
                # and no indication anything went wrong
                err = rs.error or (self.async_engine.errored
                                   if rs.finished is None else None)
                if err is not None:
                    yield (json.dumps({"error": str(err)})
                           + "\0").encode()
            return 200, ("raw", gen())
        out = self.async_engine.generate(text, ids, sp)
        return 200, {"text": [(out.prompt or "") + o.text
                              for o in out.outputs]}

    def _sse_completion(self, stream):
        import uuid
        rid = f"cmpl-{uuid.uuid4().hex}"
        sent = 0
        for out in stream:
            o = out.outputs[0]
            delta = o.text[sent:]
            if delta or out.finished:
                sent = len(o.text)
                yield proto.completion_chunk(
                    rid, self.model_name, delta,
                    o.finish_reason if out.finished else None)
        # same failure surface as the legacy path: a stream that ends
        # without finishing (bad request / dead engine) must not look
        # like a clean completion
        err = stream.error or (self.async_engine.errored
                               if stream.finished is None else None)
        if err is not None:
            yield {"error": {"message": str(err),
                             "type": "internal_error"}}

    def _embeddings(self, body: Dict[str, Any]) -> tuple:
        import numpy as np
        inputs = body["input"]
        if isinstance(inputs, str):
            inputs = [inputs]
        data = []
        total_tokens = 0
        for i, text in enumerate(inputs):
            ids = (text if isinstance(text, list)
                   else self.tokenizer.encode(text))
            total_tokens += len(ids)
            if self.rpc is not None:
                vec = self.rpc.embed(ids)
            else:
                vec = np.asarray(self.engine.programs.embed(
                    np.asarray(ids, np.int32), len(ids))).tolist()
            data.append({"object": "embedding", "index": i,
                         "embedding": vec})
        return 200, {"object": "list", "data": data,
                     "model": self.model_name,
                     "usage": {"prompt_tokens": total_tokens,
                               "total_tokens": total_tokens}}

    def _decode_data_url(self, url: str):
        """data:image/...;base64,<payload> -> PIL image. Remote URLs are
        rejected (zero-egress deployment; the reference fetches them -
        entrypoints/chat_utils.py get_and_parse_image)."""
        import base64
        import io
        if not url.startswith("data:"):
            raise ValueError(
                "only base64 data URLs are supported for image_url "
                "(this deployment cannot fetch remote images)")
        payload = url.split(",", 1)[1]
        from PIL import Image
        return Image.open(io.BytesIO(base64.b64decode(payload))).convert(
            "RGB")

    def _chat_multimodal(self, messages):
        """Flatten OpenAI content-part messages: text parts concatenate,
        image_url parts become one <image-token> literal in the text and
        a CLIP/SigLIP-processed pixel tensor in mm data (reference
        chat_utils.py _parse_chat_message_content_parts)."""
        images = []
        placeholder = None
        flat = []
        for m in messages:
            content = m.get("content")
            if not isinstance(content, list):
                flat.append(m)
                continue
            pieces = []
            for part in content:
                if part.get("type") == "text":
                    pieces.append(part["text"])
                elif part.get("type") == "image_url":
                    if self.llm is None or self.llm._vision is None:
                        raise ValueError(
                            "this model has no vision tower; image "
                            "content parts are not supported")
                    if placeholder is None:
                        placeholder = self.tokenizer.decode(
                            [self.engine.cfg.model.image_token_index])
                    images.append(self._decode_data_url(
                        part["image_url"]["url"]))
                    pieces.append(placeholder)
                else:
                    raise ValueError(
                        f"unsupported content part type "
                        f"{part.get('type')!r}")
            flat.append({**m, "content": " ".join(pieces)})
        return flat, images

    def _process_images(self, images):
        """PIL images -> model pixel tensor via the checkpoint's HF image
        processor; -> (token ids transform) happens in LLM._encode_images."""
        if self._image_processor is None:
            from transformers import AutoImageProcessor
            self._image_processor = AutoImageProcessor.from_pretrained(
                self.llm.model_dir)
        kind = self.llm._vision[0]
        if kind not in ("llava", "blip2", "paligemma", "internvl",
                        "minicpmv", "chameleon"):
            raise ValueError(
                f"server-side image input is not wired for the "
                f"{kind!r} tower's tiled/patch preprocessing; use the "
                "LLM batch API with preprocessed pixel values")
        px = self._image_processor(images=images,
                                   return_tensors="np")["pixel_values"]
        return {"image": px}

    def _chat(self, body: Dict[str, Any]) -> tuple:
        messages, images = self._chat_multimodal(body["messages"])
        prompt = _apply_chat_template(self.tokenizer, messages)
        sp = proto.sampling_params_from_request(body)
        mm_kwargs = None
        ids = None
        if images:
            ids = self.tokenizer.encode(prompt)
            ids, mm_kwargs = self.llm._encode_images(
                ids, self._process_images(images))
        if body.get("stream"):
            stream = self.async_engine.submit(prompt, ids, sp,
                                              mm_kwargs=mm_kwargs)
            return 200, ("sse", self._sse_chat(stream))
        out = self.async_engine.generate(prompt, ids, sp,
                                         mm_kwargs=mm_kwargs)
        n_prompt = len(out.prompt_token_ids)
        return 200, proto.chat_response(self.model_name, n_prompt,
                                        out.outputs, self.tokenizer)

    def _sse_chat(self, stream):
        import uuid
        rid = f"chatcmpl-{uuid.uuid4().hex}"
        sent = 0
        first = True
        for out in stream:
            o = out.outputs[0]
            delta = o.text[sent:]
            if delta or out.finished:
                sent = len(o.text)
                yield proto.chat_chunk(
                    rid, self.model_name, delta,
                    role="assistant" if first else None,
                    finish_reason=o.finish_reason if out.finished else None)
                first = False
        err = stream.error or (self.async_engine.errored
                               if stream.finished is None else None)
        if err is not None:
            yield {"error": {"message": str(err),
                             "type": "internal_error"}}

    # --------------------------------------------------------------- serve
    def serve(self, host: str = "0.0.0.0", port: int = 8000,
              background: bool = False):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _respond(self, code: int, payload):
                if (isinstance(payload, tuple) and len(payload) == 2
                        and payload[0] == "raw"):
                    # legacy /generate streaming: raw byte chunks, no SSE
                    self.send_response(code)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    try:
                        for chunk in payload[1]:
                            self.wfile.write(chunk)
                            self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                    return
                if (isinstance(payload, tuple) and len(payload) == 2
                        and payload[0] == "sse"):
                    self.send_response(code)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.end_headers()
                    try:
                        for chunk in payload[1]:
                            self.wfile.write(
                                b"data: " + json.dumps(chunk).encode()
                                + b"\n\n")
                            self.wfile.flush()
                        self.wfile.write(b"data: [DONE]\n\n")
                        self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                    return
                if isinstance(payload, str):
                    data = payload.encode()
                    ctype = "text/plain; version=0.0.4"
                else:
                    data = json.dumps(payload).encode()
                    ctype = "application/json"
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                code, payload = server.handle("GET", self.path, None)
                self._respond(code, payload)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    body = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    self._respond(400, proto.error_response("invalid json"))
                    return
                code, payload = server.handle("POST", self.path, body)
                self._respond(code, payload)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        if background:
            t = threading.Thread(target=self._httpd.serve_forever,
                                 daemon=True)
            t.start()
            return self._httpd
        try:
            self._httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            self.async_engine.shutdown()

    def close(self):
        if self._httpd:
            self._httpd.shutdown()
        self.async_engine.shutdown()
