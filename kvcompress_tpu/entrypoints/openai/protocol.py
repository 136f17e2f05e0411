"""OpenAI-compatible request/response schemas (dependency-free).

Mirrors the fields of reference vllm/entrypoints/openai/protocol.py,
including the KV-Compress per-request extensions
(max_cache_tokens / protected_window_size / compress_once,
protocol.py:271-281 for chat, :534-544 for completions) and their mapping
into SamplingParams (:337-339, :601-603)."""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Optional

from kvcompress_tpu.sampling_params import SamplingParams


def _get(d: Dict[str, Any], key: str, default):
    v = d.get(key, default)
    return default if v is None else v


def sampling_params_from_request(req: Dict[str, Any],
                                 default_max_tokens: int = 16
                                 ) -> SamplingParams:
    stop = req.get("stop")
    if isinstance(stop, str):
        stop = [stop]
    return SamplingParams(
        n=_get(req, "n", 1),
        temperature=_get(req, "temperature", 1.0),
        top_p=_get(req, "top_p", 1.0),
        top_k=_get(req, "top_k", -1),
        min_p=_get(req, "min_p", 0.0),
        presence_penalty=_get(req, "presence_penalty", 0.0),
        frequency_penalty=_get(req, "frequency_penalty", 0.0),
        repetition_penalty=_get(req, "repetition_penalty", 1.0),
        seed=req.get("seed"),
        stop=stop,
        stop_token_ids=req.get("stop_token_ids"),
        ignore_eos=_get(req, "ignore_eos", False),
        max_tokens=_get(req, "max_tokens", default_max_tokens),
        min_tokens=_get(req, "min_tokens", 0),
        skip_special_tokens=_get(req, "skip_special_tokens", True),
        # --- KV-Compress extensions ---
        protected_window_size=_get(req, "protected_window_size", 32),
        metric_collection_buffer_size=_get(
            req, "metric_collection_buffer_size", 0),
        compress_once=_get(req, "compress_once", False),
        max_cache_tokens=_get(req, "max_cache_tokens", -1),
        target_compression_rate=_get(req, "target_compression_rate", 1.0),
    )


def completion_response(model: str, prompt_tokens: int, outputs) -> dict:
    return {
        "id": f"cmpl-{uuid.uuid4().hex}",
        "object": "text_completion",
        "created": int(time.time()),
        "model": model,
        "choices": [
            {
                "index": i,
                "text": o.text,
                "logprobs": None,
                "finish_reason": o.finish_reason,
            } for i, o in enumerate(outputs)
        ],
        "usage": {
            "prompt_tokens": prompt_tokens,
            "completion_tokens": sum(len(o.token_ids) for o in outputs),
            "total_tokens": prompt_tokens + sum(
                len(o.token_ids) for o in outputs),
        },
    }


def chat_response(model: str, prompt_tokens: int, outputs) -> dict:
    return {
        "id": f"chatcmpl-{uuid.uuid4().hex}",
        "object": "chat.completion",
        "created": int(time.time()),
        "model": model,
        "choices": [
            {
                "index": i,
                "message": {"role": "assistant", "content": o.text},
                "finish_reason": o.finish_reason,
            } for i, o in enumerate(outputs)
        ],
        "usage": {
            "prompt_tokens": prompt_tokens,
            "completion_tokens": sum(len(o.token_ids) for o in outputs),
            "total_tokens": prompt_tokens + sum(
                len(o.token_ids) for o in outputs),
        },
    }


def error_response(message: str, code: int = 400) -> dict:
    return {"error": {"message": message, "type": "invalid_request_error",
                      "code": code}}
