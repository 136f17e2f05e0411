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
    # completions: logprobs is an int; chat: logprobs is a bool gated by
    # top_logprobs (reference openai/protocol.py)
    logprobs = req.get("logprobs")
    if isinstance(logprobs, bool):
        logprobs = _get(req, "top_logprobs", 0) if logprobs else None
    logit_bias = req.get("logit_bias")
    if logit_bias:
        logit_bias = {int(k): float(v) for k, v in logit_bias.items()}
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
        logprobs=logprobs,
        logit_bias=logit_bias,
        skip_special_tokens=_get(req, "skip_special_tokens", True),
        # --- guided decoding ---
        guided_regex=req.get("guided_regex"),
        guided_choice=req.get("guided_choice"),
        guided_json=(req.get("guided_json")
                     if req.get("guided_json") is not None
                     else (True if (req.get("response_format") or {}).get(
                         "type") == "json_object" else None)),
        # --- KV-Compress extensions ---
        protected_window_size=_get(req, "protected_window_size", 32),
        metric_collection_buffer_size=_get(
            req, "metric_collection_buffer_size", 0),
        compress_once=_get(req, "compress_once", False),
        max_cache_tokens=_get(req, "max_cache_tokens", -1),
        target_compression_rate=_get(req, "target_compression_rate", 1.0),
    )


def _completion_logprobs(o, tokenizer=None) -> Optional[dict]:
    """OpenAI completions logprobs block from per-token {id: lp} dicts."""
    if not o.logprobs:
        return None
    toks, tlps, tops = [], [], []
    for tok_id, entry in zip(o.token_ids, o.logprobs):
        text = (tokenizer.decode([tok_id]) if tokenizer is not None
                else str(tok_id))
        toks.append(text)
        tlps.append(entry.get(tok_id))
        if tokenizer is not None:
            tops.append({tokenizer.decode([t]): lp
                         for t, lp in entry.items()})
        else:
            tops.append({str(t): lp for t, lp in entry.items()})
    return {"tokens": toks, "token_logprobs": tlps, "top_logprobs": tops,
            "text_offset": []}


def _chat_logprobs(o, tokenizer=None) -> Optional[dict]:
    if not o.logprobs:
        return None
    content = []
    for tok_id, entry in zip(o.token_ids, o.logprobs):
        text = (tokenizer.decode([tok_id]) if tokenizer is not None
                else str(tok_id))
        content.append({
            "token": text,
            "logprob": entry.get(tok_id),
            "top_logprobs": [
                {"token": (tokenizer.decode([t]) if tokenizer is not None
                           else str(t)), "logprob": lp}
                for t, lp in entry.items()],
        })
    return {"content": content}


def completion_response(model: str, prompt_tokens: int, outputs,
                        tokenizer=None) -> dict:
    return {
        "id": f"cmpl-{uuid.uuid4().hex}",
        "object": "text_completion",
        "created": int(time.time()),
        "model": model,
        "choices": [
            {
                "index": i,
                "text": o.text,
                "logprobs": _completion_logprobs(o, tokenizer),
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


def chat_response(model: str, prompt_tokens: int, outputs,
                  tokenizer=None) -> dict:
    return {
        "id": f"chatcmpl-{uuid.uuid4().hex}",
        "object": "chat.completion",
        "created": int(time.time()),
        "model": model,
        "choices": [
            {
                "index": i,
                "message": {"role": "assistant", "content": o.text},
                "logprobs": _chat_logprobs(o, tokenizer),
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


def completion_chunk(rid: str, model: str, text_delta: str,
                     finish_reason=None) -> dict:
    return {
        "id": rid, "object": "text_completion",
        "created": int(time.time()), "model": model,
        "choices": [{"index": 0, "text": text_delta, "logprobs": None,
                     "finish_reason": finish_reason}],
    }


def chat_chunk(rid: str, model: str, content_delta: Optional[str],
               role: Optional[str] = None, finish_reason=None) -> dict:
    delta: Dict[str, Any] = {}
    if role is not None:
        delta["role"] = role
    if content_delta:
        delta["content"] = content_delta
    return {
        "id": rid, "object": "chat.completion.chunk",
        "created": int(time.time()), "model": model,
        "choices": [{"index": 0, "delta": delta,
                     "finish_reason": finish_reason}],
    }
