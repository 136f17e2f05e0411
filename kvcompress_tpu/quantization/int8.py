"""Weight-only int8 quantization (W8A16).

The TPU-native counterpart of the reference's quantization stack for this
serving path (vllm/model_executor/layers/quantization/, incl. the tpu_int8
method): per-output-channel symmetric int8 weights with f32 scales. The
matmul runs x_bf16 @ dequant(w_int8) on the MXU with the dequant convert
fused into the operand stream by XLA, halving weight HBM traffic - the
binding resource of small-batch decode.

Convention: a quantized weight `name` is stored as two leaves
  name_q8    int8, same shape as the original
  name_scale f32, per-output-channel (last axis), keepdims-broadcastable
and the original leaf is removed. models/decoder.py's matmul helpers
dequantize transparently.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional

import jax.numpy as jnp

# weights quantized by default (biases/norms stay bf16; embed/lm_head are
# quantized too - the logits matmul reads the largest single tensor)
_DEFAULT_TARGETS = (
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "w_fc1", "w_fc2",
    "experts_gate", "experts_up", "experts_down",
    "shared_gate", "shared_up", "shared_down",
)
_TOP_TARGETS = ("embed", "lm_head")


def _quantize(w) -> tuple:
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # per out-channel
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quantize_rows(w) -> tuple:
    """For [V, D] embedding-layout tensors: per-row (vocab entry) scale."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_params(params: Dict[str, Any],
                    targets: Optional[Iterable[str]] = None,
                    quantize_embeddings: bool = True) -> Dict[str, Any]:
    """Return a new param pytree with target weights int8-quantized."""
    targets = set(targets or _DEFAULT_TARGETS)
    out = dict(params)
    layers = dict(params["layers"])
    for name in list(layers):
        if name in targets:
            q, s = _quantize(layers[name])
            del layers[name]
            layers[f"{name}_q8"] = q
            layers[f"{name}_scale"] = s
    out["layers"] = layers
    if quantize_embeddings:
        for name in _TOP_TARGETS:
            if name in out:
                q, s = _quantize_rows(out[name])
                del out[name]
                out[f"{name}_q8"] = q
                out[f"{name}_scale"] = s
    return out


def mm(x, d: Dict[str, Any], name: str):
    """x @ d[name], transparently dequantizing `name_q8`/`name_scale`
    (int8/fp8 per-channel) or `name_q4` triplets (int4 grouped)."""
    q = d.get(f"{name}_q8")
    if q is None:
        if f"{name}_q4" in d:
            from kvcompress_tpu.quantization.int4 import mm as mm4
            return mm4(x, d, name)
        return x @ d[name]
    y = x @ q.astype(x.dtype)
    return y * d[f"{name}_scale"][..., 0, :].astype(x.dtype)


def row_weight(d: Dict[str, Any], name: str, dtype):
    """Dequantized [V, D] embedding-layout weight (or the original)."""
    q = d.get(f"{name}_q8")
    if q is None:
        return d.get(name)
    return (q.astype(dtype)
            * d[f"{name}_scale"].astype(dtype))


def gather_rows(d: Dict[str, Any], name: str, ids, dtype):
    """Embedding lookup with on-the-fly dequant of the gathered rows."""
    q = d.get(f"{name}_q8")
    if q is None:
        return d[name][ids]
    return q[ids].astype(dtype) * d[f"{name}_scale"][ids].astype(dtype)
