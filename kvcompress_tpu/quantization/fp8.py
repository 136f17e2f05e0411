"""Weight-only FP8 (e4m3) quantization.

The TPU-native counterpart of the reference's fp8 weight path
(vllm/model_executor/layers/quantization/fbgemm_fp8.py / fp8.py) used by
its Llama-3.1-70B-FP8 flagship benchmark
(benchmarks/scripts/benchmark_llama3_70b.sh). Same wire format as the int8
path (quantization/int8.py): a quantized weight `name` becomes
  name_q8    float8_e4m3fn, same shape
  name_scale f32, per-output-channel
so every consumer (models/decoder.py matmuls, parallel/mesh.py sharding
specs) works unchanged - the dequant convert fuses into the MXU operand
stream and weight HBM traffic halves vs bf16, which is what makes 70B fit
and serve on a v5e-8 slice (see experiments/run_70b_feasibility.py).

e4m3 has ~2 decimal digits of mantissa; per-channel scaling to the +-448
finite range keeps round-trip error ~0.3% RMS, comparable to the int8
path's 1/127 step.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional

import jax.numpy as jnp

from kvcompress_tpu.quantization.int8 import _DEFAULT_TARGETS, _TOP_TARGETS

FP8_MAX = 448.0  # largest finite float8_e4m3fn


def _quantize(w, axis: int) -> tuple:
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / FP8_MAX
    q = (wf / scale).astype(jnp.float8_e4m3fn)
    return q, scale.astype(jnp.float32)


def quantize_params(params: Dict[str, Any],
                    targets: Optional[Iterable[str]] = None,
                    quantize_embeddings: bool = True) -> Dict[str, Any]:
    """Return a new param pytree with target weights fp8-quantized (same
    leaf naming as the int8 path)."""
    targets = set(targets or _DEFAULT_TARGETS)
    out = dict(params)
    layers = dict(params["layers"])
    for name in list(layers):
        if name in targets:
            q, s = _quantize(layers[name], axis=-2)  # per out-channel
            del layers[name]
            layers[f"{name}_q8"] = q
            layers[f"{name}_scale"] = s
    out["layers"] = layers
    if quantize_embeddings:
        for name in _TOP_TARGETS:
            if name in out:
                q, s = _quantize(out[name], axis=-1)  # per vocab row
                del out[name]
                out[f"{name}_q8"] = q
                out[f"{name}_scale"] = s
    return out
