"""Int8 KV-cache quantization helpers.

The TPU-native counterpart of the reference's quantized-cache support
(--kv-cache-dtype fp8, csrc/cache_kernels.cu convert_fp8 + the fp8 paths in
csrc/attention/). Design: symmetric per-KV int8 with an f32 scale per cached
vector, stored alongside the cache ([num_blocks, block_size] scale planes in
CacheState). Per-KV (not per-block) scales keep cache compaction exact: the
eviction gather/scatter moves (q8, scale) pairs verbatim.

Dequantization never materializes: attention folds the scale into the logit
columns (k) and the probability row (v):
    logits[:, j] = (q . k8_j) * k_scale_j * attn_scale
    out          = sum_j (p_j * v_scale_j) * v8_j
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x [..., d] -> (q8 [..., d] int8, scale [...] f32) with symmetric
    per-vector scaling (amax / 127)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_kv(q: jax.Array, scale: jax.Array) -> jax.Array:
    """(q8 [..., d], scale [...]) -> f32 [..., d]."""
    return q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)
