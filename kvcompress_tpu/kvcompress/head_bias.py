"""Per-head eviction-metric bias loading
(reference vllm/kvcompress/metrics.py:17-81 KVHeadBias + _load_kv_head_bias).

File format: npz/safetensors with `bias [L, H, num_bins]` and
`pos_bins [num_bins]`; bias is added to each KV's metric (weighted) before
the eviction sort, binned by the KV's token position.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_BIAS_KEY = "bias"
_POSITION_RANGE_KEY = "pos_bins"


@dataclasses.dataclass
class KVHeadBias:
    bias: jax.Array           # [L, H, num_bins] f32
    position_bins: jax.Array  # [num_bins] i32


def load_kv_head_bias(path: str) -> KVHeadBias:
    ext = path.split(".")[-1]
    if ext == "npz":
        f = np.load(path)
        bias, bins = f[_BIAS_KEY], f[_POSITION_RANGE_KEY]
    elif ext == "safetensors":
        from safetensors import safe_open
        with safe_open(path, framework="np") as f:
            bias = f.get_tensor(_BIAS_KEY)
            bins = f.get_tensor(_POSITION_RANGE_KEY)
    else:
        raise ValueError(f"unsupported kv head bias format: {ext}")
    return KVHeadBias(
        bias=jnp.asarray(bias, jnp.float32),
        position_bins=jnp.asarray(bins, jnp.int32),
    )
