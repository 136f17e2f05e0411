"""Llama-family entry points (compatibility shim).

The Llama family (the reference's KVC-blessed architecture,
vllm/model_executor/models/llama.py) is now one configuration of the generic
config-driven decoder in models/decoder.py, which covers the full model zoo.
This module re-exports the generic entry points under their original names so
engine code and tests keep one import path for the flagship model.
"""

from kvcompress_tpu.models.decoder import (  # noqa: F401
    AttentionSpec,
    KVCache,
    apply_rope,
    attn_scale,
    compute_logits,
    decode,
    decode_fused,
    forward,
    forward_collect,
    init_llama_params,
    init_params,
    precompute_rope,
    prefill,
)
from kvcompress_tpu.models.decoder import _norm as _norm  # noqa: F401


def rms_norm(x, w, eps):
    """Legacy helper used by older tests: plain RMSNorm."""
    import jax
    import jax.numpy as jnp
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w
