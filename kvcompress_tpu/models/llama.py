"""Llama-family model (functional JAX), the KVC-blessed architecture.

Mirrors the capability of reference vllm/model_executor/models/llama.py
(per-layer attn_metadata.set_layer(i) + unified cache get_layer(i),
reference llama.py:328-336) with a TPU-native structure:

- Parameters are a pytree with layer weights stacked on a leading [L] axis;
  the forward pass is a single jax.lax.scan over layers so the program is
  traced once regardless of depth.
- The unified paged cache (k, v, metrics, positions) is threaded through the
  scan carry; per-layer block-table slices / slot mappings ride as scan xs.
- Weights matmuls run in bfloat16 on the MXU; softmax/rmsnorm accumulate in
  float32.

Covers Llama 2/3/3.1, and via config knobs the Mistral, Qwen2 (qkv bias) and
TinyLlama variants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kvcompress_tpu.config import ModelConfig
from kvcompress_tpu.ops import attention as att


class KVCache(NamedTuple):
    """The slice of CacheState the model forward reads/writes."""
    k: jax.Array           # [num_blocks, block_size, head_size]
    v: jax.Array
    metrics: jax.Array     # [num_blocks, block_size] f32
    positions: jax.Array   # [num_blocks, block_size] i32


@dataclasses.dataclass(frozen=True)
class AttentionSpec:
    """Static per-call attention configuration."""
    mode: str                 # "prefill" | "decode"
    use_l2: bool = True
    use_average: bool = False
    use_maxpool: bool = True
    record_metrics: bool = True
    metric_window: int = 32
    metric_block: int = 1024
    impl: str = "xla"         # "xla" | "pallas"


def precompute_rope(cfg: ModelConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """RoPE cos/sin for given positions. Supports llama3-style rope scaling
    (matching HF transformers' `rope_type: llama3`)."""
    d = cfg.head_size
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2) / d))
    rs = cfg.rope_scaling or {}
    if rs.get("rope_type", rs.get("type")) == "llama3":
        factor = rs["factor"]
        low = rs["low_freq_factor"]
        high = rs["high_freq_factor"]
        old_len = rs["original_max_position_embeddings"]
        wavelen = 2 * np.pi / inv_freq
        inv_freq_l = np.where(wavelen > old_len / low, inv_freq / factor,
                              inv_freq)
        smooth = (old_len / wavelen - low) / (high - low)
        smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        is_mid = (wavelen <= old_len / low) & (wavelen >= old_len / high)
        inv_freq = np.where(is_mid, smoothed, inv_freq_l)
    inv_freq = jnp.asarray(inv_freq, jnp.float32)
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [T, H, d]; neox-style rotate-half (matches HF Llama)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    c = cos[:, None, :].astype(jnp.float32)
    s = sin[:, None, :].astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate([x1f * c - x2f * s, x2f * c + x1f * s], axis=-1)
    return out.astype(x.dtype)


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def init_llama_params(cfg: ModelConfig, seed: int = 0,
                      dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Random-initialised parameters (tests / benchmarks), generated on
    device (host RNG is far too slow for billion-parameter shapes)."""
    key = jax.random.PRNGKey(seed)
    keys = iter(jax.random.split(key, 16))
    D, L = cfg.hidden_size, cfg.num_layers
    Hq, Hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
    I, V = cfg.intermediate_size, cfg.vocab_size

    def w(*shape, scale=None):
        scale = scale or (shape[-2] ** -0.5 if len(shape) > 1 else 0.02)
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * scale).astype(dtype)

    params = {
        "embed": w(V, D, scale=0.02),
        "final_norm": jnp.ones((D,), dtype),
        "layers": {
            "input_norm": jnp.ones((L, D), dtype),
            "post_attn_norm": jnp.ones((L, D), dtype),
            "wq": w(L, D, Hq * d),
            "wk": w(L, D, Hkv * d),
            "wv": w(L, D, Hkv * d),
            "wo": w(L, Hq * d, D),
            "w_gate": w(L, D, I),
            "w_up": w(L, D, I),
            "w_down": w(L, I, D),
        },
    }
    if cfg.qkv_bias:
        params["layers"]["bq"] = jnp.zeros((L, Hq * d), dtype)
        params["layers"]["bk"] = jnp.zeros((L, Hkv * d), dtype)
        params["layers"]["bv"] = jnp.zeros((L, Hkv * d), dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(V, D, scale=0.02)
    return params


def _mlp(x: jax.Array, lw: Dict[str, jax.Array], act: str) -> jax.Array:
    gate = x @ lw["w_gate"]
    up = x @ lw["w_up"]
    if act == "silu":
        h = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    elif act in ("gelu", "gelu_pytorch_tanh"):
        h = jax.nn.gelu(gate.astype(jnp.float32),
                        approximate=True).astype(x.dtype) * up
    else:
        raise ValueError(f"unsupported activation {act}")
    return h @ lw["w_down"]


def forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,   # [T] i32
    positions: jax.Array,   # [T] i32 (rope positions)
    cache: Optional[KVCache],
    attn_fn: Callable,      # (layer_xs, q, k, v, cache) -> (out, cache)
    layer_xs: Any,          # pytree with leading [L] axis, per-layer inputs
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Shared trunk: embeds tokens, scans layers calling attn_fn, returns
    final hidden states [T, D] and the updated cache."""
    T = token_ids.shape[0]
    Hq, Hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
    x = params["embed"][token_ids]
    cos, sin = precompute_rope(cfg, positions)

    lw_all = params["layers"]

    def layer_step(carry, xs):
        x, cache = carry
        lw, lxs = xs
        h = rms_norm(x, lw["input_norm"], cfg.rms_norm_eps)
        q = h @ lw["wq"]
        k = h @ lw["wk"]
        v = h @ lw["wv"]
        if "bq" in lw:
            q, k, v = q + lw["bq"], k + lw["bk"], v + lw["bv"]
        q = apply_rope(q.reshape(T, Hq, d), cos, sin)
        k = apply_rope(k.reshape(T, Hkv, d), cos, sin)
        v = v.reshape(T, Hkv, d)
        attn_out, cache = attn_fn(lxs, q, k, v, cache)
        x = x + attn_out.reshape(T, Hq * d) @ lw["wo"]
        h = rms_norm(x, lw["post_attn_norm"], cfg.rms_norm_eps)
        x = x + _mlp(h, lw, cfg.hidden_act)
        return (x, cache), None

    (x, cache), _ = jax.lax.scan(layer_step, (x, cache), (lw_all, layer_xs))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, cache


def compute_logits(params: Dict[str, Any], cfg: ModelConfig,
                   hidden: jax.Array) -> jax.Array:
    head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    logits = hidden.astype(jnp.float32) @ head.T.astype(jnp.float32)
    if cfg.logit_soft_cap:
        logits = cfg.logit_soft_cap * jnp.tanh(logits / cfg.logit_soft_cap)
    return logits


# ---------------------------------------------------------------------------
# Engine entry points: prefill (one sequence) and decode (batch)
# ---------------------------------------------------------------------------

def prefill(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,      # [T] padded prompt
    seq_len: jax.Array,        # [] actual length
    slot_mappings: jax.Array,  # [L, T, H_kv] physical cache slots (<0 pad)
    cache: KVCache,
    buffer_len: jax.Array,     # [] metric collection buffer for this seq
    spec: AttentionSpec,
) -> Tuple[jax.Array, KVCache]:
    """Prompt pass: writes KVs + positions, collects prefill metrics,
    returns hidden state of the last real token [D] and updated cache
    (reference flash_attn.py:917-1021 prefill branch)."""
    T = token_ids.shape[0]
    positions = jnp.arange(T, dtype=jnp.int32)
    scale = cfg.head_size ** -0.5

    def attn_fn(slot_mapping_l, q, k, v, cache):
        kc, vc, mc, pc = att.write_to_cache(
            cache.k, cache.v, cache.metrics, cache.positions,
            k, v, slot_mapping_l, positions)
        out, pf_metrics = att.prefill_attention(
            q, k, v, seq_len, scale,
            metric_window=spec.metric_window,
            metric_block=spec.metric_block,
            buffer_len=buffer_len,
            use_l2=spec.use_l2, use_average=spec.use_average,
            use_maxpool=spec.use_maxpool)
        if spec.record_metrics:
            mc = att.aggregate_prefill(mc, pf_metrics, slot_mapping_l)
        return out, KVCache(kc, vc, mc, pc)

    hidden, cache = forward(params, cfg, token_ids, positions, cache,
                            attn_fn, slot_mappings)
    last = jnp.take(hidden, jnp.clip(seq_len - 1, 0), axis=0)
    return last, cache


def decode(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,      # [S]
    positions: jax.Array,      # [S] position of each new token
    block_tables: jax.Array,   # [L, S, H_kv, nb]
    context_lens: jax.Array,   # [L, S, H_kv] (including the new token)
    slot_mappings: jax.Array,  # [L, S, H_kv] where to write the new KV
    cache: KVCache,
    buffer_lens: jax.Array,    # [S]
    active: jax.Array,         # [S] bool
    spec: AttentionSpec,
) -> Tuple[jax.Array, KVCache]:
    """Batched single-token decode over per-head block tables. Returns
    hidden states [S, D] and the updated cache (reference
    flash_attn.py:1065-1097 decode branch + KVCAttention.forward_decode)."""
    S = token_ids.shape[0]
    scale = cfg.head_size ** -0.5

    if spec.impl == "pallas":
        from kvcompress_tpu.ops.pallas import paged_attention as ppa
        decode_attn = ppa.paged_decode_attention
    else:
        decode_attn = att.paged_decode_attention

    def attn_fn(lxs, q, k, v, cache):
        slot_mapping_l, bt_l, ctx_l = lxs
        kc, vc, mc, pc = att.write_to_cache(
            cache.k, cache.v, cache.metrics, cache.positions,
            k, v,
            jnp.where(active[:, None], slot_mapping_l, -1),
            jnp.where(active, positions, -1))
        out, mc = decode_attn(
            q, kc, vc, mc, pc, bt_l, ctx_l, positions, buffer_lens, scale,
            active=active, use_l2=spec.use_l2,
            record_metrics=spec.record_metrics)
        return out, KVCache(kc, vc, mc, pc)

    hidden, cache = forward(
        params, cfg, token_ids, positions, cache, attn_fn,
        (slot_mappings, block_tables, context_lens))
    return hidden, cache


def forward_collect(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,
    positions: jax.Array,
    cache,
    attn_fn: Callable,
    layer_xs: Any,
):
    """Like forward() but attn_fn returns (out, cache, extra); the per-layer
    extras are stacked and returned."""
    T = token_ids.shape[0]
    Hq, Hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
    x = params["embed"][token_ids]
    cos, sin = precompute_rope(cfg, positions)
    lw_all = params["layers"]

    def layer_step(carry, xs):
        x, cache = carry
        lw, lxs = xs
        h = rms_norm(x, lw["input_norm"], cfg.rms_norm_eps)
        q = h @ lw["wq"]
        k = h @ lw["wk"]
        v = h @ lw["wv"]
        if "bq" in lw:
            q, k, v = q + lw["bq"], k + lw["bk"], v + lw["bv"]
        q = apply_rope(q.reshape(T, Hq, d), cos, sin)
        k = apply_rope(k.reshape(T, Hkv, d), cos, sin)
        v = v.reshape(T, Hkv, d)
        attn_out, cache, extra = attn_fn(lxs, q, k, v, cache)
        x = x + attn_out.reshape(T, Hq * d) @ lw["wo"]
        h = rms_norm(x, lw["post_attn_norm"], cfg.rms_norm_eps)
        x = x + _mlp(h, lw, cfg.hidden_act)
        return (x, cache), extra

    (x, cache), extras = jax.lax.scan(layer_step, (x, cache),
                                      (lw_all, layer_xs))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, cache, extras


def decode_fused(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,      # [S]
    positions: jax.Array,      # [S]
    block_tables: jax.Array,   # [L, S, H_kv, nb]
    context_lens: jax.Array,   # [L, S, H_kv] (including the new token)
    slot_mappings: jax.Array,  # [L, S, H_kv]
    cache: KVCache,
    active: jax.Array,         # [S] bool
    spec: AttentionSpec,
) -> Tuple[jax.Array, KVCache, jax.Array]:
    """TPU production decode: K/V writes fused into the pallas kernel;
    positions + metric-slot init written once across layers (two small
    scatters per step instead of 4 per layer); metric contributions returned
    densely [L, S, H_kv, n] for burst-level accumulation.

    Returns (hidden [S, D], cache, m_contrib [L, S, H_kv, n])."""
    from kvcompress_tpu.ops.pallas import paged_attention as ppa

    S = token_ids.shape[0]
    scale = cfg.head_size ** -0.5
    num_blocks, block_size = cache.metrics.shape

    # one scatter each for positions + metric init, across all layers
    flat_slots = jnp.where(active[None, :, None], slot_mappings, 0)
    flat_slots = flat_slots.reshape(-1)
    pos_vals = jnp.broadcast_to(
        jnp.where(active, positions, -1)[None, :, None],
        slot_mappings.shape).reshape(-1)
    kv_positions = cache.positions.reshape(-1).at[flat_slots].set(
        pos_vals).reshape(cache.positions.shape)
    kv_metrics = cache.metrics.reshape(-1).at[flat_slots].set(
        jnp.where(pos_vals >= 0, 0.0, cache.metrics.reshape(-1)[flat_slots])
    ).reshape(cache.metrics.shape)
    cache = KVCache(cache.k, cache.v, kv_metrics, kv_positions)

    ctx_gated = jnp.where(active[None, :, None], context_lens, 0)

    def attn_fn(lxs, q, k, v, cache):
        bt_l, ctx_l = lxs
        out, m_contrib, kc, vc = ppa.paged_decode_attention_fused(
            q, k, v, cache.k, cache.v, bt_l, ctx_l, scale,
            use_l2=spec.use_l2, record_metrics=spec.record_metrics,
            interpret=spec.impl == "interpret")
        return out, KVCache(kc, vc, cache.metrics, cache.positions), m_contrib

    hidden, cache, m_stack = forward_collect(
        params, cfg, token_ids, positions, cache, attn_fn,
        (block_tables, ctx_gated))
    return hidden, cache, m_stack
