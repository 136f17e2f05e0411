"""Generic decoder-only transformer (functional JAX), config-driven.

The TPU-native replacement for the reference's per-architecture model files
(vllm/model_executor/models/, 64 files): one scan-over-layers forward whose
layer step is parameterized by ModelConfig knobs (norm type, positional
embedding, parallel residual, gated/plain MLP, MoE, softcaps, partial
rotary), so every decoder family compiles to the same program shape.
Covered families (see models/registry.py for the HF mappings): Llama 2/3/3.1,
Mistral, Qwen2(.5), Gemma, Gemma2, Phi-2, Phi-3, GPT-2, OPT, GPT-NeoX,
StableLM, Starcoder2, InternLM2, Mixtral, Qwen2-MoE, Granite, Baichuan, OLMo.

Structure (mirrors the capability of reference llama.py:328-336 per-layer
set_layer(i) + unified cache get_layer(i)):
- Parameters are a pytree with layer weights stacked on a leading [L] axis;
  the forward pass is a single jax.lax.scan over layers so the program is
  traced once regardless of depth.
- The unified paged cache (k, v, metrics, positions) is threaded through the
  scan carry; per-layer block-table slices / slot mappings ride as scan xs.
- Weight matmuls run in bfloat16 on the MXU; softmax/norms accumulate f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kvcompress_tpu.config import ModelConfig
from kvcompress_tpu.ops import attention as att
from kvcompress_tpu.quantization.int8 import gather_rows
from kvcompress_tpu.quantization.int8 import mm as _mm


class KVCache(NamedTuple):
    """The slice of CacheState the model forward reads/writes."""
    k: jax.Array           # [num_blocks, block_size, head_size]
    v: jax.Array
    metrics: jax.Array     # [num_blocks, block_size] f32
    positions: jax.Array   # [num_blocks, block_size] i32
    # int8 cache mode: per-KV dequant scales (see ops/kv_quant.py)
    k_scale: Optional[jax.Array] = None  # [num_blocks, block_size] f32
    v_scale: Optional[jax.Array] = None


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
    impl: str = "xla"         # "xla" | "pallas" | "interpret"


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def attn_scale(cfg: ModelConfig) -> float:
    return (cfg.attention_scale if cfg.attention_scale is not None
            else cfg.head_size ** -0.5)


def window_array(cfg: ModelConfig) -> Optional[np.ndarray]:
    """Per-layer sliding window sizes [L] i32 (-1 = full attention), or None
    when the model has no sliding window. Layers where
    layer_idx % sliding_window_every == 0 are windowed (gemma2 alternates
    with every=2; mistral/qwen2 window every layer). The reference rejects
    sliding-window models (vllm/config.py:631-635); our XLA attention path
    implements them."""
    if not cfg.sliding_window:
        return None
    every = max(cfg.sliding_window_every, 1)
    w = np.full((cfg.num_layers,), -1, np.int32)
    w[::every] = cfg.sliding_window
    return w


def precompute_rope(cfg: ModelConfig, positions: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
    """RoPE cos/sin for given positions over the rotary sub-dimension.
    Supports llama3-style rope scaling (HF `rope_type: llama3`) and partial
    rotary (gpt-neox `rotary_pct`, phi/stablelm `partial_rotary_factor`)."""
    if cfg.kv_lora_rank:  # MLA: rope covers only the shared k_pe slice
        rot = cfg.qk_rope_head_dim
    else:
        rot = int(cfg.head_size * cfg.partial_rotary_factor)
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, rot, 2) / rot))
    rs = cfg.rope_scaling or {}
    kind = rs.get("rope_type", rs.get("type"))
    if kind == "llama3":
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
    elif kind == "linear":
        inv_freq = inv_freq / rs["factor"]
    elif kind not in (None, "default"):
        # fail-loudly contract: serving a yarn/longrope/dynamic checkpoint
        # with base frequencies (and no mscale correction) would be
        # silently wrong at every context length, not merely degraded
        raise NotImplementedError(
            f"rope_scaling type {kind!r} is not implemented "
            "(supported: llama3, linear)")
    inv_freq = jnp.asarray(inv_freq, jnp.float32)
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               interleaved: bool = False) -> jax.Array:
    """x: [T, H, d]; rotate-half over the first 2*cos.shape[-1] dims
    (neox-style, matches HF Llama/GPTNeoX) or rotate-every-two
    (gpt-j/cohere style) when interleaved; the remainder passes through."""
    rot = 2 * cos.shape[-1]
    d = x.shape[-1]
    xr, x_pass = x[..., :rot], x[..., rot:]
    d2 = rot // 2
    c = cos[:, None, :].astype(jnp.float32)
    s = sin[:, None, :].astype(jnp.float32)
    if interleaved:
        x1 = xr[..., 0::2].astype(jnp.float32)
        x2 = xr[..., 1::2].astype(jnp.float32)
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
    else:
        x1 = xr[..., :d2].astype(jnp.float32)
        x2 = xr[..., d2:].astype(jnp.float32)
        out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    out = out.astype(x.dtype)
    if rot < d:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out


def _norm(x: jax.Array, w: jax.Array, b: Optional[jax.Array],
          cfg: ModelConfig) -> jax.Array:
    xf = x.astype(jnp.float32)
    if cfg.norm_type == "layernorm":
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + cfg.rms_norm_eps)
        wf = w.astype(jnp.float32)
        if cfg.rmsnorm_offset:  # nemotron layernorm1p: y * (1 + w)
            wf = wf + 1.0
        y = y * wf
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(x.dtype)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + cfg.rms_norm_eps)
    wf = w.astype(jnp.float32)
    if cfg.rmsnorm_offset:
        wf = wf + 1.0
    return (y * wf).astype(x.dtype)


def _act(x: jax.Array, act: str) -> jax.Array:
    xf = x.astype(jnp.float32)
    if act == "silu":
        return jax.nn.silu(xf)
    if act in ("gelu_new", "gelu_pytorch_tanh", "gelu_fast"):
        return jax.nn.gelu(xf, approximate=True)
    if act == "gelu":
        return jax.nn.gelu(xf, approximate=False)
    if act == "relu":
        return jax.nn.relu(xf)
    if act == "relu2":
        r = jax.nn.relu(xf)
        return r * r
    if act == "quick_gelu":
        return xf * jax.nn.sigmoid(1.702 * xf)
    raise ValueError(f"unsupported activation {act}")


def _shared_mlp_view(lw: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """View of the shared-expert weights under the standard w_gate/w_up/
    w_down names, carrying quantized leaves (shared_gate_q8/_scale,
    _q4/_scale4/_zero4) through so _mm's dispatch keeps working - a bare
    lw[\"shared_gate\"] read crashes on quantized checkpoints."""
    d = {}
    for new, old in (("w_gate", "shared_gate"), ("w_up", "shared_up"),
                     ("w_down", "shared_down")):
        for sfx in ("", "_q8", "_scale", "_q4", "_scale4", "_zero4"):
            if f"{old}{sfx}" in lw:
                d[f"{new}{sfx}"] = lw[f"{old}{sfx}"]
    return d


def _dense_mlp(x: jax.Array, lw: Dict[str, jax.Array],
               cfg: ModelConfig) -> jax.Array:
    if cfg.mlp_type == "plain":
        h = _mm(x, lw, "w_fc1")
        if "b_fc1" in lw:
            h = h + lw["b_fc1"]
        h = _act(h, cfg.hidden_act).astype(x.dtype)
        out = _mm(h, lw, "w_fc2")
        if "b_fc2" in lw:
            out = out + lw["b_fc2"]
        return out
    gate = _mm(x, lw, "w_gate")
    up = _mm(x, lw, "w_up")
    if "b_gate" in lw:
        gate, up = gate + lw["b_gate"], up + lw["b_up"]
    if cfg.hidden_act == "gegelu":
        # phi3-small gegelu (reference phi3_small.py:59-70): the gate side
        # is upper-clamped, the linear side is clamped to +-limit and
        # offset by 1; the loader deinterleaves up_proj's even/odd columns
        # into gate/up
        lim = cfg.gegelu_limit
        gf, uf = gate.astype(jnp.float32), up.astype(jnp.float32)
        if lim is not None:
            gf = jnp.minimum(gf, lim)
            uf = jnp.clip(uf, -lim, lim)
        h = (_act(gf, "quick_gelu") * (uf + 1.0)).astype(x.dtype)
    else:
        h = (_act(gate, cfg.hidden_act).astype(x.dtype) * up)
    out = _mm(h, lw, "w_down")
    if "b_down" in lw:
        out = out + lw["b_down"]
    return out


def _sparsemixer_route(scores: jax.Array, eps: float = 0.01) -> jax.Array:
    """PhiMoE sparsemixer top-2 routing, inference path (HF
    modeling_phimoe.sparsemixer with training=False): each of the two
    selected experts gets its weight from its OWN threshold-masked softmax
    rather than a joint renormalisation."""
    T, E = scores.shape
    rows = jnp.arange(T)

    def pick(sc, abs_ref):
        m = jnp.max(sc, axis=-1, keepdims=True)
        factor = jnp.maximum(jnp.abs(abs_ref), m)
        mask = (m - sc) / factor > 2 * eps
        g = jax.nn.softmax(jnp.where(mask, -jnp.inf, sc), axis=-1)
        e = jnp.argmax(sc, axis=-1)
        w = g[rows, e]
        return e, w

    e1, w1 = pick(scores, scores)
    scores2 = scores.at[rows, e1].set(-jnp.inf)
    e2, w2 = pick(scores2, scores)
    return (jnp.zeros((T, E), jnp.float32)
            .at[rows, e1].set(w1).at[rows, e2].set(w2))


# Expert-parallel mesh (parallel/mesh.py MODEL_AXIS): set by the engine
# when ParallelConfig.enable_expert_parallel is on; expert weights then
# arrive sharded on the EXPERT axis and the grouped dispatch runs a
# shard_map over local experts (dense dispatch partitions via GSPMD and
# needs no code here). Trace-time static - safe under jit.
_EP_MESH = None


def set_ep_mesh(mesh) -> None:
    global _EP_MESH
    _EP_MESH = mesh


def _moe_grouped_experts_ep(x: jax.Array, lw: Dict[str, jax.Array],
                            cfg: ModelConfig, weights: jax.Array,
                            mesh) -> jax.Array:
    """Expert-parallel grouped dispatch: each model-axis shard holds
    E/tp whole experts; it recovers its LOCAL top-k from its slice of the
    dense routing matrix (rows routed to remote experts get weight-0 local
    picks and contribute exactly zero), runs the local grouped GEMMs, and
    a psum combines the partial token outputs. Beyond the reference
    (fused_moe.py TP-shards the intermediate axis only)."""
    import dataclasses as _dc

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from kvcompress_tpu.parallel.mesh import MODEL_AXIS
    tp = mesh.shape[MODEL_AXIS]
    E, k = cfg.num_experts, cfg.num_experts_per_tok
    lcfg = _dc.replace(cfg, num_experts=E // tp,
                       num_experts_per_tok=min(k, E // tp))
    ew = {kk: v for kk, v in lw.items() if kk.startswith("experts_")}
    espec = {kk: P(MODEL_AXIS, *([None] * (v.ndim - 1)))
             for kk, v in ew.items()}

    def fn(xl, ewl, wl):
        out = _moe_grouped_experts(xl, ewl, lcfg, wl)
        return jax.lax.psum(out, MODEL_AXIS)

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, None), espec, P(None, MODEL_AXIS)),
        out_specs=P(None, None), check_vma=False)(x, ew, weights)


def _moe_grouped_experts(x: jax.Array, lw: Dict[str, jax.Array],
                         cfg: ModelConfig, weights: jax.Array
                         ) -> jax.Array:
    """Exact capacity-free grouped-GEMM expert dispatch (the role of
    reference vllm/model_executor/layers/fused_moe/fused_moe.py's
    token-sorted fused kernels, TPU-shaped): recover the top-k
    (expert, weight) pairs from the dense routing matrix, sort the T*k
    token rows by expert, run the three expert matmuls as
    lax.ragged_dot over [E]-grouped rows (Mosaic lowers this to
    MXU-tiled grouped GEMM), and scatter-add the weighted outputs back.
    FLOPs are T*k*d*i instead of the dense path's T*E*d*i — an E/k
    saving (4x for mixtral E=8 k=2) with no token dropping: rows whose
    routing weight is 0 contribute exactly 0, so logits are unchanged.
    Static shapes throughout ([T*k] rows), jit/scan-safe."""
    T = x.shape[0]
    E, k = cfg.num_experts, cfg.num_experts_per_tok
    topv, topi = jax.lax.top_k(weights, k)          # [T, k] (k nonzeros)
    flat_e = topi.reshape(-1)                        # [T*k]
    flat_t = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)
    order = jnp.argsort(flat_e)                      # stable
    se = flat_e[order]                               # expert per row
    st = flat_t[order]                               # source token per row
    sw = topv.reshape(-1)[order]                     # routing weight
    gs = jnp.bincount(se, length=E)                  # rows per expert
    xs = x[st]                                       # [T*k, d]

    def rmm(inp, name):
        q = lw.get(f"{name}_q8")
        if q is None:
            return jax.lax.ragged_dot(inp, lw[name].astype(inp.dtype), gs)
        y = jax.lax.ragged_dot(inp, q.astype(inp.dtype), gs)
        # int8 scales are per-(expert, out-channel): gather per row
        return y * lw[f"{name}_scale"][..., 0, :].astype(inp.dtype)[se]

    gate = rmm(xs, "experts_gate")
    up = rmm(xs, "experts_up")
    h = _act(gate, cfg.hidden_act).astype(xs.dtype) * up
    y = rmm(h, "experts_down")                       # [T*k, d]
    return (jnp.zeros((T, x.shape[1]), jnp.float32)
            .at[st].add(y.astype(jnp.float32) * sw[:, None]))


def _moe_mlp(x: jax.Array, lw: Dict[str, jax.Array],
             cfg: ModelConfig) -> jax.Array:
    """Mixture-of-experts MLP (mixtral / qwen2-moe semantics: full softmax
    over router logits, top-k selection, optional renormalisation; dense
    all-expert compute combined by the sparse routing weights - exact and
    MXU-friendly at decode batch sizes; capacity-grouped dispatch is a
    later optimisation for long prefills)."""
    T = x.shape[0]
    E, k = cfg.num_experts, cfg.num_experts_per_tok
    logits = (x.astype(jnp.float32) @ lw["router"].astype(jnp.float32))
    if cfg.moe_routing == "sparsemixer":
        weights = _sparsemixer_route(logits)                      # [T, E]
    elif cfg.moe_routing == "sigmoid_noaux":
        # deepseek-v3 noaux_tc gate: sigmoid scores, selection by
        # bias-corrected scores with group-limited greedy, weights from
        # the UNCORRECTED scores (normalized), times routed scaling
        rows = jnp.arange(T)
        scores = jax.nn.sigmoid(logits)
        choice = scores + lw["router_bias"].astype(jnp.float32)
        if cfg.moe_n_group > 1:
            g = cfg.moe_n_group
            cg = choice.reshape(T, g, E // g)
            gscore = jnp.sum(jax.lax.top_k(cg, 2)[0], axis=-1)   # [T, g]
            gi = jax.lax.top_k(gscore, cfg.moe_topk_group)[1]
            gmask = jnp.zeros((T, g), bool).at[
                rows[:, None], gi].set(True)
            choice = jnp.where(gmask[..., None], cg,
                               -jnp.inf).reshape(T, E)
        _, topi = jax.lax.top_k(choice, k)
        topv = scores[rows[:, None], topi]
        if cfg.moe_norm_topk_prob:
            topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
        weights = jnp.zeros((T, E), jnp.float32).at[
            rows[:, None], topi].set(topv)
    else:
        probs = jax.nn.softmax(logits, axis=-1)                  # [T, E]
        topv, topi = jax.lax.top_k(probs, k)                      # [T, k]
        if cfg.moe_norm_topk_prob:
            topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-9)
        weights = jnp.zeros((T, E), jnp.float32).at[
            jnp.arange(T)[:, None], topi].set(topv)               # [T, E]

    if cfg.moe_dispatch == "grouped":
        if _EP_MESH is not None:
            out = _moe_grouped_experts_ep(x, lw, cfg, weights, _EP_MESH)
        else:
            out = _moe_grouped_experts(x, lw, cfg, weights)
    else:
        def emm(inp, name, pat):
            q = lw.get(f"{name}_q8")
            if q is None:
                return jnp.einsum(pat, inp, lw[name])
            y = jnp.einsum(pat, inp, q.astype(inp.dtype))
            return y * lw[f"{name}_scale"][..., 0, :].astype(inp.dtype)

        gate = emm(x, "experts_gate", "td,edi->tei")
        up = emm(x, "experts_up", "td,edi->tei")
        h = _act(gate, cfg.hidden_act).astype(x.dtype) * up
        y = emm(h, "experts_down", "tei,eid->ted")
        out = jnp.einsum("ted,te->td", y.astype(jnp.float32), weights)
    if cfg.moe_routed_scaling != 1.0:
        out = out * jnp.asarray(cfg.moe_routed_scaling, out.dtype)
    out = out.astype(x.dtype)

    if cfg.moe_shared_expert_size:
        shared = _dense_mlp(x, _shared_mlp_view(lw), cfg)
        if "shared_router" in lw:
            sg = jax.nn.sigmoid(
                x.astype(jnp.float32) @ lw["shared_router"].astype(
                    jnp.float32))
            shared = (shared.astype(jnp.float32) * sg).astype(x.dtype)
        out = out + shared
    return out


def _mlp(x: jax.Array, lw: Dict[str, jax.Array], cfg: ModelConfig
         ) -> jax.Array:
    if cfg.num_experts:
        return _moe_mlp(x, lw, cfg)
    return _dense_mlp(x, lw, cfg)


# ---------------------------------------------------------------------------
# Parameter initialisation (tests / benchmarks)
# ---------------------------------------------------------------------------

def init_params(cfg: ModelConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Random-initialised parameters matching the layout the HF loaders in
    models/registry.py produce; generated on device (host RNG is far too
    slow for billion-parameter shapes)."""
    key = jax.random.PRNGKey(seed)
    keys = iter(jax.random.split(key, 48))
    D, L = cfg.hidden_size, cfg.num_layers
    Hq, Hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
    I, V = cfg.intermediate_size, cfg.vocab_size

    def w(*shape, scale=None):
        scale = scale or (shape[-2] ** -0.5 if len(shape) > 1 else 0.02)
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * scale).astype(dtype)

    if cfg.kv_lora_rank:
        rank, rope_d = cfg.kv_lora_rank, cfg.qk_rope_head_dim
        nope_d, v_d = cfg.qk_nope_head_dim, cfg.v_head_dim
        layers: Dict[str, Any] = {
            "mla_kv_a": w(L, D, rank + rope_d),
            "mla_kv_a_norm": jnp.ones((L, rank), dtype),
            "mla_w_kc": w(L, Hq, nope_d, rank, scale=nope_d ** -0.5),
            "mla_w_vc": w(L, Hq, rank, v_d, scale=rank ** -0.5),
            "wo": w(L, Hq * v_d, D),
        }
        if cfg.q_lora_rank:
            layers["mla_q_a"] = w(L, D, cfg.q_lora_rank)
            layers["mla_q_a_norm"] = jnp.ones((L, cfg.q_lora_rank), dtype)
            layers["mla_q_b"] = w(L, cfg.q_lora_rank,
                                  Hq * (nope_d + rope_d))
        else:
            layers["mla_wq"] = w(L, D, Hq * (nope_d + rope_d))
    else:
        layers = {
            "wq": w(L, D, Hq * d),
            "wk": w(L, D, Hkv * d),
            "wv": w(L, D, Hkv * d),
            "wo": w(L, Hq * d, D),
        }
    if not cfg.no_pre_norm:
        layers["input_norm"] = jnp.ones((L, D), dtype)
        if not cfg.shared_input_norm:
            layers["post_attn_norm"] = jnp.ones((L, D), dtype)
    if cfg.use_post_norms:
        layers["post_attn_out_norm"] = jnp.ones((L, D), dtype)
        layers["post_mlp_norm"] = jnp.ones((L, D), dtype)
    if cfg.norm_bias and "input_norm" in layers:
        layers["input_norm_b"] = jnp.zeros((L, D), dtype)
        if "post_attn_norm" in layers:
            layers["post_attn_norm_b"] = jnp.zeros((L, D), dtype)
    if cfg.num_experts:
        E = cfg.num_experts
        Ie = cfg.moe_intermediate_size or I
        layers["router"] = w(L, D, E)
        layers["experts_gate"] = w(L, E, D, Ie)
        layers["experts_up"] = w(L, E, D, Ie)
        layers["experts_down"] = w(L, E, Ie, D)
        if cfg.moe_shared_expert_size:
            Se = cfg.moe_shared_expert_size
            layers["shared_gate"] = w(L, D, Se)
            layers["shared_up"] = w(L, D, Se)
            layers["shared_down"] = w(L, Se, D)
            layers["shared_router"] = w(L, D, 1)
        if cfg.arctic_residual:
            # arctic hybrid reads res_norm + a residual (shared) MLP in
            # every layer (decoder layer step arctic branch)
            layers["res_norm"] = jnp.ones((L, D), dtype)
            if "shared_gate" not in layers:
                layers["shared_gate"] = w(L, D, I)
                layers["shared_up"] = w(L, D, I)
                layers["shared_down"] = w(L, I, D)
    elif cfg.mlp_type == "plain":
        layers["w_fc1"] = w(L, D, I)
        layers["w_fc2"] = w(L, I, D)
        if cfg.mlp_bias:
            layers["b_fc1"] = jnp.zeros((L, I), dtype)
            layers["b_fc2"] = jnp.zeros((L, D), dtype)
    else:
        layers["w_gate"] = w(L, D, I)
        layers["w_up"] = w(L, D, I)
        layers["w_down"] = w(L, I, D)
        if cfg.mlp_bias:
            layers["b_gate"] = jnp.zeros((L, I), dtype)
            layers["b_up"] = jnp.zeros((L, I), dtype)
            layers["b_down"] = jnp.zeros((L, D), dtype)
    if cfg.qkv_bias or cfg.attention_bias:
        layers["bq"] = jnp.zeros((L, Hq * d), dtype)
        layers["bk"] = jnp.zeros((L, Hkv * d), dtype)
        layers["bv"] = jnp.zeros((L, Hkv * d), dtype)
    if cfg.o_bias:
        layers["bo"] = jnp.zeros((L, D), dtype)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, d), dtype)
        layers["k_norm"] = jnp.ones((L, d), dtype)
        if cfg.norm_bias:
            layers["q_norm_b"] = jnp.zeros((L, d), dtype)
            layers["k_norm_b"] = jnp.zeros((L, d), dtype)
    elif cfg.qk_norm_full:
        layers["q_norm"] = jnp.ones((L, Hq * d), dtype)
        layers["k_norm"] = jnp.ones((L, Hkv * d), dtype)
    elif cfg.qk_norm_per_head:
        layers["q_norm"] = jnp.ones((L, Hq, d), dtype)
        layers["k_norm"] = jnp.ones((L, Hkv, d), dtype)
        layers["q_norm_b"] = jnp.zeros((L, Hq, d), dtype)
        layers["k_norm_b"] = jnp.zeros((L, Hkv, d), dtype)

    params: Dict[str, Any] = {
        "embed": w(V, D, scale=0.02),
        "final_norm": jnp.ones((D,), dtype),
        "layers": layers,
    }
    if cfg.norm_bias:
        params["final_norm_b"] = jnp.zeros((D,), dtype)
    if cfg.embed_norm:
        params["embed_norm_w"] = jnp.ones((D,), dtype)
        if cfg.norm_bias:
            params["embed_norm_b"] = jnp.zeros((D,), dtype)
    if cfg.pos_embedding == "learned":
        P = cfg.max_model_len + cfg.learned_pos_offset
        params["pos_embed"] = w(P, D, scale=0.02)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(V, D, scale=0.02)
    if cfg.lm_head_bias:
        params["lm_head_b"] = jnp.zeros((V,), dtype)
    return params


# Backwards-compatible alias (llama-family tests / benches)
def init_llama_params(cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16):
    return init_params(cfg, seed, dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _embed(params, cfg: ModelConfig, token_ids, positions):
    dtype = params["final_norm"].dtype
    x = gather_rows(params, "embed", token_ids, dtype)
    if cfg.embedding_multiplier != 1.0:
        x = (x.astype(jnp.float32) * cfg.embedding_multiplier).astype(x.dtype)
    if cfg.pos_embedding == "learned":
        x = x + params["pos_embed"][
            jnp.clip(positions, 0) + cfg.learned_pos_offset]
    if cfg.embed_norm:
        x = _norm(x, params["embed_norm_w"], params.get("embed_norm_b"),
                  cfg)
    return x


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Standard ALiBi slope schedule (bloom/mpt)."""
    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(np.log2(n) - 3)))
        return start * (start ** np.arange(n))

    if np.log2(n_heads).is_integer():
        return pow2_slopes(n_heads).astype(np.float32)
    closest = 2 ** int(np.floor(np.log2(n_heads)))
    base = pow2_slopes(closest)
    extra = pow2_slopes(2 * closest)[0::2][:n_heads - closest]
    return np.concatenate([base, extra]).astype(np.float32)


def _layer_step_fn(cfg: ModelConfig, T: int, cos, sin, attn_fn,
                   collect: bool, lora=None):
    """Returns the scan body. attn_fn(lxs, q, k, v, cache) -> (out, cache)
    or (out, cache, extra) when collect=True. lora = (lora_idx, lora_scale)
    activates per-sequence adapter deltas (banks ride in the layers dict,
    see kvcompress_tpu/lora/models.py)."""
    Hq, Hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
    rm = cfg.residual_multiplier

    def layer_step(carry, xs):
        x, cache = carry
        lw, lxs = xs

        if lora is not None:
            from kvcompress_tpu.lora.models import apply_lora
            lidx, lscale = lora

            def proj(h, w_name):
                y = _mm(h, lw, w_name)
                if f"lora_{w_name}_A" in lw:
                    y = y + apply_lora(h, lw, w_name, lidx, lscale)
                return y
        else:
            def proj(h, w_name):
                return _mm(h, lw, w_name)

        h = x if cfg.no_pre_norm else _norm(
            x, lw["input_norm"], lw.get("input_norm_b"), cfg)
        if cfg.kv_lora_rank:
            # Multi-head Latent Attention (deepseek v2/v3), absorbed form:
            # the cache holds [latent | k_pe] per token (MQA over latent
            # space); q_abs = q_nope @ W_kc queries it directly; W_vc
            # projects the attended latent back per head
            # (reference deepseek_v2.py; HF DeepseekV2Attention is the
            # decompressed oracle the zoo test compares against)
            rank, rope_d = cfg.kv_lora_rank, cfg.qk_rope_head_dim
            nope_d, v_d = cfg.qk_nope_head_dim, cfg.v_head_dim
            if "mla_q_a" in lw:
                qa = _norm(_mm(h, lw, "mla_q_a"), lw["mla_q_a_norm"],
                           None, cfg)
                q = _mm(qa, lw, "mla_q_b")
            else:
                q = _mm(h, lw, "mla_wq")
            q = q.reshape(T, Hq, nope_d + rope_d)
            q_nope, q_pe = q[..., :nope_d], q[..., nope_d:]
            kv_a = _mm(h, lw, "mla_kv_a")          # [T, rank + rope_d]
            latent = _norm(kv_a[:, :rank], lw["mla_kv_a_norm"], None, cfg)
            k_pe = kv_a[:, None, rank:]            # [T, 1, rope_d]
            q_pe = apply_rope(q_pe, cos, sin, interleaved=True)
            k_pe = apply_rope(k_pe, cos, sin, interleaved=True)
            q_abs = jnp.einsum("thn,hnr->thr", q_nope.astype(jnp.float32),
                               lw["mla_w_kc"].astype(jnp.float32)
                               ).astype(h.dtype)
            q_eff = jnp.concatenate([q_abs, q_pe], axis=-1)   # [T, Hq, d]
            k_eff = jnp.concatenate([latent[:, None, :], k_pe], axis=-1)
            v_eff = jnp.concatenate(
                [latent[:, None, :],
                 jnp.zeros((T, 1, rope_d), latent.dtype)], axis=-1)
            res = attn_fn(lxs, q_eff, k_eff.astype(q_eff.dtype),
                          v_eff.astype(q_eff.dtype), cache)
            if collect:
                attn_out, cache, extra = res
            else:
                attn_out, cache = res
                extra = None
            out_lat = attn_out[..., :rank]
            av = jnp.einsum("thr,hrv->thv", out_lat.astype(jnp.float32),
                            lw["mla_w_vc"].astype(jnp.float32)
                            ).astype(h.dtype)
            a = proj(av.reshape(T, Hq * v_d), "wo")
        else:
            q = proj(h, "wq")
            k = proj(h, "wk")
            v = proj(h, "wv")
            if "bq" in lw:
                q, k, v = q + lw["bq"], k + lw["bk"], v + lw["bv"]
            if cfg.clip_qkv:
                # dbrx / olmo-0424: clamp QKV activations to +-clip_qkv
                # (HF DbrxAttention/OlmoAttention clamp before rope)
                c = cfg.clip_qkv
                q = jnp.clip(q, -c, c)
                k = jnp.clip(k, -c, c)
                v = jnp.clip(v, -c, c)
            if cfg.qk_norm_full:  # olmo2/olmoe: norm over WHOLE projection
                q = _norm(q, lw["q_norm"], lw.get("q_norm_b"), cfg)
                k = _norm(k, lw["k_norm"], lw.get("k_norm_b"), cfg)
            q = q.reshape(T, Hq, d)
            k = k.reshape(T, Hkv, d)
            v = v.reshape(T, Hkv, d)
            if cfg.qk_norm:
                q = _norm(q, lw["q_norm"], lw.get("q_norm_b"), cfg)
                k = _norm(k, lw["k_norm"], lw.get("k_norm_b"), cfg)
            if cfg.qk_norm_per_head:
                # chameleon: layernorm stats over head_dim (eps fixed at
                # 1e-5 in HF ChameleonLayerNorm regardless of rms_norm_eps)
                # with per-(head, dim) affine + bias, applied BEFORE rope
                def _head_ln(y, w, b):
                    yf = y.astype(jnp.float32)
                    mu = jnp.mean(yf, axis=-1, keepdims=True)
                    var = jnp.var(yf, axis=-1, keepdims=True)
                    yn = (yf - mu) * jax.lax.rsqrt(var + 1e-5)
                    return (yn * w[None] + b[None]).astype(y.dtype)
                q = _head_ln(q, lw["q_norm"], lw["q_norm_b"])
                k = _head_ln(k, lw["k_norm"], lw["k_norm_b"])
            if cfg.pos_embedding == "rope":
                q = apply_rope(q, cos, sin, cfg.rope_interleaved)
                k = apply_rope(k, cos, sin, cfg.rope_interleaved)
            res = attn_fn(lxs, q, k, v, cache)
            if collect:
                attn_out, cache, extra = res
            else:
                attn_out, cache = res
                extra = None
            ao = attn_out.reshape(T, Hq * d)
            a = proj(ao, "wo")
        if "bo" in lw:
            a = a + lw["bo"]
        if cfg.use_post_norms:
            a = _norm(a, lw["post_attn_out_norm"], None, cfg)
        def mlp_fn(hm):
            if (lora is not None and cfg.mlp_type == "gated"
                    and not cfg.num_experts
                    and "lora_w_gate_A" in lw):
                from kvcompress_tpu.lora.models import apply_lora
                gate = proj(hm, "w_gate")
                up = proj(hm, "w_up")
                if "b_gate" in lw:
                    gate, up = gate + lw["b_gate"], up + lw["b_up"]
                hh = (_act(gate, cfg.hidden_act).astype(hm.dtype) * up)
                return proj(hh, "w_down")
            return _mlp(hm, lw, cfg)

        if cfg.arctic_residual:
            # Arctic hybrid (reference arctic.py:330-357): the dense branch
            # (residual_mlp on MoE layers, the layer's FFN on dense layers)
            # norms the POST-attention stream; the routed experts norm the
            # PRE-attention residual; dense layers carry zeroed experts so
            # their routed term vanishes exactly.
            x_attn = x + a
            sh_in = _norm(x_attn, lw["res_norm"], None, cfg)
            m_sh = _dense_mlp(sh_in, _shared_mlp_view(lw), cfg)
            moe_in = _norm(x, lw["post_attn_norm"], None, cfg)
            m_moe = _moe_mlp(moe_in, lw, cfg)
            x = x_attn + m_sh + m_moe
        elif cfg.parallel_residual:
            hm = h if cfg.shared_input_norm else _norm(
                x, lw["post_attn_norm"], lw.get("post_attn_norm_b"), cfg)
            m = mlp_fn(hm)
            x = x + (a + m) * rm if rm != 1.0 else x + a + m
        else:
            x = x + a * rm if rm != 1.0 else x + a
            h2 = x if cfg.no_pre_norm else _norm(
                x, lw["post_attn_norm"], lw.get("post_attn_norm_b"), cfg)
            m = mlp_fn(h2)
            if cfg.use_post_norms:
                m = _norm(m, lw["post_mlp_norm"], None, cfg)
            x = x + m * rm if rm != 1.0 else x + m
        return (x, cache), extra

    return layer_step


def forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,   # [T] i32
    positions: jax.Array,   # [T] i32 (rope / learned positions)
    cache: Optional[KVCache],
    attn_fn: Callable,      # (layer_xs, q, k, v, cache) -> (out, cache)
    layer_xs: Any,          # pytree with leading [L] axis, per-layer inputs
    lora=None,              # (lora_idx, lora_scale) or None
    embed_override: Optional[Callable] = None,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Shared trunk: embeds tokens, scans layers calling attn_fn, returns
    final hidden states [T, D] and the updated cache."""
    x = _embed(params, cfg, token_ids, positions)
    if embed_override is not None:
        x = embed_override(x)
    cos, sin = precompute_rope(cfg, positions)
    step = _layer_step_fn(cfg, token_ids.shape[0], cos, sin, attn_fn,
                          collect=False, lora=lora)
    (x, cache), _ = jax.lax.scan(step, (x, cache),
                                 (params["layers"], layer_xs))
    x = _norm(x, params["final_norm"], params.get("final_norm_b"), cfg)
    return x, cache


def forward_collect(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,
    positions: jax.Array,
    cache,
    attn_fn: Callable,
    layer_xs: Any,
    lora=None,
    embed_override: Optional[Callable] = None,
):
    """Like forward() but attn_fn returns (out, cache, extra); the per-layer
    extras are stacked and returned."""
    x = _embed(params, cfg, token_ids, positions)
    if embed_override is not None:
        x = embed_override(x)
    cos, sin = precompute_rope(cfg, positions)
    step = _layer_step_fn(cfg, token_ids.shape[0], cos, sin, attn_fn,
                          collect=True, lora=lora)
    (x, cache), extras = jax.lax.scan(step, (x, cache),
                                      (params["layers"], layer_xs))
    x = _norm(x, params["final_norm"], params.get("final_norm_b"), cfg)
    return x, cache, extras


def compute_logits(params: Dict[str, Any], cfg: ModelConfig,
                   hidden: jax.Array) -> jax.Array:
    name = "embed" if cfg.tie_word_embeddings else "lm_head"
    one_d = hidden.ndim == 1
    h = hidden[None] if one_d else hidden
    q = params.get(f"{name}_q8")
    if q is not None:
        # quantized head (int8 or fp8) with per-row scales: the dequant
        # convert fuses into the matmul operand stream, halving the
        # largest weight read per step. fp8 casts to the activation dtype
        # first (mixed f8/bf16 dot_general is rejected); int8 rides the
        # mixed-precision dot directly.
        if q.dtype == jnp.int8:
            y = jax.lax.dot_general(
                h, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            y = jax.lax.dot_general(
                h, q.astype(h.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        logits = y * params[f"{name}_scale"][:, 0].astype(jnp.float32)
    else:
        logits = jax.lax.dot_general(
            h, params[name], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    if one_d:
        logits = logits[0]
    if "lm_head_b" in params:
        logits = logits + params["lm_head_b"].astype(jnp.float32)
    if cfg.logits_scaling != 1.0:
        logits = logits / cfg.logits_scaling
    if cfg.logit_soft_cap:
        logits = cfg.logit_soft_cap * jnp.tanh(logits / cfg.logit_soft_cap)
    if cfg.logit_suppress_tokens:
        # chameleon: image-codebook tokens are never sampled in text
        # generation (HF ChameleonForConditionalGeneration.forward and
        # reference chameleon.py:993-995 both mask them to dtype-min)
        ids = jnp.asarray(cfg.logit_suppress_tokens, jnp.int32)
        fill = jnp.full(ids.shape, jnp.finfo(jnp.float32).min)
        if logits.ndim == 1:
            logits = logits.at[ids].set(fill)
        else:
            logits = logits.at[:, ids].set(fill[None])
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
    lora=None,
    prefix_embed=None,         # [max_virtual, D] prompt-adapter soft prompt
    prefix_len=None,           # [] i32 valid virtual tokens
    inject_embed=None,         # [N, D] multimodal embeddings (llava image
                               # patches projected to text space)
    inject_pos=None,           # [N] i32 absolute positions; pad with T
                               # (positive out-of-range -> dropped)
    mesh=None,                 # TP mesh: pallas kernel runs per shard
    write_cache: bool = True,  # False: return raw (ks, vs, pfs) instead
):
    """Prompt pass: writes KVs + positions, collects prefill metrics,
    returns hidden state of the last real token [D] and updated cache
    (reference flash_attn.py:917-1021 prefill branch). With
    write_cache=False the caller does the cache writes itself (the engine
    writes whole block rows, which beats the per-slot scatters here) and
    gets (last_hidden, ks [L,T,H,d], vs, pfs [L,T,H])."""
    T = token_ids.shape[0]
    positions = jnp.arange(T, dtype=jnp.int32)
    scale = attn_scale(cfg)
    al = (jnp.asarray(alibi_slopes(cfg.num_heads)) if cfg.alibi else None)
    win = window_array(cfg)

    if (spec.impl in ("pallas", "interpret") and not cfg.alibi
            and win is None and not cfg.prefix_lm):
        from kvcompress_tpu.ops.pallas import prefill_attention as ppf

        sharded = None
        if mesh is not None:
            from kvcompress_tpu.parallel.mesh import MODEL_AXIS
            if mesh.shape.get(MODEL_AXIS, 1) > 1:
                from kvcompress_tpu.parallel.shard_attn import (
                    prefill_attention_sharded)
                sharded = prefill_attention_sharded

        def prefill_attn(q, k, v, window=None):
            if sharded is not None:
                return sharded(
                    mesh, q, k, v, seq_len, buffer_len, scale,
                    metric_window=spec.metric_window,
                    use_l2=spec.use_l2, use_average=spec.use_average,
                    use_maxpool=spec.use_maxpool,
                    record_metrics=spec.record_metrics,
                    logit_cap=cfg.attn_logit_softcap,
                    interpret=spec.impl == "interpret")
            return ppf.prefill_attention(
                q, k, v, seq_len, scale,
                metric_window=spec.metric_window,
                buffer_len=buffer_len,
                use_l2=spec.use_l2, use_average=spec.use_average,
                use_maxpool=spec.use_maxpool,
                record_metrics=spec.record_metrics,
                logit_cap=cfg.attn_logit_softcap,
                interpret=spec.impl == "interpret")
    else:
        def prefill_attn(q, k, v, window=None):
            return att.prefill_attention(
                q, k, v, seq_len, scale,
                metric_window=spec.metric_window,
                metric_block=spec.metric_block,
                buffer_len=buffer_len,
                use_l2=spec.use_l2, use_average=spec.use_average,
                use_maxpool=spec.use_maxpool,
                logit_cap=cfg.attn_logit_softcap, alibi=al,
                window=window, prefix_lm=cfg.prefix_lm)

    if win is None:
        def attn_fn(slot_mapping_l, q, k, v, cache):
            out, pf_metrics = prefill_attn(q, k, v)
            return out, cache, (k, v, pf_metrics)
        layer_xs = slot_mappings
    else:
        def attn_fn(lxs, q, k, v, cache):
            _, w_l = lxs
            out, pf_metrics = prefill_attn(q, k, v, window=w_l)
            return out, cache, (k, v, pf_metrics)
        layer_xs = (slot_mappings, jnp.asarray(win))

    embed_override = None
    if prefix_embed is not None:
        nv = prefix_embed.shape[0]

        def embed_override(x, prefix_embed=prefix_embed,
                           prefix_len=prefix_len, nv=nv):
            # the first prefix_len positions take the adapter's soft-prompt
            # vectors (reference vllm/prompt_adapter/: PEFT prompt tuning)
            pad = jnp.zeros((x.shape[0] - nv, x.shape[1]),
                            prefix_embed.dtype)
            pe = jnp.concatenate([prefix_embed, pad], axis=0)
            use = (jnp.arange(x.shape[0]) < prefix_len)[:, None]
            return jnp.where(use, pe.astype(x.dtype), x)
    elif inject_embed is not None:
        def embed_override(x, inject_embed=inject_embed,
                           inject_pos=inject_pos):
            # multimodal splice (reference llava.py
            # merge_multimodal_embeddings): image-placeholder positions
            # take the projected patch embeddings; pad positions are
            # POSITIVE out-of-range so "drop" discards them (negative
            # indices would wrap)
            return x.at[inject_pos].set(
                inject_embed.astype(x.dtype), mode="drop")

    hidden, cache, (ks, vs, pfs) = forward_collect(
        params, cfg, token_ids, positions, cache, attn_fn, layer_xs,
        lora=lora, embed_override=embed_override)
    if not write_cache:
        last = jnp.take(hidden, jnp.clip(seq_len - 1, 0), axis=0)
        return last, ks, vs, pfs
    # Single cache-write epilogue across all layers (instead of 5 scatters
    # per layer): K, V, positions, metric init (+ prefill metric add).
    # ks/vs: [L, T, H, d]; pfs: [L, T, H]; slot_mappings: [L, T, H].
    d = cfg.head_size
    n_slots = cache.metrics.size
    # positive out-of-range sentinel: negative indices wrap in jnp scatters
    flat = jnp.where(slot_mappings >= 0, slot_mappings,
                     n_slots).reshape(-1)
    ksc = vsc = None
    if cache.k_scale is not None:
        from kvcompress_tpu.ops.kv_quant import quantize_kv
        ks, k_sc = quantize_kv(ks)
        vs, v_sc = quantize_kv(vs)
        ksc = cache.k_scale.reshape(-1).at[flat].set(
            k_sc.reshape(-1), mode="drop").reshape(cache.k_scale.shape)
        vsc = cache.v_scale.reshape(-1).at[flat].set(
            v_sc.reshape(-1), mode="drop").reshape(cache.v_scale.shape)
    kc = cache.k.reshape(-1, d).at[flat].set(
        ks.reshape(-1, d).astype(cache.k.dtype), mode="drop").reshape(
        cache.k.shape)
    vc = cache.v.reshape(-1, d).at[flat].set(
        vs.reshape(-1, d).astype(cache.v.dtype), mode="drop").reshape(
        cache.v.shape)
    pos_vals = jnp.broadcast_to(positions[None, :, None],
                                slot_mappings.shape).reshape(-1)
    pc = cache.positions.reshape(-1).at[flat].set(
        pos_vals, mode="drop").reshape(cache.positions.shape)
    mc = cache.metrics.reshape(-1).at[flat].set(0.0, mode="drop")
    if spec.record_metrics:
        mc = mc.at[flat].add(pfs.reshape(-1), mode="drop")
    mc = mc.reshape(cache.metrics.shape)
    cache = KVCache(kc, vc, mc, pc, ksc, vsc)
    last = jnp.take(hidden, jnp.clip(seq_len - 1, 0), axis=0)
    return last, cache


def prefill_cont(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,      # [T] padded chunk (tokens offset..offset+len)
    chunk_len: jax.Array,      # [] valid tokens in this chunk
    pre_ids: jax.Array,        # [L, H_kv, NB_OFF] prefix block ids (slot's
                               # first NB_OFF table entries; offset ==
                               # NB_OFF * block_size exactly)
    cache: KVCache,
    buffer_len: jax.Array,
    spec: AttentionSpec,
    lora=None,
    inject_embed=None,         # [N, D] multimodal embeds (chunk-local
    inject_pos=None,           # positions; out-of-chunk already dropped)
):
    """Chunked-prefill continuation: the pass for prompt tokens
    [offset, offset + chunk_len) whose prefix KVs are already cached.
    Per layer, the prefix K/V block rows are gathered from the paged cache
    and concatenated ahead of the chunk's fresh K/V; attention runs with
    q_offset so positions/causality/metrics are global. Returns
    (last_hidden [D], ks [L, T, H, d], vs, pfs [L, P + T, H]) - the caller
    writes fresh rows and (on the final chunk) scatters the prefix metric
    rows back. The reference declares chunked prefill unsupported with KVC
    (vllm/config.py chunked_prefill_enabled checks); this is beyond-parity
    insurance for prompts over the largest prefill bucket."""
    T = token_ids.shape[0]
    L, Hkv, NB_OFF = pre_ids.shape
    bs = cache.k.shape[1]
    P = NB_OFF * bs
    d = cfg.head_size
    positions = P + jnp.arange(T, dtype=jnp.int32)
    scale = attn_scale(cfg)
    assert not cfg.alibi and window_array(cfg) is None \
        and not cfg.kv_lora_rank and not cfg.prefix_lm, \
        "chunked prefill supports rope/full-attention causal models only"
    use_pallas = spec.impl in ("pallas", "interpret")

    def attn_fn(pre_ids_l, q, k, v, cache):
        kp = cache.k[pre_ids_l]            # [H, NB_OFF, bs, d] block rows
        vp = cache.v[pre_ids_l]
        if cache.k_scale is not None:
            kp = kp.astype(jnp.float32) * cache.k_scale[
                pre_ids_l][..., None]
            vp = vp.astype(jnp.float32) * cache.v_scale[
                pre_ids_l][..., None]
        kp = jnp.transpose(kp.reshape(Hkv, P, d), (1, 0, 2)).astype(q.dtype)
        vp = jnp.transpose(vp.reshape(Hkv, P, d), (1, 0, 2)).astype(q.dtype)
        k_all = jnp.concatenate([kp, k.astype(q.dtype)], axis=0)
        v_all = jnp.concatenate([vp, v.astype(q.dtype)], axis=0)
        if use_pallas:
            from kvcompress_tpu.ops.pallas import (
                prefill_attention as ppf)
            out, pf = ppf.prefill_attention(
                q, k_all, v_all, chunk_len, scale,
                metric_window=spec.metric_window, buffer_len=buffer_len,
                use_l2=spec.use_l2, use_average=spec.use_average,
                use_maxpool=spec.use_maxpool,
                record_metrics=spec.record_metrics,
                logit_cap=cfg.attn_logit_softcap,
                interpret=spec.impl == "interpret", q_offset=P)
        else:
            out, pf = att.prefill_attention(
                q, k_all, v_all, chunk_len, scale,
                metric_window=spec.metric_window,
                metric_block=spec.metric_block, buffer_len=buffer_len,
                use_l2=spec.use_l2, use_average=spec.use_average,
                use_maxpool=spec.use_maxpool,
                logit_cap=cfg.attn_logit_softcap, q_offset=P)
        return out, cache, (k, v, pf)

    embed_override = None
    if inject_embed is not None:
        def embed_override(x, inject_embed=inject_embed,
                           inject_pos=inject_pos):
            return x.at[inject_pos].set(
                inject_embed.astype(x.dtype), mode="drop")

    hidden, _, (ks, vs, pfs) = forward_collect(
        params, cfg, token_ids, positions, cache, attn_fn, pre_ids,
        lora=lora, embed_override=embed_override)
    last = jnp.take(hidden, jnp.clip(chunk_len - 1, 0), axis=0)
    return last, ks, vs, pfs


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
    lora=None,
) -> Tuple[jax.Array, KVCache]:
    """Batched single-token decode over per-head block tables. Returns
    hidden states [S, D] and the updated cache (reference
    flash_attn.py:1065-1097 decode branch + KVCAttention.forward_decode)."""
    scale = attn_scale(cfg)
    al = (jnp.asarray(alibi_slopes(cfg.num_heads)) if cfg.alibi else None)
    win = window_array(cfg)
    quantized = cache.k_scale is not None

    if (spec.impl == "pallas" and not cfg.alibi and win is None
            and not quantized):
        from kvcompress_tpu.ops.pallas import paged_attention as ppa
        decode_attn = ppa.paged_decode_attention
        extra_kw = {}
    else:
        decode_attn = att.paged_decode_attention
        extra_kw = {"alibi": al}

    def attn_fn(lxs, q, k, v, cache):
        if win is None:
            slot_mapping_l, bt_l, ctx_l = lxs
            w_kw = {}
        else:
            slot_mapping_l, bt_l, ctx_l, w_l = lxs
            w_kw = {"window": w_l}
        wrote = att.write_to_cache(
            cache.k, cache.v, cache.metrics, cache.positions,
            k, v,
            jnp.where(active[:, None], slot_mapping_l, -1),
            jnp.where(active, positions, -1),
            k_scale=cache.k_scale, v_scale=cache.v_scale)
        if quantized:
            kc, vc, mc, pc, ks, vs = wrote
            q_kw = {"k_scale": ks, "v_scale": vs}
        else:
            kc, vc, mc, pc = wrote
            ks = vs = None
            q_kw = {}
        out, mc = decode_attn(
            q, kc, vc, mc, pc, bt_l, ctx_l, positions, buffer_lens, scale,
            active=active, use_l2=spec.use_l2,
            record_metrics=spec.record_metrics,
            logit_cap=cfg.attn_logit_softcap, **extra_kw, **w_kw, **q_kw)
        return out, KVCache(kc, vc, mc, pc, ks, vs)

    layer_xs = (slot_mappings, block_tables, context_lens)
    if win is not None:
        layer_xs = layer_xs + (jnp.asarray(win),)
    hidden, cache = forward(
        params, cfg, token_ids, positions, cache, attn_fn, layer_xs,
        lora=lora)
    return hidden, cache


def decode_tail(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,      # [S]
    positions: jax.Array,      # [S]
    block_tables: jax.Array,   # [L, S, H_kv, nb]
    context_lens: jax.Array,   # [L, S, H_kv] (including tail + new token)
    tail_k: jax.Array,         # [L, S, H_kv, KT, d] burst tail (carry)
    tail_v: jax.Array,
    tail_row: jax.Array,       # [S] i32 row to write the new KV into
    tail_len: jax.Array,       # [S] i32 valid rows incl. the new one
    cache: KVCache,            # read-only here
    active: jax.Array,         # [S] bool
    spec: AttentionSpec,
    lora=None,
    mesh=None,                 # TP mesh: kernel runs per shard (shard_map)
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Production TPU decode: the paged cache is read-only; the burst's
    fresh KVs live in the dense tail buffers, written back once per burst
    by the engine (see engine/programs.py). Returns
    (hidden [S, D], tail_k', tail_v', m_cached [L, S, H, n], m_tail
    [L, S, H, KT])."""
    from kvcompress_tpu.ops.pallas import paged_attention as ppa

    S = token_ids.shape[0]
    scale = attn_scale(cfg)
    ctx_gated = jnp.where(active[None, :, None], context_lens, 0)

    tail_sharded = None
    if mesh is not None:
        from kvcompress_tpu.parallel.mesh import MODEL_AXIS
        if mesh.shape.get(MODEL_AXIS, 1) > 1:
            from kvcompress_tpu.parallel.shard_attn import (
                paged_decode_attention_tail_sharded)
            tail_sharded = paged_decode_attention_tail_sharded

    def attn_fn(lxs, q, k, v, cache_):
        tk_l, tv_l, bt_l, ctx_l = lxs
        # insert the new K/V into this layer's tail row (gated by active)
        si = jnp.arange(S)
        row = jnp.where(active, tail_row, tk_l.shape[2])  # drop if inactive
        tk_l = tk_l.at[si, :, row].set(
            k.astype(tk_l.dtype), mode="drop")
        tv_l = tv_l.at[si, :, row].set(
            v.astype(tv_l.dtype), mode="drop")
        if tail_sharded is not None:
            out, m_cached, m_tail = tail_sharded(
                mesh, q, tk_l, tv_l, tail_len, cache_.k, cache_.v, bt_l,
                ctx_l, scale, use_l2=spec.use_l2,
                record_metrics=spec.record_metrics,
                logit_cap=cfg.attn_logit_softcap,
                interpret=spec.impl == "interpret",
                k_scale=cache_.k_scale, v_scale=cache_.v_scale)
        else:
            out, m_cached, m_tail = ppa.paged_decode_attention_tail(
                q, tk_l, tv_l, tail_len, cache_.k, cache_.v, bt_l, ctx_l,
                scale, use_l2=spec.use_l2,
                record_metrics=spec.record_metrics,
                logit_cap=cfg.attn_logit_softcap,
                interpret=spec.impl == "interpret",
                k_scale=cache_.k_scale, v_scale=cache_.v_scale)
        return out, cache_, (tk_l, tv_l, m_cached, m_tail)

    hidden, cache, (tk, tv, m_cached, m_tail) = forward_collect(
        params, cfg, token_ids, positions, cache,
        attn_fn, (tail_k, tail_v, block_tables, ctx_gated), lora=lora)
    return hidden, tk, tv, m_cached, m_tail


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

    scale = attn_scale(cfg)

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
            logit_cap=cfg.attn_logit_softcap,
            interpret=spec.impl == "interpret")
        return out, KVCache(kc, vc, cache.metrics, cache.positions), m_contrib

    hidden, cache, m_stack = forward_collect(
        params, cfg, token_ids, positions, cache, attn_fn,
        (block_tables, ctx_gated))
    return hidden, cache, m_stack


def decode_multi(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,      # [S, Q] the current token + Q-1 proposals
    positions0: jax.Array,     # [S] position of the FIRST (current) token
    block_tables: jax.Array,   # [L, S, H_kv, nb]
    context_lens: jax.Array,   # [L, S, H_kv] INCLUDING the Q new tokens
    slot_mappings: jax.Array,  # [L, S, Q, H_kv] where each new KV goes
    cache: KVCache,
    active: jax.Array,         # [S] bool
    spec: AttentionSpec,
) -> Tuple[jax.Array, KVCache]:
    """Multi-token decode for speculative verification: processes Q tokens
    per sequence in one pass (KVs written first, then attention where query
    i sees positions <= its own). Metric recording is off on this path.
    Returns (hidden [S, Q, D], cache)."""
    S, Q = token_ids.shape
    scale = attn_scale(cfg)
    flat_tokens = token_ids.reshape(S * Q)
    positions = (positions0[:, None]
                 + jnp.arange(Q, dtype=jnp.int32)[None, :]).reshape(-1)

    quantized = cache.k_scale is not None

    def attn_fn(lxs, q, k, v, cache):
        sm_l, bt_l, ctx_l = lxs  # sm_l: [S, Q, H]
        wrote = att.write_to_cache(
            cache.k, cache.v, cache.metrics, cache.positions,
            k, v,
            jnp.where(active[:, None, None], sm_l, -1).reshape(S * Q, -1),
            jnp.where(active[:, None], positions.reshape(S, Q),
                      -1).reshape(-1),
            k_scale=cache.k_scale, v_scale=cache.v_scale)
        if quantized:
            kc, vc, mc, pc, ks, vs = wrote
            q_kw = {"k_scale": ks, "v_scale": vs}
        else:
            kc, vc, mc, pc = wrote
            ks = vs = None
            q_kw = {}
        out = att.paged_decode_attention_multi(
            q.reshape(S, Q, cfg.num_heads, cfg.head_size), kc, vc,
            bt_l, ctx_l, scale, active=active,
            logit_cap=cfg.attn_logit_softcap, **q_kw)
        return out.reshape(S * Q, cfg.num_heads, cfg.head_size), KVCache(
            kc, vc, mc, pc, ks, vs)

    hidden, cache = forward(
        params, cfg, flat_tokens, positions, cache, attn_fn,
        (slot_mappings, block_tables, context_lens))
    return hidden.reshape(S, Q, -1), cache
