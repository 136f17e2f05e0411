"""Jamba (attention/Mamba hybrid MoE) - model-level support.

The role of reference vllm/model_executor/models/jamba.py. Layer i is a
Mamba mixer except every `attn_layer_period`-th layer starting at
`attn_layer_offset` (GQA attention WITHOUT rope - position comes from the
SSM recurrence); the FFN is a sparse-MoE block on every
`expert_layer_period`-th layer starting at `expert_layer_offset`
(softmax -> top-k, NOT renormalized, HF JambaSparseMoeBlock) and a dense
gated MLP elsewhere. Selective-scan math lives in ops/mamba.py
(associative-scan prefill + fused decode step).

Serving scope - same as the reference's KV-COMPRESS path: the reference's
KVC engine blesses llama-family attention (vllm/kvcompress/README.md,
models/llama.py:328-336); jamba runs only on its VANILLA engine. Here the
KVC engine is the only engine, so JambaForCausalLM stays a loud rejection
at the serving surface (models/registry.py _KNOWN_UNSUPPORTED), while
this module provides the full model: HF-parity forward and stateful
greedy generation with per-layer (conv, ssm) states and a dense attention
cache - the building blocks an engine integration would consume.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kvcompress_tpu.ops import mamba as M


@dataclasses.dataclass
class JambaConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    d_state: int
    d_conv: int
    d_inner: int
    dt_rank: int
    attn_layer_offset: int
    attn_layer_period: int
    expert_layer_offset: int
    expert_layer_period: int
    num_experts: int
    num_experts_per_tok: int
    rms_norm_eps: float = 1e-6

    def is_attn(self, i: int) -> bool:
        return (i % self.attn_layer_period) == self.attn_layer_offset

    def is_moe(self, i: int) -> bool:
        return (self.num_experts > 1
                and (i % self.expert_layer_period)
                == self.expert_layer_offset)


def config_from_hf(hf: dict) -> JambaConfig:
    return JambaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads",
                            hf["num_attention_heads"]),
        d_state=hf.get("mamba_d_state", 16),
        d_conv=hf.get("mamba_d_conv", 4),
        d_inner=hf.get("mamba_expand", 2) * hf["hidden_size"],
        dt_rank=(hf["hidden_size"] // 16
                 if hf.get("mamba_dt_rank", "auto") == "auto"
                 else hf["mamba_dt_rank"]),
        attn_layer_offset=hf.get("attn_layer_offset", 4),
        attn_layer_period=hf.get("attn_layer_period", 8),
        expert_layer_offset=hf.get("expert_layer_offset", 1),
        expert_layer_period=hf.get("expert_layer_period", 2),
        num_experts=hf.get("num_experts", 1),
        num_experts_per_tok=hf.get("num_experts_per_tok", 1),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
    )


def config_from_hf_mamba(hf: dict) -> JambaConfig:
    """Pure Mamba (HF MambaForCausalLM / state-spaces checkpoints): every
    layer is a mixer, no attention, no FFN sub-block, no dt/B/C norms
    (reference vllm/model_executor/models/mamba.py)."""
    D = hf["hidden_size"]
    return JambaConfig(
        vocab_size=hf["vocab_size"], hidden_size=D,
        intermediate_size=0,
        num_layers=hf["num_hidden_layers"],
        num_heads=1, num_kv_heads=1,
        d_state=hf.get("state_size", 16),
        d_conv=hf.get("conv_kernel", 4),
        d_inner=hf.get("expand", 2) * D,
        dt_rank=(D // 16 if hf.get("time_step_rank", "auto") == "auto"
                 else hf["time_step_rank"]),
        attn_layer_offset=1 << 30, attn_layer_period=1 << 30,
        expert_layer_offset=0, expert_layer_period=1,
        num_experts=1, num_experts_per_tok=1,
        rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
    )


def params_from_hf_mamba(t: Dict[str, np.ndarray], cfg: JambaConfig,
                         dtype=jnp.float32) -> Dict[str, Any]:
    def g(k, transpose=False):
        a = np.asarray(t[k])
        return jnp.asarray(a.T if transpose else a, dtype)

    layers = []
    for i in range(cfg.num_layers):
        mp = f"backbone.layers.{i}.mixer."
        conv = np.asarray(t[mp + "conv1d.weight"])
        layers.append({
            "input_norm": g(f"backbone.layers.{i}.norm.weight"),
            "mamba": {
                "in_proj": g(mp + "in_proj.weight", transpose=True),
                "conv_w": jnp.asarray(conv[:, 0, :], dtype),
                "conv_b": g(mp + "conv1d.bias"),
                "x_proj": g(mp + "x_proj.weight", transpose=True),
                "dt_w": g(mp + "dt_proj.weight", transpose=True),
                "dt_b": g(mp + "dt_proj.bias"),
                "A_log": g(mp + "A_log"),
                "D": g(mp + "D"),
                "out_proj": g(mp + "out_proj.weight", transpose=True),
            },
        })
    return {
        "embed": g("backbone.embeddings.weight"),
        "final_norm": g("backbone.norm_f.weight"),
        "lm_head": g("lm_head.weight"),
        "layers": layers,
    }


def params_from_hf(t: Dict[str, np.ndarray], cfg: JambaConfig,
                   dtype=jnp.float32) -> Dict[str, Any]:
    def g(k, transpose=False):
        a = np.asarray(t[k])
        return jnp.asarray(a.T if transpose else a, dtype)

    layers: List[Dict[str, Any]] = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        lw: Dict[str, Any] = {
            "input_norm": g(p + "input_layernorm.weight"),
            "pre_ff_norm": g(p + "pre_ff_layernorm.weight"),
        }
        if cfg.is_attn(i):
            for n in ("q", "k", "v", "o"):
                lw[f"w{n}"] = g(p + f"self_attn.{n}_proj.weight",
                                transpose=True)
        else:
            mp = p + "mamba."
            conv = np.asarray(t[mp + "conv1d.weight"])  # [di, 1, k]
            lw["mamba"] = {
                "in_proj": g(mp + "in_proj.weight", transpose=True),
                "conv_w": jnp.asarray(conv[:, 0, :], dtype),
                "conv_b": g(mp + "conv1d.bias"),
                "x_proj": g(mp + "x_proj.weight", transpose=True),
                "dt_w": g(mp + "dt_proj.weight", transpose=True),
                "dt_b": g(mp + "dt_proj.bias"),
                "A_log": g(mp + "A_log"),
                "D": g(mp + "D"),
                "out_proj": g(mp + "out_proj.weight", transpose=True),
                "dt_ln": g(mp + "dt_layernorm.weight"),
                "b_ln": g(mp + "b_layernorm.weight"),
                "c_ln": g(mp + "c_layernorm.weight"),
            }
        ff = p + "feed_forward."
        if cfg.is_moe(i):
            lw["router"] = g(ff + "router.weight", transpose=True)
            lw["experts"] = [
                {n: g(ff + f"experts.{e}.{n}_proj.weight", transpose=True)
                 for n in ("gate", "up", "down")}
                for e in range(cfg.num_experts)]
        else:
            for n in ("gate", "up", "down"):
                lw[n] = g(ff + f"{n}_proj.weight", transpose=True)
        layers.append(lw)
    return {
        "embed": g("model.embed_tokens.weight"),
        "final_norm": g("model.final_layernorm.weight"),
        "lm_head": g("lm_head.weight"),
        "layers": layers,
    }


from kvcompress_tpu.ops.mamba import _rms  # noqa: E402  (one shared impl)


def _ffn(lw, cfg: JambaConfig, x):
    if "router" in lw:
        logits = (x.astype(jnp.float32)
                  @ lw["router"].astype(jnp.float32))       # [T, E]
        probs = jax.nn.softmax(logits, axis=-1)
        topv, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
        T = x.shape[0]
        w = jnp.zeros((T, cfg.num_experts), jnp.float32).at[
            jnp.arange(T)[:, None], topi].set(topv)  # NOT renormalized
        out = jnp.zeros_like(x, jnp.float32)
        for e, ew in enumerate(lw["experts"]):
            y = (jax.nn.silu((x @ ew["gate"]).astype(jnp.float32))
                 * (x @ ew["up"]).astype(jnp.float32)).astype(x.dtype)
            out = out + (y @ ew["down"]).astype(jnp.float32) * w[:, e:e + 1]
        return out.astype(x.dtype)
    y = (jax.nn.silu((x @ lw["gate"]).astype(jnp.float32))
         * (x @ lw["up"]).astype(jnp.float32)).astype(x.dtype)
    return y @ lw["down"]


def _attn_full(lw, cfg: JambaConfig, x, kv_cache=None):
    """No-rope GQA over the full (cached) context. kv_cache None ->
    self-contained causal attention over x; else (ks, vs) lists appended
    (model-level generation)."""
    T, D = x.shape
    H, KV = cfg.num_heads, cfg.num_kv_heads
    d = D // H
    q = (x @ lw["wq"]).reshape(T, H, d)
    k = (x @ lw["wk"]).reshape(T, KV, d)
    v = (x @ lw["wv"]).reshape(T, KV, d)
    if kv_cache is not None:
        k = jnp.concatenate([kv_cache[0], k], axis=0)
        v = jnp.concatenate([kv_cache[1], v], axis=0)
    S = k.shape[0]
    kr = jnp.repeat(k, H // KV, axis=1)
    vr = jnp.repeat(v, H // KV, axis=1)
    lg = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                    kr.astype(jnp.float32)) * d ** -0.5
    qpos = (S - T) + jnp.arange(T)
    mask = jnp.arange(S)[None, None, :] <= qpos[None, :, None]
    lg = jnp.where(mask, lg, -1e30)
    p = jax.nn.softmax(lg, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", p, vr.astype(jnp.float32))
    out = o.astype(x.dtype).reshape(T, H * d) @ lw["wo"]
    return out, (k, v)


def forward(params, cfg: JambaConfig, token_ids, states=None):
    """tokens [T] -> (logits [T, V], new_states). states = per-layer
    dicts: {"kv": (k, v)} for attention layers, {"conv", "ssm"} for mamba
    layers (None = fresh prompt)."""
    x = params["embed"][token_ids]
    new_states = []
    for i, lw in enumerate(params["layers"]):
        h = _rms(x, lw["input_norm"], cfg.rms_norm_eps)
        st = states[i] if states is not None else None
        if cfg.is_attn(i):
            a, kv = _attn_full(lw, cfg, h,
                               None if st is None else st["kv"])
            new_states.append({"kv": kv})
        else:
            if st is None:
                a, (conv, ssm) = M.mixer_prefill(lw["mamba"], cfg, h)
            else:
                a, conv, ssm = M.mixer_step(
                    lw["mamba"], cfg, h, st["conv"][None], st["ssm"][None])
                conv, ssm = conv[0], ssm[0]
            new_states.append({"conv": conv, "ssm": ssm})
        x = x + a
        if "pre_ff_norm" in lw:  # pure mamba has no FFN sub-block
            h = _rms(x, lw["pre_ff_norm"], cfg.rms_norm_eps)
            x = x + _ffn(lw, cfg, h)
    x = _rms(x, params["final_norm"], cfg.rms_norm_eps)
    logits = x.astype(jnp.float32) @ params["lm_head"].astype(
        jnp.float32).T
    return logits, new_states


def generate_greedy(params, cfg: JambaConfig, prompt: List[int],
                    max_tokens: int) -> List[int]:
    """Model-level stateful greedy generation: prompt via the prefill
    scan, then single-token steps against the carried (conv, ssm, kv)
    states - the decode regime an engine integration would jit."""
    logits, states = forward(params, cfg,
                             jnp.asarray(prompt, jnp.int32))
    out = [int(jnp.argmax(logits[-1]))]
    for _ in range(max_tokens - 1):
        logits, states = forward(
            params, cfg, jnp.asarray([out[-1]], jnp.int32), states)
        out.append(int(jnp.argmax(logits[-1])))
    return out
