"""BART encoder-decoder - model-level support.

The role of reference vllm/model_executor/models/bart.py. Same serving
scope as the reference's KV-COMPRESS path: cross-attention caches have no
KVC semantics there either (the reference serves bart on its vanilla
enc-dec runner only), so BartForConditionalGeneration stays a loud
rejection at this engine's serving surface while this module provides the
full model: HF-parity encoder/decoder forward and stateful greedy
generation with decoder self-attention + cross-attention caches.

Architecture notes (HF BartModel semantics, matched exactly):
- post-layernorm residuals: y = LN(x + sublayer(x))
- learned positional embeddings with Bart's +2 offset, then
  layernorm_embedding
- gelu FFNs with biases on every projection
- lm_head tied to the shared embedding + final_logits_bias
- generation starts from decoder_start_token_id (= eos, 2)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class BartConfig:
    vocab_size: int
    d_model: int
    encoder_layers: int
    decoder_layers: int
    num_heads: int
    ffn_dim: int
    max_positions: int
    decoder_start_token_id: int = 2
    eos_token_id: int = 2
    ln_eps: float = 1e-5


def config_from_hf(hf: dict) -> BartConfig:
    return BartConfig(
        vocab_size=hf["vocab_size"], d_model=hf["d_model"],
        encoder_layers=hf["encoder_layers"],
        decoder_layers=hf["decoder_layers"],
        num_heads=hf["encoder_attention_heads"],
        ffn_dim=hf["encoder_ffn_dim"],
        max_positions=hf["max_position_embeddings"],
        decoder_start_token_id=hf.get("decoder_start_token_id", 2),
        eos_token_id=hf.get("eos_token_id", 2),
    )


def params_from_hf(t: Dict[str, np.ndarray], cfg: BartConfig,
                   dtype=jnp.float32) -> Dict[str, Any]:
    def g(k, transpose=False):
        a = np.asarray(t[k])
        return jnp.asarray(a.T if transpose else a, dtype)

    def attn_block(p):
        return {n: g(f"{p}.{n}_proj.weight", transpose=True)
                for n in ("q", "k", "v", "out")} | {
                f"{n}_b": g(f"{p}.{n}_proj.bias")
                for n in ("q", "k", "v", "out")}

    def stack_layers(side, n_layers, cross):
        layers = []
        for i in range(n_layers):
            p = f"model.{side}.layers.{i}"
            lw = {
                "self": attn_block(p + ".self_attn"),
                "self_ln": g(p + ".self_attn_layer_norm.weight"),
                "self_ln_b": g(p + ".self_attn_layer_norm.bias"),
                "fc1": g(p + ".fc1.weight", transpose=True),
                "fc1_b": g(p + ".fc1.bias"),
                "fc2": g(p + ".fc2.weight", transpose=True),
                "fc2_b": g(p + ".fc2.bias"),
                "final_ln": g(p + ".final_layer_norm.weight"),
                "final_ln_b": g(p + ".final_layer_norm.bias"),
            }
            if cross:
                lw["cross"] = attn_block(p + ".encoder_attn")
                lw["cross_ln"] = g(p + ".encoder_attn_layer_norm.weight")
                lw["cross_ln_b"] = g(p + ".encoder_attn_layer_norm.bias")
            layers.append(lw)
        return layers

    return {
        "shared": g("model.shared.weight"),
        "enc_pos": g("model.encoder.embed_positions.weight"),
        "dec_pos": g("model.decoder.embed_positions.weight"),
        "enc_ln": g("model.encoder.layernorm_embedding.weight"),
        "enc_ln_b": g("model.encoder.layernorm_embedding.bias"),
        "dec_ln": g("model.decoder.layernorm_embedding.weight"),
        "dec_ln_b": g("model.decoder.layernorm_embedding.bias"),
        "logits_bias": g("final_logits_bias").reshape(-1),
        "encoder": stack_layers("encoder", cfg.encoder_layers, False),
        "decoder": stack_layers("decoder", cfg.decoder_layers, True),
    }


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _attn(aw, cfg: BartConfig, x, kv_src, causal, kv_cache=None):
    """Multi-head attention; kv_src provides K/V (x for self, encoder
    output for cross). kv_cache (k, v) prepends cached self-attn KVs."""
    T, D = x.shape
    h = cfg.num_heads
    d = D // h
    q = (x @ aw["q"] + aw["q_b"]).reshape(T, h, d) * (d ** -0.5)
    k = (kv_src @ aw["k"] + aw["k_b"]).reshape(-1, h, d)
    v = (kv_src @ aw["v"] + aw["v_b"]).reshape(-1, h, d)
    if kv_cache is not None:
        k = jnp.concatenate([kv_cache[0], k], axis=0)
        v = jnp.concatenate([kv_cache[1], v], axis=0)
    S = k.shape[0]
    lg = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                    k.astype(jnp.float32))
    if causal:
        qpos = (S - T) + jnp.arange(T)
        mask = jnp.arange(S)[None, None, :] <= qpos[None, :, None]
        lg = jnp.where(mask, lg, -1e30)
    p = jax.nn.softmax(lg, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", p,
                   v.astype(jnp.float32)).reshape(T, D)
    return o.astype(x.dtype) @ aw["out"] + aw["out_b"], (k, v)


def _ffn(lw, x):
    y = jax.nn.gelu(x @ lw["fc1"] + lw["fc1_b"], approximate=False)
    return y @ lw["fc2"] + lw["fc2_b"]


def encode(params, cfg: BartConfig, token_ids) -> jax.Array:
    """[T] -> encoder hidden states [T, D]."""
    T = token_ids.shape[0]
    x = params["shared"][token_ids]
    x = x + params["enc_pos"][jnp.arange(T) + 2]  # Bart's +2 offset
    x = _ln(x, params["enc_ln"], params["enc_ln_b"], cfg.ln_eps)
    for lw in params["encoder"]:
        a, _ = _attn(lw["self"], cfg, x, x, causal=False)
        x = _ln(x + a, lw["self_ln"], lw["self_ln_b"], cfg.ln_eps)
        x = _ln(x + _ffn(lw, x), lw["final_ln"], lw["final_ln_b"],
                cfg.ln_eps)
    return x


def decode_step(params, cfg: BartConfig, token_ids, pos0, enc_out,
                caches=None):
    """Decoder pass over [T] tokens starting at absolute position pos0,
    with per-layer self-attn caches. -> (logits [T, V], new_caches)."""
    T = token_ids.shape[0]
    x = params["shared"][token_ids]
    x = x + params["dec_pos"][pos0 + jnp.arange(T) + 2]
    x = _ln(x, params["dec_ln"], params["dec_ln_b"], cfg.ln_eps)
    new_caches = []
    for i, lw in enumerate(params["decoder"]):
        kv = caches[i] if caches is not None else None
        a, kv_new = _attn(lw["self"], cfg, x, x, causal=True, kv_cache=kv)
        x = _ln(x + a, lw["self_ln"], lw["self_ln_b"], cfg.ln_eps)
        c, _ = _attn(lw["cross"], cfg, x, enc_out, causal=False)
        x = _ln(x + c, lw["cross_ln"], lw["cross_ln_b"], cfg.ln_eps)
        x = _ln(x + _ffn(lw, x), lw["final_ln"], lw["final_ln_b"],
                cfg.ln_eps)
        new_caches.append(kv_new)
    logits = (x.astype(jnp.float32) @ params["shared"].astype(
        jnp.float32).T + params["logits_bias"])
    return logits, new_caches


def generate_greedy(params, cfg: BartConfig, input_ids: List[int],
                    max_tokens: int) -> List[int]:
    """Greedy enc-dec generation (HF semantics: decoder starts from
    decoder_start_token_id; stops on eos)."""
    enc_out = encode(params, cfg, jnp.asarray(input_ids, jnp.int32))
    out: List[int] = []
    tok = cfg.decoder_start_token_id
    caches = None
    for i in range(max_tokens):
        logits, caches = decode_step(
            params, cfg, jnp.asarray([tok], jnp.int32), i, enc_out,
            caches)
        tok = int(jnp.argmax(logits[-1]))
        out.append(tok)
        if tok == cfg.eos_token_id:
            break
    return out
