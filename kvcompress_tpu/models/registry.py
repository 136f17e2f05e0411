"""Model registry: HF architecture -> (ModelConfig builder, weight loader).

The counterpart of the reference's model zoo + weight-loading stack
(vllm/model_executor/models/ 64 files, vllm/model_executor/model_loader/):
each supported family is a ModelConfig recipe for the generic decoder
(models/decoder.py) plus a mapping from HF checkpoint tensor names to the
stacked-[L] parameter pytree. All loaders are torch-free (numpy safetensors).

Families covered: Llama 2/3/3.1 (incl. TinyLlama), Mistral, Qwen2(.5),
Qwen3, Qwen3-MoE, Gemma, Gemma2, Phi (phi-1.5/2), Phi-3, PhiMoE, GPT-2,
GPT-J, GPT-NeoX (pythia), OPT, Bloom, MPT, Falcon, Cohere (Command-R),
Persimmon, StableLM, Starcoder2, GPT-BigCode, InternLM2, Mixtral,
Qwen2-MoE, Granite, GraniteMoE, OLMo, OLMo2, OLMoE, Baichuan-7B,
GLM/GLM-4 (chatglm lineage), Nemotron, DBRX, DeepSeek-V2/V3 (MLA),
MiniCPM, Orion, Xverse, EXAONE.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from kvcompress_tpu.config import ModelConfig


def _g(hf: dict, *names, default=None):
    for n in names:
        if hf.get(n) is not None:
            return hf[n]
    return default


def _base_cfg(hf: dict, arch: str, model_name: str, **over) -> ModelConfig:
    heads = _g(hf, "num_attention_heads", "n_head", "n_heads")
    hidden = _g(hf, "hidden_size", "n_embd", "d_model")
    head_size = over.pop("head_size", None) or _g(
        hf, "head_dim", default=hidden // heads)
    kw = dict(
        model=model_name,
        num_layers=_g(hf, "num_hidden_layers", "n_layer", "num_layers",
                      "n_layers"),
        num_heads=heads,
        num_kv_heads=_g(hf, "num_key_value_heads", default=heads),
        head_size=head_size,
        hidden_size=hidden,
        intermediate_size=_g(hf, "intermediate_size", "ffn_dim",
                             default=4 * hidden),
        vocab_size=hf["vocab_size"],
        max_model_len=_g(hf, "max_position_embeddings", "n_positions",
                         default=8192),
        rope_theta=_g(hf, "rope_theta", default=10000.0),
        rope_scaling=hf.get("rope_scaling"),
        rms_norm_eps=_g(hf, "rms_norm_eps", "layer_norm_eps",
                        "layer_norm_epsilon", "layernorm_epsilon",
                        default=1e-5),
        tie_word_embeddings=_g(hf, "tie_word_embeddings", default=False),
        architecture=arch,
        hidden_act=_g(hf, "hidden_act", "activation_function", "hidden_activation",
                      default="silu"),
    )
    kw.update(over)
    return ModelConfig(**kw)


# ---------------------------------------------------------------------------
# Weight-loading helpers
# ---------------------------------------------------------------------------

class _Loader:
    """Accumulates stacked-[L] params from a HF tensor dict."""

    def __init__(self, t: Dict[str, np.ndarray], cfg: ModelConfig, dtype):
        self.t = t
        self.cfg = cfg
        self.dtype = dtype
        self.layers: Dict[str, Any] = {}
        self.top: Dict[str, Any] = {}

    def has(self, fmt: str) -> bool:
        return fmt.format(0) in self.t

    def stack(self, name: str, fmt: str, transpose: bool = False):
        L = self.cfg.num_layers
        arrs = [self.t[fmt.format(i)] for i in range(L)]
        self.layers[name] = jnp.asarray(
            np.stack([a.T if transpose else a for a in arrs]), self.dtype)

    def stack_opt(self, name: str, fmt: str, transpose: bool = False):
        if self.has(fmt):
            self.stack(name, fmt, transpose)

    def stack_fn(self, name: str, fn: Callable[[int], np.ndarray]):
        L = self.cfg.num_layers
        self.layers[name] = jnp.asarray(
            np.stack([fn(i) for i in range(L)]), self.dtype)

    def put(self, name: str, key: str, transpose: bool = False):
        a = self.t[key]
        self.top[name] = jnp.asarray(a.T if transpose else a, self.dtype)

    def put_opt(self, name: str, key: str, transpose: bool = False):
        if key in self.t:
            self.put(name, key, transpose)

    def params(self) -> Dict[str, Any]:
        out = dict(self.top)
        out["layers"] = self.layers
        return out


def _strip_language_model_prefix(t):
    """Drop a multimodal wrapper's language-model prefix so the text
    recipes see plain model.* names (transformers >= 4.52 uses
    model.language_model.* with a bare lm_head; older checkpoints use
    language_model.*)."""
    if any(k.startswith("model.language_model.") for k in t):
        pre = "model.language_model."
        ren = {("model." + k[len(pre):]): v
               for k, v in t.items() if k.startswith(pre)}
        if "lm_head.weight" in t:
            ren["lm_head.weight"] = t["lm_head.weight"]
        return ren
    pre = "language_model."
    return {k[len(pre):]: v for k, v in t.items() if k.startswith(pre)}


def _load_llama_style(
    t, cfg: ModelConfig, dtype,
    p: str = "model.layers.{}.",
    embed: str = "model.embed_tokens.weight",
    final_norm: str = "model.norm.weight",
    lm_head: str = "lm_head.weight",
    input_norm: str = "input_layernorm.weight",
    post_attn_norm: str = "post_attention_layernorm.weight",
    q: str = "self_attn.q_proj", k: str = "self_attn.k_proj",
    v: str = "self_attn.v_proj", o: str = "self_attn.o_proj",
    gate: str = "mlp.gate_proj", up: str = "mlp.up_proj",
    down: str = "mlp.down_proj",
    skip_mlp: bool = False,
) -> Dict[str, Any]:
    ld = _Loader(t, cfg, dtype)
    ld.stack("input_norm", p + input_norm)
    ld.stack_opt("input_norm_b",
                 p + input_norm.replace(".weight", ".bias"))
    if not cfg.shared_input_norm:
        ld.stack("post_attn_norm", p + post_attn_norm)
        ld.stack_opt("post_attn_norm_b",
                     p + post_attn_norm.replace(".weight", ".bias"))
    for name, proj in (("wq", q), ("wk", k), ("wv", v), ("wo", o)):
        ld.stack(name, p + proj + ".weight", transpose=True)
    for name, proj in (("bq", q), ("bk", k), ("bv", v)):
        ld.stack_opt(name, p + proj + ".bias")
    ld.stack_opt("bo", p + o + ".bias")
    if skip_mlp:
        pass
    elif cfg.mlp_type == "plain":
        ld.stack("w_fc1", p + gate + ".weight", transpose=True)
        ld.stack("w_fc2", p + down + ".weight", transpose=True)
        ld.stack_opt("b_fc1", p + gate + ".bias")
        ld.stack_opt("b_fc2", p + down + ".bias")
    else:
        ld.stack("w_gate", p + gate + ".weight", transpose=True)
        ld.stack("w_up", p + up + ".weight", transpose=True)
        ld.stack("w_down", p + down + ".weight", transpose=True)
        ld.stack_opt("b_gate", p + gate + ".bias")
        ld.stack_opt("b_up", p + up + ".bias")
        ld.stack_opt("b_down", p + down + ".bias")
    ld.put("embed", embed)
    ld.put("final_norm", final_norm)
    ld.put_opt("final_norm_b", final_norm.replace(".weight", ".bias"))
    if not cfg.tie_word_embeddings:
        ld.put("lm_head", lm_head)
    if cfg.lm_head_bias:
        ld.put_opt("lm_head_b", lm_head.replace(".weight", ".bias"))
    return ld.params()


# ---------------------------------------------------------------------------
# Per-architecture recipes
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _Arch:
    config_fn: Callable[[dict, str], ModelConfig]
    load_fn: Callable[[Dict[str, np.ndarray], ModelConfig, Any],
                      Dict[str, Any]]


_REGISTRY: Dict[str, _Arch] = {}


def _register(*names):
    def deco(pair):
        cfg_fn, load_fn = pair()
        for n in names:
            _REGISTRY[n] = _Arch(cfg_fn, load_fn)
        return pair
    return deco


@_register("LlavaForConditionalGeneration")
def _llava():
    """LLaVA (reference vllm/model_executor/models/llava.py): the text
    tower is a stock llama/mistral decoder whose prompt embeddings get
    image-patch vectors scattered in (engine mm_embed path); the CLIP
    vision tower + projector live in models/vision.py and are loaded
    separately by the LLM surface (weights.py load_multimodal)."""
    def cfg_fn(hf, name):
        tc = dict(hf["text_config"])
        arch = (tc.get("architectures") or [
            {"mistral": "MistralForCausalLM"}.get(
                tc.get("model_type"), "LlamaForCausalLM")])[0]
        tc["architectures"] = [arch]
        cfg = config_from_hf(tc, name)
        cfg.architecture = "LlavaForConditionalGeneration"
        cfg.image_token_index = hf.get("image_token_index", 32000)
        return cfg

    def load_fn(t, cfg, dtype):
        return _load_llama_style(_strip_language_model_prefix(t), cfg,
                                 dtype)

    return cfg_fn, load_fn


@_register("LlavaNextForConditionalGeneration")
def _llava_next():
    """LLaVA-Next / LLaVA-1.6 (reference
    vllm/model_executor/models/llava_next.py): same text tower as base
    llava; the AnyRes tiling + spatial_unpad merge (image_newline rows)
    happens on the vision side (models/vision.py
    llava_next_image_embed), producing a variable-length embedding run
    spliced at the placeholder positions like any other mm model."""
    def cfg_fn(hf, name):
        tc = dict(hf["text_config"])
        arch = (tc.get("architectures") or [
            {"mistral": "MistralForCausalLM"}.get(
                tc.get("model_type"), "LlamaForCausalLM")])[0]
        tc["architectures"] = [arch]
        cfg = config_from_hf(tc, name)
        cfg.architecture = "LlavaNextForConditionalGeneration"
        cfg.image_token_index = hf.get("image_token_index", 32000)
        return cfg

    def load_fn(t, cfg, dtype):
        return _load_llama_style(_strip_language_model_prefix(t), cfg,
                                 dtype)

    return cfg_fn, load_fn


@_register("MiniCPMV")
def _minicpmv():
    """MiniCPM-V 2.5/2.6 (reference vllm/model_executor/models/
    minicpmv.py): SigLIP "vpm" tower + perceiver resampler
    (models/vision.py minicpmv_resample) over a llama3 (2.5) or qwen2
    (2.6) text tower; the text fields live at the TOP level of the
    checkpoint config (reference get_version_by_config)."""
    def cfg_fn(hf, name):
        ver = str(hf.get("version", "2.5"))
        try:  # numeric compare: '2.10' > '2.6' (string compare misroutes)
            ver_t = tuple(int(x) for x in ver.split(".")[:2])
        except ValueError:
            ver_t = (2, 6)
        arch = ("Qwen2ForCausalLM" if ver_t >= (2, 6)
                else "LlamaForCausalLM")
        tc = dict(hf)
        tc["architectures"] = [arch]
        cfg = config_from_hf(tc, name)
        cfg.architecture = "MiniCPMV"
        cfg.image_token_index = hf.get("image_token_index",
                                       hf.get("unk_token_id", 0))
        return cfg

    def load_fn(t, cfg, dtype):
        # text tower lives under llm.* (llm.model.layers..., llm.lm_head)
        stripped = {k[len("llm."):]: v for k, v in t.items()
                    if k.startswith("llm.")}
        return _load_llama_style(stripped, cfg, dtype)

    return cfg_fn, load_fn


@_register("Phi3VForCausalLM")
def _phi3v():
    """Phi-3-Vision (reference vllm/model_executor/models/phi3v.py): the
    phi3 text tower with a CLIP + HD-transform image side
    (models/vision.py phi3v_image_embed). The checkpoint keeps the text
    fields at the TOP level (phi3 schema), so the text recipe runs on
    the same dict; image placeholder id is the reference's fixed 32044."""
    def cfg_fn(hf, name):
        tc = dict(hf)
        tc["architectures"] = ["Phi3ForCausalLM"]
        cfg = config_from_hf(tc, name)
        cfg.architecture = "Phi3VForCausalLM"
        # reference phi3v.py:56 _IMAGE_TOKEN_ID (fixed for real
        # checkpoints; overridable so tiny test checkpoints fit)
        cfg.image_token_index = hf.get("image_token_index", 32044)
        return cfg

    def load_fn(t, cfg, dtype):
        return _REGISTRY["Phi3ForCausalLM"].load_fn(t, cfg, dtype)

    return cfg_fn, load_fn


@_register("UltravoxModel")
def _ultravox():
    """Ultravox (reference vllm/model_executor/models/ultravox.py): the
    AUDIO modality - whisper encoder + stack-frames projector
    (models/vision.py ultravox_audio_embed) over a stock llama text
    tower; <|audio|> placeholders (audio_token_index) splice the
    projected frames through the same mm_embed path as images."""
    def cfg_fn(hf, name):
        tc = dict(hf["text_config"])
        arch = (tc.get("architectures") or [
            {"mistral": "MistralForCausalLM",
             "qwen2": "Qwen2ForCausalLM"}.get(
                tc.get("model_type"), "LlamaForCausalLM")])[0]
        tc["architectures"] = [arch]
        cfg = config_from_hf(tc, name)
        cfg.architecture = "UltravoxModel"
        cfg.audio_token_index = hf.get("audio_token_index", 32000)
        return cfg

    def load_fn(t, cfg, dtype):
        return _load_llama_style(_strip_language_model_prefix(t), cfg,
                                 dtype)

    return cfg_fn, load_fn


@_register("InternVLForConditionalGeneration")
def _internvl():
    """InternVL (reference vllm/model_executor/models/internvl.py +
    intern_vit.py; HF-native InternVLForConditionalGeneration): InternViT
    tower + pixel-shuffle + MLP projector (models/vision.py
    internvl_image_embed) over a stock qwen2/llama text tower."""
    def cfg_fn(hf, name):
        tc = dict(hf["text_config"])
        arch = (tc.get("architectures") or [
            {"llama": "LlamaForCausalLM"}.get(
                tc.get("model_type"), "Qwen2ForCausalLM")])[0]
        tc["architectures"] = [arch]
        cfg = config_from_hf(tc, name)
        cfg.architecture = "InternVLForConditionalGeneration"
        cfg.image_token_index = hf.get("image_token_id", 151667)
        return cfg

    def load_fn(t, cfg, dtype):
        return _load_llama_style(_strip_language_model_prefix(t), cfg,
                                 dtype)

    return cfg_fn, load_fn


@_register("ChameleonForConditionalGeneration")
def _chameleon():
    """Chameleon (reference vllm/model_executor/models/chameleon.py):
    llama-style decoder with per-head q/k LAYERNORM (qk_norm_per_head)
    and, for the 30B swin_norm variant, norm-after-sublayer ordering
    (our no_pre_norm + use_post_norms composition). Images are VQ-VAE
    tokenized into TEXT ids (models/vision.py chameleon_image_tokens) -
    the engine never sees an embedding splice, just tokens."""
    def cfg_fn(hf, name):
        swin = {"no_pre_norm": True, "use_post_norms": True} \
            if hf.get("swin_norm") else {}
        cfg = _base_cfg(hf, "ChameleonForConditionalGeneration", name,
                        qk_norm_per_head=True, **swin)
        vm = hf.get("vocabulary_map") or {}
        cfg.image_token_index = vm.get("<image>")
        img_toks = sorted(v for k, v in vm.items()
                          if k.startswith("IMGIMG"))
        cfg.logit_suppress_tokens = tuple(img_toks) or None
        return cfg

    def load_fn(t, cfg, dtype):
        params = _load_llama_style(t, cfg, dtype)
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        # HF ChameleonLayerNorm weights are [H, head_dim] (per-head affine)
        ld.stack("q_norm", p + "self_attn.q_norm.weight")
        ld.stack("q_norm_b", p + "self_attn.q_norm.bias")
        ld.stack("k_norm", p + "self_attn.k_norm.weight")
        ld.stack("k_norm_b", p + "self_attn.k_norm.bias")
        params["layers"].update(ld.params()["layers"])
        if cfg.use_post_norms:
            # swin ordering re-purposes the same checkpoint norms: the
            # "input" norm is applied to the ATTENTION OUTPUT, the
            # "post_attention" norm to the MLP OUTPUT (HF
            # ChameleonSwinDecoderLayer.forward)
            lay = params["layers"]
            lay["post_attn_out_norm"] = lay.pop("input_norm")
            lay["post_mlp_norm"] = lay.pop("post_attn_norm")
        return params

    return cfg_fn, load_fn


@_register("PaliGemmaForConditionalGeneration")
def _paligemma():
    """PaliGemma (reference vllm/model_executor/models/paligemma.py):
    gemma text tower + SigLIP vision tower (models/vision.py
    paligemma_image_embed) + single-linear projector. Unlike the
    reference (which serves it causally), the prompt runs as a true
    prefix-LM (cfg.prefix_lm -> bidirectional prompt attention in the
    XLA prefill, matching HF modeling_paligemma's inference mask)."""
    def cfg_fn(hf, name):
        tc = dict(hf["text_config"])
        arch = (tc.get("architectures") or [
            {"gemma2": "Gemma2ForCausalLM"}.get(
                tc.get("model_type"), "GemmaForCausalLM")])[0]
        tc["architectures"] = [arch]
        cfg = config_from_hf(tc, name)
        if cfg.sliding_window:
            raise ValueError(
                "paligemma with a sliding-window text tower (paligemma2/"
                "gemma2) is not supported: windowed masking composes "
                "incorrectly with the bidirectional prefix")
        cfg.architecture = "PaliGemmaForConditionalGeneration"
        cfg.image_token_index = hf.get("image_token_index", 257152)
        cfg.prefix_lm = True
        return cfg

    def load_fn(t, cfg, dtype):
        return _load_llama_style(_strip_language_model_prefix(t), cfg,
                                 dtype)

    return cfg_fn, load_fn


@_register("LlamaForCausalLM", "MistralForCausalLM")
def _llama():
    def cfg_fn(hf, name):
        return _base_cfg(hf, (hf.get("architectures") or ["LlamaForCausalLM"])[0], name,
                         attention_bias=hf.get("attention_bias", False),
                         qkv_bias=hf.get("attention_bias", False),
                         sliding_window=hf.get("sliding_window"))
    return cfg_fn, _load_llama_style


@_register("Qwen2ForCausalLM")
def _qwen2():
    def cfg_fn(hf, name):
        # every Qwen2 config SHIPS a sliding_window value but gates it
        # behind use_sliding_window (default False); passing it through
        # unconditionally demoted the whole family off the pallas kernels
        return _base_cfg(hf, "Qwen2ForCausalLM", name, qkv_bias=True,
                         sliding_window=(hf.get("sliding_window")
                                         if hf.get("use_sliding_window")
                                         else None))
    return cfg_fn, _load_llama_style


@_register("GraniteForCausalLM")
def _granite():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "GraniteForCausalLM", name,
            embedding_multiplier=hf.get("embedding_multiplier", 1.0),
            residual_multiplier=hf.get("residual_multiplier", 1.0),
            attention_scale=hf.get("attention_multiplier"),
            logits_scaling=hf.get("logits_scaling", 1.0))
    return cfg_fn, _load_llama_style


@_register("OlmoForCausalLM")
def _olmo():
    def cfg_fn(hf, name):
        # OLMo uses non-parametric layernorm; HF stores no norm weights.
        return _base_cfg(hf, "OlmoForCausalLM", name, norm_type="layernorm",
                         rms_norm_eps=1e-5, clip_qkv=hf.get("clip_qkv"))

    def load_fn(t, cfg, dtype):
        params = _load_llama_style_olmo(t, cfg, dtype)
        return params

    def _load_llama_style_olmo(t, cfg, dtype):
        ld = _Loader(t, cfg, dtype)
        D, L = cfg.hidden_size, cfg.num_layers
        ones = jnp.ones((L, D), dtype)
        p = "model.layers.{}."
        for name, proj in (("wq", "self_attn.q_proj"),
                           ("wk", "self_attn.k_proj"),
                           ("wv", "self_attn.v_proj"),
                           ("wo", "self_attn.o_proj"),
                           ("w_gate", "mlp.gate_proj"),
                           ("w_up", "mlp.up_proj"),
                           ("w_down", "mlp.down_proj")):
            ld.stack(name, p + proj + ".weight", transpose=True)
        ld.layers["input_norm"] = ones
        ld.layers["post_attn_norm"] = ones
        ld.put("embed", "model.embed_tokens.weight")
        ld.top["final_norm"] = jnp.ones((D,), dtype)
        if not cfg.tie_word_embeddings:
            ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("GemmaForCausalLM")
def _gemma():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "GemmaForCausalLM", name,
            head_size=hf.get("head_dim", 256),
            # HF GemmaMLP IGNORES legacy configs' hidden_act="gelu" and
            # forces tanh-gelu whenever hidden_activation is unset
            hidden_act=hf.get("hidden_activation") or "gelu_pytorch_tanh",
            rmsnorm_offset=True, tie_word_embeddings=True,
            embedding_multiplier=hf["hidden_size"] ** 0.5)
    return cfg_fn, _load_llama_style


@_register("Gemma2ForCausalLM")
def _gemma2():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "Gemma2ForCausalLM", name,
            head_size=hf.get("head_dim", 256),
            # HF GemmaMLP IGNORES legacy configs' hidden_act="gelu" and
            # forces tanh-gelu whenever hidden_activation is unset
            hidden_act=hf.get("hidden_activation") or "gelu_pytorch_tanh",
            rmsnorm_offset=True, tie_word_embeddings=True,
            embedding_multiplier=hf["hidden_size"] ** 0.5,
            use_post_norms=True,
            attention_scale=hf.get("query_pre_attn_scalar",
                                   hf.get("head_dim", 256)) ** -0.5,
            attn_logit_softcap=hf.get("attn_logit_softcapping"),
            logit_soft_cap=hf.get("final_logit_softcapping"),
            # gemma2 alternates sliding/full attention: even layers
            # windowed (HF Gemma2Attention: sliding iff not layer_idx % 2)
            sliding_window=hf.get("sliding_window"),
            sliding_window_every=2)

    def load_fn(t, cfg, dtype):
        params = _load_llama_style(
            t, cfg, dtype, post_attn_norm="pre_feedforward_layernorm.weight")
        ld = _Loader(t, cfg, dtype)
        ld.stack("post_attn_out_norm",
                 "model.layers.{}.post_attention_layernorm.weight")
        ld.stack("post_mlp_norm",
                 "model.layers.{}.post_feedforward_layernorm.weight")
        params["layers"].update(ld.layers)
        return params

    return cfg_fn, load_fn


@_register("Phi3ForCausalLM")
def _phi3():
    def cfg_fn(hf, name):
        return _base_cfg(hf, "Phi3ForCausalLM", name,
                         sliding_window=hf.get("sliding_window"))

    def load_fn(t, cfg, dtype):
        Hq, Hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
        I = cfg.intermediate_size
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        # fused qkv_proj [(Hq+2Hkv)*d, D] in q,k,v order
        qkv = lambda i: t[f"model.layers.{i}.self_attn.qkv_proj.weight"].T
        ld.stack_fn("wq", lambda i: qkv(i)[:, :Hq * d])
        ld.stack_fn("wk", lambda i: qkv(i)[:, Hq * d:(Hq + Hkv) * d])
        ld.stack_fn("wv", lambda i: qkv(i)[:, (Hq + Hkv) * d:])
        ld.stack("wo", p + "self_attn.o_proj.weight", transpose=True)
        gu = lambda i: t[f"model.layers.{i}.mlp.gate_up_proj.weight"].T
        ld.stack_fn("w_gate", lambda i: gu(i)[:, :I])
        ld.stack_fn("w_up", lambda i: gu(i)[:, I:])
        ld.stack("w_down", p + "mlp.down_proj.weight", transpose=True)
        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.norm.weight")
        if not cfg.tie_word_embeddings:
            ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("PhiForCausalLM")
def _phi():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "PhiForCausalLM", name,
            norm_type="layernorm", norm_bias=True,
            parallel_residual=True, shared_input_norm=True,
            partial_rotary_factor=hf.get("partial_rotary_factor", 0.5),
            mlp_type="plain", mlp_bias=True,
            attention_bias=True, qkv_bias=True, o_bias=True,
            lm_head_bias=True,
            hidden_act=hf.get("hidden_act", "gelu_new"))

    def load_fn(t, cfg, dtype):
        return _load_llama_style(
            t, cfg, dtype,
            final_norm="model.final_layernorm.weight",
            input_norm="input_layernorm.weight",
            o="self_attn.dense", gate="mlp.fc1", down="mlp.fc2")

    return cfg_fn, load_fn


@_register("GPT2LMHeadModel")
def _gpt2():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "GPT2LMHeadModel", name,
            num_layers=hf["n_layer"], num_heads=hf["n_head"],
            num_kv_heads=hf["n_head"],
            hidden_size=hf["n_embd"],
            head_size=hf["n_embd"] // hf["n_head"],
            intermediate_size=hf.get("n_inner") or 4 * hf["n_embd"],
            max_model_len=hf.get("n_positions", 1024),
            norm_type="layernorm", norm_bias=True,
            pos_embedding="learned", mlp_type="plain", mlp_bias=True,
            attention_bias=True, qkv_bias=True, o_bias=True,
            tie_word_embeddings=True,
            hidden_act=hf.get("activation_function", "gelu_new"))

    def load_fn(t, cfg, dtype):
        D = cfg.hidden_size
        ld = _Loader(t, cfg, dtype)
        p = "h.{}."
        pre = "" if "h.0.ln_1.weight" in t else "transformer."
        p = pre + p
        ld.stack("input_norm", p + "ln_1.weight")
        ld.stack("input_norm_b", p + "ln_1.bias")
        ld.stack("post_attn_norm", p + "ln_2.weight")
        ld.stack("post_attn_norm_b", p + "ln_2.bias")
        # Conv1D layout: weight [in, out] (no transpose needed)
        ca = lambda i: t[f"{pre}h.{i}.attn.c_attn.weight"]
        cb = lambda i: t[f"{pre}h.{i}.attn.c_attn.bias"]
        ld.stack_fn("wq", lambda i: ca(i)[:, :D])
        ld.stack_fn("wk", lambda i: ca(i)[:, D:2 * D])
        ld.stack_fn("wv", lambda i: ca(i)[:, 2 * D:])
        ld.stack_fn("bq", lambda i: cb(i)[:D])
        ld.stack_fn("bk", lambda i: cb(i)[D:2 * D])
        ld.stack_fn("bv", lambda i: cb(i)[2 * D:])
        ld.stack("wo", p + "attn.c_proj.weight")
        ld.stack("bo", p + "attn.c_proj.bias")
        ld.stack("w_fc1", p + "mlp.c_fc.weight")
        ld.stack("b_fc1", p + "mlp.c_fc.bias")
        ld.stack("w_fc2", p + "mlp.c_proj.weight")
        ld.stack("b_fc2", p + "mlp.c_proj.bias")
        ld.put("embed", pre + "wte.weight")
        ld.put("pos_embed", pre + "wpe.weight")
        ld.put("final_norm", pre + "ln_f.weight")
        ld.put("final_norm_b", pre + "ln_f.bias")
        return ld.params()

    return cfg_fn, load_fn


@_register("OPTForCausalLM")
def _opt():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "OPTForCausalLM", name,
            intermediate_size=hf["ffn_dim"],
            norm_type="layernorm", norm_bias=True,
            pos_embedding="learned", learned_pos_offset=2,
            mlp_type="plain", mlp_bias=True,
            attention_bias=True, qkv_bias=True, o_bias=True,
            tie_word_embeddings=True,
            hidden_act=hf.get("activation_function", "relu"))

    def load_fn(t, cfg, dtype):
        pre = ("model.decoder." if "model.decoder.embed_tokens.weight" in t
               else "decoder.")
        params = _load_llama_style(
            t, cfg, dtype, p=pre + "layers.{}.",
            embed=pre + "embed_tokens.weight",
            final_norm=pre + "final_layer_norm.weight",
            input_norm="self_attn_layer_norm.weight",
            post_attn_norm="final_layer_norm.weight",
            o="self_attn.out_proj", gate="fc1", down="fc2")
        ld = _Loader(t, cfg, dtype)
        ld.put("pos_embed", pre + "embed_positions.weight")
        params.update(ld.top)
        return params

    return cfg_fn, load_fn


@_register("GPTNeoXForCausalLM")
def _gptneox():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "GPTNeoXForCausalLM", name,
            norm_type="layernorm", norm_bias=True,
            parallel_residual=hf.get("use_parallel_residual", True),
            partial_rotary_factor=hf.get("rotary_pct", 0.25),
            rope_theta=hf.get("rotary_emb_base", 10000),
            mlp_type="plain", mlp_bias=True,
            attention_bias=True, qkv_bias=True, o_bias=True,
            hidden_act=hf.get("hidden_act", "gelu"))

    def load_fn(t, cfg, dtype):
        H, d = cfg.num_heads, cfg.head_size
        ld = _Loader(t, cfg, dtype)
        p = "gpt_neox.layers.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("input_norm_b", p + "input_layernorm.bias")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        ld.stack("post_attn_norm_b", p + "post_attention_layernorm.bias")
        # fused qkv [3*D, D] interleaved per head: [H, 3, d] on the out dim
        def qkv_part(i, j):
            w = t[f"gpt_neox.layers.{i}.attention.query_key_value.weight"]
            return w.reshape(H, 3, d, -1)[:, j].reshape(H * d, -1).T
        def qkv_bias(i, j):
            b = t[f"gpt_neox.layers.{i}.attention.query_key_value.bias"]
            return b.reshape(H, 3, d)[:, j].reshape(H * d)
        ld.stack_fn("wq", lambda i: qkv_part(i, 0))
        ld.stack_fn("wk", lambda i: qkv_part(i, 1))
        ld.stack_fn("wv", lambda i: qkv_part(i, 2))
        ld.stack_fn("bq", lambda i: qkv_bias(i, 0))
        ld.stack_fn("bk", lambda i: qkv_bias(i, 1))
        ld.stack_fn("bv", lambda i: qkv_bias(i, 2))
        ld.stack("wo", p + "attention.dense.weight", transpose=True)
        ld.stack("bo", p + "attention.dense.bias")
        ld.stack("w_fc1", p + "mlp.dense_h_to_4h.weight", transpose=True)
        ld.stack("b_fc1", p + "mlp.dense_h_to_4h.bias")
        ld.stack("w_fc2", p + "mlp.dense_4h_to_h.weight", transpose=True)
        ld.stack("b_fc2", p + "mlp.dense_4h_to_h.bias")
        ld.put("embed", "gpt_neox.embed_in.weight")
        ld.put("final_norm", "gpt_neox.final_layer_norm.weight")
        ld.put("final_norm_b", "gpt_neox.final_layer_norm.bias")
        ld.put("lm_head", "embed_out.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("StableLmForCausalLM")
def _stablelm():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "StableLmForCausalLM", name,
            norm_type="layernorm", norm_bias=True,
            partial_rotary_factor=hf.get("partial_rotary_factor", 0.25),
            parallel_residual=hf.get("use_parallel_residual", False),
            qkv_bias=hf.get("use_qkv_bias", False),
            attention_bias=hf.get("use_qkv_bias", False),
            hidden_act=hf.get("hidden_act", "silu"))
    return cfg_fn, _load_llama_style


@_register("Starcoder2ForCausalLM")
def _starcoder2():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "Starcoder2ForCausalLM", name,
            norm_type="layernorm", norm_bias=True,
            mlp_type="plain", mlp_bias=hf.get("use_bias", True),
            attention_bias=hf.get("use_bias", True),
            qkv_bias=hf.get("use_bias", True),
            o_bias=hf.get("use_bias", True),
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
            rms_norm_eps=hf.get("norm_epsilon", 1e-5),
            hidden_act=hf.get("hidden_act", "gelu_pytorch_tanh"),
            sliding_window=hf.get("sliding_window"))

    def load_fn(t, cfg, dtype):
        return _load_llama_style(
            t, cfg, dtype,
            gate="mlp.c_fc", down="mlp.c_proj")

    return cfg_fn, load_fn


@_register("InternLM2ForCausalLM")
def _internlm2():
    def cfg_fn(hf, name):
        return _base_cfg(hf, "InternLM2ForCausalLM", name)

    def load_fn(t, cfg, dtype):
        Hq, Hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
        g = Hq // Hkv
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        ld.stack("input_norm", p + "attention_norm.weight")
        ld.stack("post_attn_norm", p + "ffn_norm.weight")
        # wqkv [(g+2)*Hkv*d, D]: per kv group, g query heads then k then v
        def wqkv(i, which):
            w = t[f"model.layers.{i}.attention.wqkv.weight"]
            w = w.reshape(Hkv, g + 2, d, -1)
            if which == "q":
                return w[:, :g].reshape(Hq * d, -1).T
            j = g if which == "k" else g + 1
            return w[:, j].reshape(Hkv * d, -1).T
        ld.stack_fn("wq", lambda i: wqkv(i, "q"))
        ld.stack_fn("wk", lambda i: wqkv(i, "k"))
        ld.stack_fn("wv", lambda i: wqkv(i, "v"))
        ld.stack("wo", p + "attention.wo.weight", transpose=True)
        ld.stack("w_gate", p + "feed_forward.w1.weight", transpose=True)
        ld.stack("w_up", p + "feed_forward.w3.weight", transpose=True)
        ld.stack("w_down", p + "feed_forward.w2.weight", transpose=True)
        ld.put("embed", "model.tok_embeddings.weight")
        ld.put("final_norm", "model.norm.weight")
        ld.put("lm_head", "output.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("BaichuanForCausalLM", "BaiChuanForCausalLM")
def _baichuan():
    def cfg_fn(hf, name):
        # 7B variant (rope). The 13B variant shares the arch string but
        # was trained with ALIBI and no rotary (the reference picks alibi
        # when hidden_size != 4096, baichuan.py) - loading it through the
        # rope recipe would serve garbage silently.
        if hf.get("hidden_size", 4096) != 4096:
            raise ValueError(
                "Baichuan-13B (alibi variant, hidden_size "
                f"{hf.get('hidden_size')}) is unsupported; only the 7B "
                "rope variant loads")
        return _base_cfg(hf, "BaichuanForCausalLM", name)

    def load_fn(t, cfg, dtype):
        D = cfg.hidden_size
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        wp = lambda i: t[f"model.layers.{i}.self_attn.W_pack.weight"].T
        ld.stack_fn("wq", lambda i: wp(i)[:, :D])
        ld.stack_fn("wk", lambda i: wp(i)[:, D:2 * D])
        ld.stack_fn("wv", lambda i: wp(i)[:, 2 * D:])
        ld.stack("wo", p + "self_attn.o_proj.weight", transpose=True)
        ld.stack("w_gate", p + "mlp.gate_proj.weight", transpose=True)
        ld.stack("w_up", p + "mlp.up_proj.weight", transpose=True)
        ld.stack("w_down", p + "mlp.down_proj.weight", transpose=True)
        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.norm.weight")
        ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("MixtralForCausalLM")
def _mixtral():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "MixtralForCausalLM", name,
            num_experts=hf["num_local_experts"],
            num_experts_per_tok=hf["num_experts_per_tok"],
            moe_norm_topk_prob=True,
            sliding_window=hf.get("sliding_window"))

    def load_fn(t, cfg, dtype):
        E = cfg.num_experts
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        for name, proj in (("wq", "self_attn.q_proj"),
                           ("wk", "self_attn.k_proj"),
                           ("wv", "self_attn.v_proj"),
                           ("wo", "self_attn.o_proj")):
            ld.stack(name, p + proj + ".weight", transpose=True)
        ld.stack("router", p + "block_sparse_moe.gate.weight",
                 transpose=True)
        for name, wi in (("experts_gate", "w1"), ("experts_up", "w3"),
                         ("experts_down", "w2")):
            ld.stack_fn(name, lambda i, wi=wi: np.stack([
                t[f"model.layers.{i}.block_sparse_moe.experts.{e}.{wi}"
                  f".weight"].T
                for e in range(E)]))
        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.norm.weight")
        ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("Qwen2MoeForCausalLM")
def _qwen2moe():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "Qwen2MoeForCausalLM", name, qkv_bias=True,
            num_experts=hf["num_experts"],
            num_experts_per_tok=hf["num_experts_per_tok"],
            moe_intermediate_size=hf["moe_intermediate_size"],
            moe_norm_topk_prob=hf.get("norm_topk_prob", False),
            moe_shared_expert_size=hf.get("shared_expert_intermediate_size",
                                          0))

    def load_fn(t, cfg, dtype):
        E = cfg.num_experts
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        for name, proj in (("wq", "self_attn.q_proj"),
                           ("wk", "self_attn.k_proj"),
                           ("wv", "self_attn.v_proj"),
                           ("wo", "self_attn.o_proj")):
            ld.stack(name, p + proj + ".weight", transpose=True)
        for name, proj in (("bq", "self_attn.q_proj"),
                           ("bk", "self_attn.k_proj"),
                           ("bv", "self_attn.v_proj")):
            ld.stack(name, p + proj + ".bias")
        ld.stack("router", p + "mlp.gate.weight", transpose=True)
        for name, wi in (("experts_gate", "gate_proj"),
                         ("experts_up", "up_proj"),
                         ("experts_down", "down_proj")):
            ld.stack_fn(name, lambda i, wi=wi: np.stack([
                t[f"model.layers.{i}.mlp.experts.{e}.{wi}.weight"].T
                for e in range(E)]))
        ld.stack("shared_gate", p + "mlp.shared_expert.gate_proj.weight",
                 transpose=True)
        ld.stack("shared_up", p + "mlp.shared_expert.up_proj.weight",
                 transpose=True)
        ld.stack("shared_down", p + "mlp.shared_expert.down_proj.weight",
                 transpose=True)
        ld.stack("shared_router", p + "mlp.shared_expert_gate.weight",
                 transpose=True)
        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.norm.weight")
        ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn




@_register("GPTJForCausalLM")
def _gptj():
    def cfg_fn(hf, name):
        head = hf["n_embd"] // hf["n_head"]
        return _base_cfg(
            hf, "GPTJForCausalLM", name,
            norm_type="layernorm", norm_bias=True,
            parallel_residual=True, shared_input_norm=True,
            partial_rotary_factor=hf.get("rotary_dim", head) / head,
            rope_interleaved=True,
            mlp_type="plain", mlp_bias=True, o_bias=False,
            lm_head_bias=True,
            hidden_act=hf.get("activation_function", "gelu_new"))

    def load_fn(t, cfg, dtype):
        params = _load_llama_style(
            t, cfg, dtype, p="transformer.h.{}.",
            embed="transformer.wte.weight",
            final_norm="transformer.ln_f.weight",
            input_norm="ln_1.weight",
            q="attn.q_proj", k="attn.k_proj", v="attn.v_proj",
            o="attn.out_proj", gate="mlp.fc_in", down="mlp.fc_out")
        return params

    return cfg_fn, load_fn


@_register("FalconForCausalLM")
def _falcon():
    def cfg_fn(hf, name):
        new_arch = hf.get("new_decoder_architecture", False)
        heads = hf["num_attention_heads"]
        if new_arch:
            kv = hf.get("num_kv_heads", heads)
        elif hf.get("multi_query", True):
            kv = 1
        else:
            kv = heads
        return _base_cfg(
            hf, "FalconForCausalLM", name,
            num_kv_heads=kv,
            norm_type="layernorm", norm_bias=True,
            parallel_residual=hf.get("parallel_attn", True),
            shared_input_norm=not new_arch,
            mlp_type="plain", mlp_bias=hf.get("bias", False),
            attention_bias=hf.get("bias", False),
            qkv_bias=hf.get("bias", False),
            o_bias=hf.get("bias", False),
            alibi=hf.get("alibi", False),
            pos_embedding="none" if hf.get("alibi", False) else "rope",
            tie_word_embeddings=True,
            rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
            hidden_act="gelu")

    def load_fn(t, cfg, dtype):
        Hq, Hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
        g = Hq // Hkv
        new_arch = Hkv > 1 and f"transformer.h.0.ln_attn.weight" in t
        ld = _Loader(t, cfg, dtype)
        p = "transformer.h.{}."
        if new_arch:
            ld.stack("input_norm", p + "ln_attn.weight")
            ld.stack("input_norm_b", p + "ln_attn.bias")
            ld.stack("post_attn_norm", p + "ln_mlp.weight")
            ld.stack("post_attn_norm_b", p + "ln_mlp.bias")
        else:
            ld.stack("input_norm", p + "input_layernorm.weight")
            ld.stack("input_norm_b", p + "input_layernorm.bias")

        def qkv(i, which):
            w = t[f"transformer.h.{i}.self_attention.query_key_value"
                  f".weight"]
            if new_arch:
                w = w.reshape(Hkv, g + 2, d, -1)
                if which == "q":
                    return w[:, :g].reshape(Hq * d, -1).T
                j = g if which == "k" else g + 1
                return w[:, j].reshape(Hkv * d, -1).T
            # multi-query layout: [Hq*d | d | d]
            if which == "q":
                return w[:Hq * d].T
            if which == "k":
                return w[Hq * d:Hq * d + Hkv * d].T
            return w[Hq * d + Hkv * d:].T

        ld.stack_fn("wq", lambda i: qkv(i, "q"))
        ld.stack_fn("wk", lambda i: qkv(i, "k"))
        ld.stack_fn("wv", lambda i: qkv(i, "v"))
        ld.stack("wo", p + "self_attention.dense.weight", transpose=True)
        ld.stack("w_fc1", p + "mlp.dense_h_to_4h.weight", transpose=True)
        ld.stack("w_fc2", p + "mlp.dense_4h_to_h.weight", transpose=True)
        ld.stack_opt("b_fc1", p + "mlp.dense_h_to_4h.bias")
        ld.stack_opt("b_fc2", p + "mlp.dense_4h_to_h.bias")
        ld.put("embed", "transformer.word_embeddings.weight")
        ld.put("final_norm", "transformer.ln_f.weight")
        ld.put_opt("final_norm_b", "transformer.ln_f.bias")
        return ld.params()

    return cfg_fn, load_fn


@_register("CohereForCausalLM")
def _cohere():
    def cfg_fn(hf, name):
        if hf.get("use_qk_norm"):
            raise ValueError(
                "CohereForCausalLM with use_qk_norm (Command R+) is "
                "unsupported: the per-head q/k layernorms would be "
                "silently dropped")
        return _base_cfg(
            hf, "CohereForCausalLM", name,
            norm_type="layernorm", norm_bias=False,
            parallel_residual=True, shared_input_norm=True,
            rope_interleaved=True,
            tie_word_embeddings=True,
            rms_norm_eps=hf.get("layer_norm_eps", 1e-5),
            # HF multiplies logits BY logit_scale; ours divides
            logits_scaling=1.0 / hf.get("logit_scale", 1.0))
    return cfg_fn, _load_llama_style


@_register("BloomForCausalLM")
def _bloom():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "BloomForCausalLM", name,
            num_layers=_g(hf, "num_hidden_layers", "n_layer"),
            num_heads=_g(hf, "num_attention_heads", "n_head"),
            norm_type="layernorm", norm_bias=True,
            pos_embedding="none", alibi=True, embed_norm=True,
            mlp_type="plain", mlp_bias=True,
            attention_bias=True, qkv_bias=True, o_bias=True,
            tie_word_embeddings=True,
            rms_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
            hidden_act="gelu")

    def load_fn(t, cfg, dtype):
        H, d = cfg.num_heads, cfg.head_size
        ld = _Loader(t, cfg, dtype)
        pre = ("" if "h.0.input_layernorm.weight" in t else "transformer.")
        p = pre + "h.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("input_norm_b", p + "input_layernorm.bias")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        ld.stack("post_attn_norm_b", p + "post_attention_layernorm.bias")

        # fused qkv interleaved per head: rows [H, 3, d]
        def qkv_w(i, j):
            w = t[f"{pre}h.{i}.self_attention.query_key_value.weight"]
            return w.reshape(H, 3, d, -1)[:, j].reshape(H * d, -1).T

        def qkv_b(i, j):
            b = t[f"{pre}h.{i}.self_attention.query_key_value.bias"]
            return b.reshape(H, 3, d)[:, j].reshape(H * d)

        ld.stack_fn("wq", lambda i: qkv_w(i, 0))
        ld.stack_fn("wk", lambda i: qkv_w(i, 1))
        ld.stack_fn("wv", lambda i: qkv_w(i, 2))
        ld.stack_fn("bq", lambda i: qkv_b(i, 0))
        ld.stack_fn("bk", lambda i: qkv_b(i, 1))
        ld.stack_fn("bv", lambda i: qkv_b(i, 2))
        ld.stack("wo", p + "self_attention.dense.weight", transpose=True)
        ld.stack("bo", p + "self_attention.dense.bias")
        ld.stack("w_fc1", p + "mlp.dense_h_to_4h.weight", transpose=True)
        ld.stack("b_fc1", p + "mlp.dense_h_to_4h.bias")
        ld.stack("w_fc2", p + "mlp.dense_4h_to_h.weight", transpose=True)
        ld.stack("b_fc2", p + "mlp.dense_4h_to_h.bias")
        ld.put("embed", pre + "word_embeddings.weight")
        ld.put("embed_norm_w", pre + "word_embeddings_layernorm.weight")
        ld.put("embed_norm_b", pre + "word_embeddings_layernorm.bias")
        ld.put("final_norm", pre + "ln_f.weight")
        ld.put("final_norm_b", pre + "ln_f.bias")
        return ld.params()

    return cfg_fn, load_fn


@_register("MptForCausalLM", "MPTForCausalLM")
def _mpt():
    def cfg_fn(hf, name):
        D = hf["d_model"]
        return _base_cfg(
            hf, "MptForCausalLM", name,
            num_layers=hf["n_layers"], num_heads=hf["n_heads"],
            num_kv_heads=hf["n_heads"], hidden_size=D,
            head_size=D // hf["n_heads"],
            intermediate_size=int(hf.get("expansion_ratio", 4) * D),
            max_model_len=hf.get("max_seq_len", 2048),
            norm_type="layernorm", norm_bias=False,
            pos_embedding="none", alibi=True,
            mlp_type="plain", mlp_bias=False,
            tie_word_embeddings=True,
            hidden_act="gelu")

    def load_fn(t, cfg, dtype):
        D = cfg.hidden_size
        ld = _Loader(t, cfg, dtype)
        p = "transformer.blocks.{}."
        ld.stack("input_norm", p + "norm_1.weight")
        ld.stack("post_attn_norm", p + "norm_2.weight")
        wq = lambda i: t[f"transformer.blocks.{i}.attn.Wqkv.weight"].T
        ld.stack_fn("wq", lambda i: wq(i)[:, :D])
        ld.stack_fn("wk", lambda i: wq(i)[:, D:2 * D])
        ld.stack_fn("wv", lambda i: wq(i)[:, 2 * D:])
        ld.stack("wo", p + "attn.out_proj.weight", transpose=True)
        ld.stack("w_fc1", p + "ffn.up_proj.weight", transpose=True)
        ld.stack("w_fc2", p + "ffn.down_proj.weight", transpose=True)
        ld.put("embed", "transformer.wte.weight")
        ld.put("final_norm", "transformer.norm_f.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("Blip2ForConditionalGeneration")
def _blip2():
    """BLIP-2 (reference vllm/model_executor/models/blip2.py): Blip2
    vision tower -> Q-Former over learned query tokens ->
    language_projection, feeding an OPT text tower. The vision/Q-Former
    side lives in models/vision.py (blip2_image_embed) and is loaded by
    weights.load_multimodal; the reference PREPENDS the projected query
    embeddings to the prompt - the LLM surface expands
    `num_query_tokens` image placeholders at the same positions instead
    (identical math under causal attention)."""
    def cfg_fn(hf, name):
        tc = dict(hf["text_config"])
        arch = (tc.get("architectures") or ["OPTForCausalLM"])[0]
        if arch != "OPTForCausalLM":
            raise ValueError(
                f"blip2 text tower {arch} is not supported (OPT only; "
                "the flan-t5 variants need the encoder-decoder serving "
                "path, which is model-level like BART)")
        tc["architectures"] = [arch]
        cfg = config_from_hf(tc, name)
        cfg.architecture = "Blip2ForConditionalGeneration"
        # HF >= 4.44 checkpoints carry an explicit image token; older
        # blip2 checkpoints prepend without placeholders - default to
        # the pad token as the placeholder id the LLM surface expands
        cfg.image_token_index = hf.get(
            "image_token_index", tc.get("pad_token_id", 1))
        return cfg

    def load_fn(t, cfg, dtype):
        return _REGISTRY["OPTForCausalLM"].load_fn(
            _strip_language_model_prefix(t), cfg, dtype)

    return cfg_fn, load_fn


@_register("FuyuForCausalLM")
def _fuyu():
    """Fuyu-8B (reference vllm/model_executor/models/fuyu.py): a
    decoder-only multimodal model - persimmon text tower, raw image
    patches projected by ONE linear (vision_embed_tokens, loaded by
    weights.load_multimodal) and spliced into the prompt through the
    same mm_embed path as llava."""
    def cfg_fn(hf, name):
        tc = dict(hf.get("text_config") or hf)
        tc["architectures"] = ["PersimmonForCausalLM"]
        cfg = config_from_hf(tc, name)
        cfg.architecture = "FuyuForCausalLM"
        cfg.image_token_index = hf.get("image_token_id", 71011)
        return cfg

    def load_fn(t, cfg, dtype):
        return _REGISTRY["PersimmonForCausalLM"].load_fn(
            _strip_language_model_prefix(t), cfg, dtype)

    return cfg_fn, load_fn


@_register("PersimmonForCausalLM")
def _persimmon():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "PersimmonForCausalLM", name,
            norm_type="layernorm", norm_bias=True,
            partial_rotary_factor=hf.get("partial_rotary_factor", 0.5),
            qk_norm=hf.get("qk_layernorm", True),
            mlp_type="plain", mlp_bias=True,
            attention_bias=True, qkv_bias=True, o_bias=True,
            hidden_act=hf.get("hidden_act", "relu2"))

    def load_fn(t, cfg, dtype):
        H, d = cfg.num_heads, cfg.head_size
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("input_norm_b", p + "input_layernorm.bias")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        ld.stack("post_attn_norm_b", p + "post_attention_layernorm.bias")

        def qkv_w(i, j):
            w = t[f"model.layers.{i}.self_attn.query_key_value.weight"]
            return w.reshape(H, 3, d, -1)[:, j].reshape(H * d, -1).T

        def qkv_b(i, j):
            b = t[f"model.layers.{i}.self_attn.query_key_value.bias"]
            return b.reshape(H, 3, d)[:, j].reshape(H * d)

        ld.stack_fn("wq", lambda i: qkv_w(i, 0))
        ld.stack_fn("wk", lambda i: qkv_w(i, 1))
        ld.stack_fn("wv", lambda i: qkv_w(i, 2))
        ld.stack_fn("bq", lambda i: qkv_b(i, 0))
        ld.stack_fn("bk", lambda i: qkv_b(i, 1))
        ld.stack_fn("bv", lambda i: qkv_b(i, 2))
        ld.stack("wo", p + "self_attn.dense.weight", transpose=True)
        ld.stack("bo", p + "self_attn.dense.bias")
        if cfg.qk_norm:
            ld.stack("q_norm", p + "self_attn.q_layernorm.weight")
            ld.stack("q_norm_b", p + "self_attn.q_layernorm.bias")
            ld.stack("k_norm", p + "self_attn.k_layernorm.weight")
            ld.stack("k_norm_b", p + "self_attn.k_layernorm.bias")
        ld.stack("w_fc1", p + "mlp.dense_h_to_4h.weight", transpose=True)
        ld.stack("b_fc1", p + "mlp.dense_h_to_4h.bias")
        ld.stack("w_fc2", p + "mlp.dense_4h_to_h.weight", transpose=True)
        ld.stack("b_fc2", p + "mlp.dense_4h_to_h.bias")
        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.final_layernorm.weight")
        ld.put("final_norm_b", "model.final_layernorm.bias")
        ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn




@_register("GPTBigCodeForCausalLM")
def _gptbigcode(): 
    def cfg_fn(hf, name):
        heads = _g(hf, "num_attention_heads", "n_head")
        return _base_cfg(
            hf, "GPTBigCodeForCausalLM", name,
            num_kv_heads=1 if hf.get("multi_query", True) else heads,
            norm_type="layernorm", norm_bias=True,
            pos_embedding="learned",
            mlp_type="plain", mlp_bias=True,
            attention_bias=True, qkv_bias=True, o_bias=True,
            tie_word_embeddings=True,
            hidden_act=hf.get("activation_function", "gelu_pytorch_tanh"))

    def load_fn(t, cfg, dtype):
        D = cfg.hidden_size
        kvd = cfg.num_kv_heads * cfg.head_size
        ld = _Loader(t, cfg, dtype)
        pre = ("" if "h.0.ln_1.weight" in t else "transformer.")
        p = pre + "h.{}."
        ld.stack("input_norm", p + "ln_1.weight")
        ld.stack("input_norm_b", p + "ln_1.bias")
        ld.stack("post_attn_norm", p + "ln_2.weight")
        ld.stack("post_attn_norm_b", p + "ln_2.bias")
        # Linear (not Conv1D): weight [D + 2*kv_dim, D] -> transpose
        ca = lambda i: t[f"{pre}h.{i}.attn.c_attn.weight"].T
        cb = lambda i: t[f"{pre}h.{i}.attn.c_attn.bias"]
        ld.stack_fn("wq", lambda i: ca(i)[:, :D])
        ld.stack_fn("wk", lambda i: ca(i)[:, D:D + kvd])
        ld.stack_fn("wv", lambda i: ca(i)[:, D + kvd:])
        ld.stack_fn("bq", lambda i: cb(i)[:D])
        ld.stack_fn("bk", lambda i: cb(i)[D:D + kvd])
        ld.stack_fn("bv", lambda i: cb(i)[D + kvd:])
        ld.stack("wo", p + "attn.c_proj.weight", transpose=True)
        ld.stack("bo", p + "attn.c_proj.bias")
        ld.stack("w_fc1", p + "mlp.c_fc.weight", transpose=True)
        ld.stack("b_fc1", p + "mlp.c_fc.bias")
        ld.stack("w_fc2", p + "mlp.c_proj.weight", transpose=True)
        ld.stack("b_fc2", p + "mlp.c_proj.bias")
        ld.put("embed", pre + "wte.weight")
        ld.put("pos_embed", pre + "wpe.weight")
        ld.put("final_norm", pre + "ln_f.weight")
        ld.put("final_norm_b", pre + "ln_f.bias")
        return ld.params()

    return cfg_fn, load_fn



# ---------------------------------------------------------------------------
# Round-2 tranche: qwen3(-moe), olmo2, olmoe, glm4, nemotron, dbrx,
# granitemoe, phimoe (HF-parity-tested) + minicpm, orion, xverse, exaone
# (reference-cited recipes; HF impls need remote code)
# ---------------------------------------------------------------------------

@_register("Qwen3ForCausalLM")
def _qwen3():
    # reference-era qwen2.py lineage + per-head q/k RMS norm (no qkv bias)
    def cfg_fn(hf, name):
        return _base_cfg(hf, "Qwen3ForCausalLM", name, qk_norm=True,
                         sliding_window=hf.get("sliding_window")
                         if hf.get("use_sliding_window") else None)

    def load_fn(t, cfg, dtype):
        params = _load_llama_style(t, cfg, dtype)
        ld = _Loader(t, cfg, dtype)
        ld.stack("q_norm", "model.layers.{}.self_attn.q_norm.weight")
        ld.stack("k_norm", "model.layers.{}.self_attn.k_norm.weight")
        params["layers"].update(ld.layers)
        return params

    return cfg_fn, load_fn


def _experts_loader(ld, t, cfg, fmt_gate, fmt_up, fmt_down):
    E = cfg.num_experts
    for name, fmt in (("experts_gate", fmt_gate), ("experts_up", fmt_up),
                      ("experts_down", fmt_down)):
        ld.stack_fn(name, lambda i, fmt=fmt: np.stack(
            [t[fmt.format(i, e)].T for e in range(E)]))


@_register("Qwen3MoeForCausalLM")
def _qwen3moe():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "Qwen3MoeForCausalLM", name, qk_norm=True,
            num_experts=hf["num_experts"],
            num_experts_per_tok=hf["num_experts_per_tok"],
            moe_intermediate_size=hf["moe_intermediate_size"],
            moe_norm_topk_prob=hf.get("norm_topk_prob", True))

    def load_fn(t, cfg, dtype):
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        for name, proj in (("wq", "self_attn.q_proj"),
                           ("wk", "self_attn.k_proj"),
                           ("wv", "self_attn.v_proj"),
                           ("wo", "self_attn.o_proj")):
            ld.stack(name, p + proj + ".weight", transpose=True)
        ld.stack("q_norm", p + "self_attn.q_norm.weight")
        ld.stack("k_norm", p + "self_attn.k_norm.weight")
        ld.stack("router", p + "mlp.gate.weight", transpose=True)
        _experts_loader(
            ld, t, cfg,
            "model.layers.{}.mlp.experts.{}.gate_proj.weight",
            "model.layers.{}.mlp.experts.{}.up_proj.weight",
            "model.layers.{}.mlp.experts.{}.down_proj.weight")
        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.norm.weight")
        if not cfg.tie_word_embeddings:
            ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("Olmo2ForCausalLM")
def _olmo2():
    # norm-after-sublayer ordering + full-projection q/k RMS norm
    def cfg_fn(hf, name):
        return _base_cfg(hf, "Olmo2ForCausalLM", name,
                         no_pre_norm=True, use_post_norms=True,
                         qk_norm_full=True)

    def load_fn(t, cfg, dtype):
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        for name, proj in (("wq", "self_attn.q_proj"),
                           ("wk", "self_attn.k_proj"),
                           ("wv", "self_attn.v_proj"),
                           ("wo", "self_attn.o_proj"),
                           ("w_gate", "mlp.gate_proj"),
                           ("w_up", "mlp.up_proj"),
                           ("w_down", "mlp.down_proj")):
            ld.stack(name, p + proj + ".weight", transpose=True)
        ld.stack("q_norm", p + "self_attn.q_norm.weight")
        ld.stack("k_norm", p + "self_attn.k_norm.weight")
        ld.stack("post_attn_out_norm",
                 p + "post_attention_layernorm.weight")
        ld.stack("post_mlp_norm", p + "post_feedforward_layernorm.weight")
        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.norm.weight")
        if not cfg.tie_word_embeddings:
            ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("OlmoeForCausalLM")
def _olmoe():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "OlmoeForCausalLM", name, qk_norm_full=True,
            num_experts=hf["num_experts"],
            num_experts_per_tok=hf["num_experts_per_tok"],
            moe_norm_topk_prob=hf.get("norm_topk_prob", False))

    def load_fn(t, cfg, dtype):
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        for name, proj in (("wq", "self_attn.q_proj"),
                           ("wk", "self_attn.k_proj"),
                           ("wv", "self_attn.v_proj"),
                           ("wo", "self_attn.o_proj")):
            ld.stack(name, p + proj + ".weight", transpose=True)
        ld.stack("q_norm", p + "self_attn.q_norm.weight")
        ld.stack("k_norm", p + "self_attn.k_norm.weight")
        ld.stack("router", p + "mlp.gate.weight", transpose=True)
        _experts_loader(
            ld, t, cfg,
            "model.layers.{}.mlp.experts.{}.gate_proj.weight",
            "model.layers.{}.mlp.experts.{}.up_proj.weight",
            "model.layers.{}.mlp.experts.{}.down_proj.weight")
        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.norm.weight")
        if not cfg.tie_word_embeddings:
            ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("GlmForCausalLM", "Glm4ForCausalLM", "ChatGLMModel",
           "ChatGLMForConditionalGeneration")
def _glm4():
    # modern GLM/ChatGLM lineage: partial interleaved rotary, qkv bias,
    # fused gate_up, glm4 adds gemma2-style sandwich norms
    def cfg_fn(hf, name):
        if "vocab_size" not in hf or "num_hidden_layers" not in hf:
            # ORIGINAL chatglm checkpoints use padded_vocab_size /
            # num_layers / multi_query_group_num and transformer.encoder
            # tensor names; loading them through this recipe would
            # KeyError mid-load instead of failing with a reason
            raise ValueError(
                "original ChatGLM checkpoint layout is unsupported; use "
                "the -hf re-releases (GlmForCausalLM config layout)")
        arch = (hf.get("architectures") or ["GlmForCausalLM"])[0]
        return _base_cfg(
            hf, arch, name,
            partial_rotary_factor=hf.get("partial_rotary_factor", 0.5),
            rope_interleaved=True,
            qkv_bias=hf.get("attention_bias", True),
            use_post_norms=arch == "Glm4ForCausalLM")

    def load_fn(t, cfg, dtype):
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        for name, proj in (("wq", "self_attn.q_proj"),
                           ("wk", "self_attn.k_proj"),
                           ("wv", "self_attn.v_proj"),
                           ("wo", "self_attn.o_proj")):
            ld.stack(name, p + proj + ".weight", transpose=True)
        for name, proj in (("bq", "self_attn.q_proj"),
                           ("bk", "self_attn.k_proj"),
                           ("bv", "self_attn.v_proj")):
            ld.stack_opt(name, p + proj + ".bias")
        I = cfg.intermediate_size
        ld.stack_fn("w_gate", lambda i: t[
            f"model.layers.{i}.mlp.gate_up_proj.weight"][:I].T)
        ld.stack_fn("w_up", lambda i: t[
            f"model.layers.{i}.mlp.gate_up_proj.weight"][I:].T)
        ld.stack("w_down", p + "mlp.down_proj.weight", transpose=True)
        if cfg.use_post_norms:
            ld.stack("post_attn_out_norm",
                     p + "post_self_attn_layernorm.weight")
            ld.stack("post_mlp_norm", p + "post_mlp_layernorm.weight")
        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.norm.weight")
        if not cfg.tie_word_embeddings:
            ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("NemotronForCausalLM")
def _nemotron():
    # layernorm1p (+1 offset, biased), relu2 plain MLP, partial rotary
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "NemotronForCausalLM", name,
            norm_type="layernorm", norm_bias=True, rmsnorm_offset=True,
            mlp_type="plain", hidden_act=hf.get("hidden_act", "relu2"),
            partial_rotary_factor=hf.get(
                "partial_rotary_factor", hf.get("rope_percent", 0.5)),
            rms_norm_eps=hf.get("norm_eps", 1e-5))

    def load_fn(t, cfg, dtype):
        return _load_llama_style(
            t, cfg, dtype,
            gate="mlp.up_proj", down="mlp.down_proj")

    return cfg_fn, load_fn


@_register("DbrxForCausalLM")
def _dbrx():
    def cfg_fn(hf, name):
        attn = hf.get("attn_config") or {}
        ffn = hf.get("ffn_config") or {}
        return _base_cfg(
            hf, "DbrxForCausalLM", name,
            num_kv_heads=attn.get("kv_n_heads", hf.get("n_heads")),
            clip_qkv=attn.get("clip_qkv"),
            intermediate_size=ffn.get("ffn_hidden_size", 4 * hf["d_model"]),
            num_experts=ffn.get("moe_num_experts", 4),
            num_experts_per_tok=ffn.get("moe_top_k", 1),
            moe_intermediate_size=ffn.get("ffn_hidden_size"),
            moe_norm_topk_prob=True,
            norm_type="layernorm", tie_word_embeddings=False,
            rope_theta=attn.get("rope_theta", 10000.0),
            max_model_len=hf.get("max_seq_len", 8192))

    def load_fn(t, cfg, dtype):
        D = cfg.hidden_size
        Hq, Hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
        E, I = cfg.num_experts, cfg.moe_intermediate_size
        ld = _Loader(t, cfg, dtype)
        p = "transformer.blocks.{}."
        ld.stack("input_norm", p + "norm_attn_norm.norm_1.weight")
        ld.stack("post_attn_norm", p + "norm_attn_norm.norm_2.weight")
        qe = Hq * d
        ke = qe + Hkv * d
        ld.stack_fn("wq", lambda i: t[
            f"transformer.blocks.{i}.norm_attn_norm.attn.Wqkv.weight"
        ][:qe].T)
        ld.stack_fn("wk", lambda i: t[
            f"transformer.blocks.{i}.norm_attn_norm.attn.Wqkv.weight"
        ][qe:ke].T)
        ld.stack_fn("wv", lambda i: t[
            f"transformer.blocks.{i}.norm_attn_norm.attn.Wqkv.weight"
        ][ke:].T)
        ld.stack("wo", p + "norm_attn_norm.attn.out_proj.weight",
                 transpose=True)
        ld.stack("router", p + "ffn.router.layer.weight", transpose=True)
        # fused expert tensors: w1/v1 are [E*I, D] flat, w2 is [E*I, D]
        # with the CONTRACTION on I (w2 rows are input features)
        ld.stack_fn("experts_gate", lambda i: t[
            f"transformer.blocks.{i}.ffn.experts.mlp.w1"
        ].reshape(E, I, D).transpose(0, 2, 1))
        ld.stack_fn("experts_up", lambda i: t[
            f"transformer.blocks.{i}.ffn.experts.mlp.v1"
        ].reshape(E, I, D).transpose(0, 2, 1))
        ld.stack_fn("experts_down", lambda i: t[
            f"transformer.blocks.{i}.ffn.experts.mlp.w2"
        ].reshape(E, I, D))
        ld.put("embed", "transformer.wte.weight")
        ld.put("final_norm", "transformer.norm_f.weight")
        ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("GraniteMoeForCausalLM")
def _granitemoe():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "GraniteMoeForCausalLM", name,
            num_experts=hf["num_local_experts"],
            num_experts_per_tok=hf["num_experts_per_tok"],
            moe_intermediate_size=hf.get("intermediate_size"),
            moe_norm_topk_prob=True,
            embedding_multiplier=hf.get("embedding_multiplier", 1.0),
            residual_multiplier=hf.get("residual_multiplier", 1.0),
            attention_scale=hf.get("attention_multiplier"),
            logits_scaling=hf.get("logits_scaling", 1.0))

    def load_fn(t, cfg, dtype):
        E = cfg.num_experts
        I = cfg.moe_intermediate_size
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        for name, proj in (("wq", "self_attn.q_proj"),
                           ("wk", "self_attn.k_proj"),
                           ("wv", "self_attn.v_proj"),
                           ("wo", "self_attn.o_proj")):
            ld.stack(name, p + proj + ".weight", transpose=True)
        ld.stack("router", p + "block_sparse_moe.router.layer.weight",
                 transpose=True)
        # input_linear [E, 2I, D] fused gate|up; output_linear [E, D, I]
        ld.stack_fn("experts_gate", lambda i: t[
            f"model.layers.{i}.block_sparse_moe.input_linear.weight"
        ][:, :I, :].transpose(0, 2, 1))
        ld.stack_fn("experts_up", lambda i: t[
            f"model.layers.{i}.block_sparse_moe.input_linear.weight"
        ][:, I:, :].transpose(0, 2, 1))
        ld.stack_fn("experts_down", lambda i: t[
            f"model.layers.{i}.block_sparse_moe.output_linear.weight"
        ].transpose(0, 2, 1))
        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.norm.weight")
        if not cfg.tie_word_embeddings:
            ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("PhimoeForCausalLM")
def _phimoe():
    def cfg_fn(hf, name):
        return _base_cfg(
            hf, "PhimoeForCausalLM", name,
            norm_type="layernorm", norm_bias=True,
            num_experts=hf["num_local_experts"],
            num_experts_per_tok=hf["num_experts_per_tok"],
            moe_norm_topk_prob=False, moe_routing="sparsemixer",
            qkv_bias=hf.get("attention_bias", False),
            lm_head_bias=hf.get("lm_head_bias", False))

    def load_fn(t, cfg, dtype):
        E = cfg.num_experts
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("input_norm_b", p + "input_layernorm.bias")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        ld.stack("post_attn_norm_b", p + "post_attention_layernorm.bias")
        for name, proj in (("wq", "self_attn.q_proj"),
                           ("wk", "self_attn.k_proj"),
                           ("wv", "self_attn.v_proj"),
                           ("wo", "self_attn.o_proj")):
            ld.stack(name, p + proj + ".weight", transpose=True)
            ld.stack_opt("b" + name[1:] if name != "wo" else "bo",
                         p + proj + ".bias")
        ld.stack("router", p + "block_sparse_moe.gate.weight",
                 transpose=True)
        _experts_loader(
            ld, t, cfg,
            "model.layers.{}.block_sparse_moe.experts.{}.w1.weight",
            "model.layers.{}.block_sparse_moe.experts.{}.w3.weight",
            "model.layers.{}.block_sparse_moe.experts.{}.w2.weight")
        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.norm.weight")
        ld.put_opt("final_norm_b", "model.norm.bias")
        ld.put("lm_head", "lm_head.weight")
        if cfg.lm_head_bias:
            ld.put_opt("lm_head_b", "lm_head.bias")
        return ld.params()

    return cfg_fn, load_fn


@_register("MiniCPMForCausalLM")
def _minicpm():
    # llama naming + muP-style multipliers
    # (reference minicpm.py:324-331, 365, 455)
    def cfg_fn(hf, name):
        import math
        L = _g(hf, "num_hidden_layers")
        return _base_cfg(
            hf, "MiniCPMForCausalLM", name,
            embedding_multiplier=hf.get("scale_emb", 1.0),
            residual_multiplier=hf.get("scale_depth", 1.0) / math.sqrt(L),
            logits_scaling=hf["hidden_size"] / hf.get(
                "dim_model_base", hf["hidden_size"]),
            tie_word_embeddings=hf.get("tie_word_embeddings", True))
    return cfg_fn, _load_llama_style


@_register("OrionForCausalLM")
def _orion():
    # llama naming with biased LayerNorm norms (reference orion.py:142-226)
    def cfg_fn(hf, name):
        return _base_cfg(hf, "OrionForCausalLM", name,
                         norm_type="layernorm", norm_bias=True)
    return cfg_fn, _load_llama_style


@_register("XverseForCausalLM")
def _xverse():
    # pure llama layout (reference xverse.py:274-288)
    def cfg_fn(hf, name):
        return _base_cfg(hf, "XverseForCausalLM", name)
    return cfg_fn, _load_llama_style


@_register("ExaoneForCausalLM")
def _exaone():
    # llama semantics, transformer.h naming
    # (reference exaone.py:139-189, 284-285, 330-352, 402-409)
    def cfg_fn(hf, name):
        return _base_cfg(hf, "ExaoneForCausalLM", name)

    def load_fn(t, cfg, dtype):
        return _load_llama_style(
            t, cfg, dtype, p="transformer.h.{}.",
            embed="transformer.wte.weight",
            final_norm="transformer.ln_f.weight",
            input_norm="ln_1.weight", post_attn_norm="ln_2.weight",
            q="attn.attention.q_proj", k="attn.attention.k_proj",
            v="attn.attention.v_proj", o="attn.attention.out_proj",
            gate="mlp.c_fc_0", up="mlp.c_fc_1", down="mlp.c_proj")

    return cfg_fn, load_fn



@_register("DeepseekV2ForCausalLM", "DeepseekV3ForCausalLM")
def _deepseek_mla():
    """Deepseek v2/v3 Multi-head Latent Attention + fine-grained MoE.

    MLA design note (the reference deepseek_v2.py decompresses per head;
    vllm caches full K/V): here the paged cache stores ONE vector per
    (layer, token) - normalized latent (kv_lora_rank) | roped shared k_pe
    (qk_rope_head_dim) - i.e. head_size = rank + rope_dim, num_kv_heads=1.
    Attention runs ABSORBED (q_nope @ W_kc queries latent space) so the
    existing paged/pallas kernels serve MLA unchanged as MQA, and the KVC
    eviction pipeline compresses the latent per (layer, token) directly.

    MoE: dense layers (first_k_dense_replace) ride in the shared-expert
    slots with their expert/router tensors zeroed, so the scan over layers
    stays homogeneous; routed output is scaled by routed_scaling_factor,
    v3 selects via the sigmoid noaux_tc gate with group-limited greedy.
    """
    def cfg_fn(hf, name):
        arch = (hf.get("architectures") or ["DeepseekV2ForCausalLM"])[0]
        rank = hf["kv_lora_rank"]
        rope_d = hf["qk_rope_head_dim"]
        nope_d = hf["qk_nope_head_dim"]
        is_v3 = "V3" in arch
        kw = dict(
            head_size=rank + rope_d,
            num_kv_heads=1,
            attention_scale=(nope_d + rope_d) ** -0.5,
            kv_lora_rank=rank,
            q_lora_rank=hf.get("q_lora_rank"),
            qk_nope_head_dim=nope_d,
            qk_rope_head_dim=rope_d,
            v_head_dim=hf["v_head_dim"],
        )
        if hf.get("n_routed_experts"):
            I_dense = hf.get("intermediate_size", 4 * hf["hidden_size"])
            I_sh = (hf.get("n_shared_experts", 0)
                    * hf["moe_intermediate_size"])
            kw.update(
                num_experts=hf["n_routed_experts"],
                num_experts_per_tok=hf["num_experts_per_tok"],
                moe_intermediate_size=hf["moe_intermediate_size"],
                moe_norm_topk_prob=hf.get("norm_topk_prob", False),
                moe_routed_scaling=hf.get("routed_scaling_factor", 1.0),
                moe_shared_expert_size=max(I_dense, I_sh),
                moe_n_group=hf.get("n_group", 1) or 1,
                moe_topk_group=hf.get("topk_group", 1) or 1,
                moe_routing="sigmoid_noaux" if is_v3 else "softmax_topk",
            )
        return _base_cfg(hf, arch, name, **kw)

    def load_fn(t, cfg, dtype):
        L, D = cfg.num_layers, cfg.hidden_size
        Hq = cfg.num_heads
        rank, rope_d = cfg.kv_lora_rank, cfg.qk_rope_head_dim
        nope_d, v_d = cfg.qk_nope_head_dim, cfg.v_head_dim
        ld = _Loader(t, cfg, dtype)
        p = "model.layers.{}."
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        ld.stack("wo", p + "self_attn.o_proj.weight", transpose=True)
        ld.stack("mla_kv_a", p + "self_attn.kv_a_proj_with_mqa.weight",
                 transpose=True)
        ld.stack("mla_kv_a_norm", p + "self_attn.kv_a_layernorm.weight")
        if cfg.q_lora_rank:
            ld.stack("mla_q_a", p + "self_attn.q_a_proj.weight",
                     transpose=True)
            ld.stack("mla_q_a_norm", p + "self_attn.q_a_layernorm.weight")
            ld.stack("mla_q_b", p + "self_attn.q_b_proj.weight",
                     transpose=True)
        else:
            ld.stack("mla_wq", p + "self_attn.q_proj.weight",
                     transpose=True)

        def kc(i):
            w = t[f"model.layers.{i}.self_attn.kv_b_proj.weight"]
            w = w.reshape(Hq, nope_d + v_d, rank)
            return w[:, :nope_d, :]                    # [Hq, nope, rank]

        def vc(i):
            w = t[f"model.layers.{i}.self_attn.kv_b_proj.weight"]
            w = w.reshape(Hq, nope_d + v_d, rank)
            return w[:, nope_d:, :].transpose(0, 2, 1)  # [Hq, rank, v]

        ld.stack_fn("mla_w_kc", kc)
        ld.stack_fn("mla_w_vc", vc)

        if cfg.num_experts:
            E, I_sh = cfg.num_experts, cfg.moe_shared_expert_size
            Im = cfg.moe_intermediate_size

            def moe_layer(i):
                return f"model.layers.{i}.mlp.gate.weight" in t

            def shared(i, which, transpose_in):
                # dense layers occupy the shared slots; pad out-dim to the
                # common width with zeros (zero rows/cols are inert)
                if moe_layer(i):
                    w = t[f"model.layers.{i}.mlp.shared_experts."
                          f"{which}.weight"]
                else:
                    w = t[f"model.layers.{i}.mlp.{which}.weight"]
                w = w.T  # [in, out] for gate/up; [I, D] -> [I, D] for down
                if which == "down_proj":
                    out = np.zeros((I_sh, D), w.dtype)
                    out[:w.shape[0]] = w
                else:
                    out = np.zeros((D, I_sh), w.dtype)
                    out[:, :w.shape[1]] = w
                return out

            for nm, which in (("shared_gate", "gate_proj"),
                              ("shared_up", "up_proj"),
                              ("shared_down", "down_proj")):
                ld.stack_fn(nm, lambda i, which=which: shared(i, which,
                                                             True))

            def router(i):
                if moe_layer(i):
                    return t[f"model.layers.{i}.mlp.gate.weight"].T
                return np.zeros((D, E), np.float32)

            ld.stack_fn("router", router)
            if cfg.moe_routing == "sigmoid_noaux":
                ld.stack_fn("router_bias", lambda i: (
                    t[f"model.layers.{i}.mlp.gate.e_score_correction_bias"]
                    if moe_layer(i) else np.zeros((E,), np.float32)))

            def experts(i, which, down=False):
                if not moe_layer(i):
                    return (np.zeros((E, Im, D), np.float32) if down
                            else np.zeros((E, D, Im), np.float32))
                return np.stack([
                    t[f"model.layers.{i}.mlp.experts.{e}."
                      f"{which}.weight"].T for e in range(E)])

            ld.stack_fn("experts_gate", lambda i: experts(i, "gate_proj"))
            ld.stack_fn("experts_up", lambda i: experts(i, "up_proj"))
            ld.stack_fn("experts_down",
                        lambda i: experts(i, "down_proj", down=True))
        else:
            ld.stack("w_gate", p + "mlp.gate_proj.weight", transpose=True)
            ld.stack("w_up", p + "mlp.up_proj.weight", transpose=True)
            ld.stack("w_down", p + "mlp.down_proj.weight", transpose=True)

        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.norm.weight")
        if not cfg.tie_word_embeddings:
            ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("QWenLMHeadModel")
def _qwen_v1():
    """Qwen v1 (reference vllm/model_executor/models/qwen.py): llama
    semantics with RMSNorm ln_1/ln_2, fused biased c_attn, and a gated MLP
    where w2 is the GATE, w1 the UP projection (qwen.py:306-307) and the
    effective intermediate size is config.intermediate_size // 2
    (qwen.py:154)."""
    def cfg_fn(hf, name):
        if "visual" in hf:
            # Qwen-VL declares the same architecture string; the text
            # loader would silently serve image placeholders as ordinary
            # embeddings (fail-loudly contract of _KNOWN_UNSUPPORTED)
            raise ValueError(
                "QWenLMHeadModel checkpoint has a `visual` config: "
                "Qwen-VL is unsupported (text QWenLMHeadModel only)")
        return _base_cfg(
            hf, "QWenLMHeadModel", name,
            intermediate_size=hf["intermediate_size"] // 2,
            max_model_len=_g(hf, "seq_length", "max_position_embeddings",
                             default=8192),
            rms_norm_eps=_g(hf, "layer_norm_epsilon", default=1e-6),
            qkv_bias=True, attention_bias=True,
            rope_theta=_g(hf, "rotary_emb_base", default=10000.0),
            tie_word_embeddings=False, hidden_act="silu")

    def load_fn(t, cfg, dtype):
        D = cfg.hidden_size
        ld = _Loader(t, cfg, dtype)
        p = "transformer.h.{}."
        ld.stack("input_norm", p + "ln_1.weight")
        ld.stack("post_attn_norm", p + "ln_2.weight")
        # c_attn: torch Linear [3D, hidden] -> transpose then split
        ca = lambda i: t[f"transformer.h.{i}.attn.c_attn.weight"].T
        cb = lambda i: t[f"transformer.h.{i}.attn.c_attn.bias"]
        ld.stack_fn("wq", lambda i: ca(i)[:, :D])
        ld.stack_fn("wk", lambda i: ca(i)[:, D:2 * D])
        ld.stack_fn("wv", lambda i: ca(i)[:, 2 * D:])
        ld.stack_fn("bq", lambda i: cb(i)[:D])
        ld.stack_fn("bk", lambda i: cb(i)[D:2 * D])
        ld.stack_fn("bv", lambda i: cb(i)[2 * D:])
        ld.stack("wo", p + "attn.c_proj.weight", transpose=True)
        ld.stack("w_gate", p + "mlp.w2.weight", transpose=True)
        ld.stack("w_up", p + "mlp.w1.weight", transpose=True)
        ld.stack("w_down", p + "mlp.c_proj.weight", transpose=True)
        ld.put("embed", "transformer.wte.weight")
        ld.put("final_norm", "transformer.ln_f.weight")
        ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("DeciLMForCausalLM")
def _decilm():
    """DeciLM: llama with VARIABLE GQA per layer
    (num_key_value_heads_per_layer). Like the reference
    (vllm/model_executor/models/decilm.py:49-55 _degroup_weight) we
    normalise at load time to uniform GQA at the max head count by
    replicating each kv-head group consecutively - attention output is
    bit-identical because query head i's group index floor(i*h_l/Hq)
    becomes floor(i*H*/Hq) after replication."""
    def cfg_fn(hf, name):
        per_layer = hf.get("num_key_value_heads_per_layer")
        kv = max(per_layer) if per_layer else _g(
            hf, "num_key_value_heads", default=hf["num_attention_heads"])
        cfg = _base_cfg(hf, "DeciLMForCausalLM", name, num_kv_heads=kv)
        cfg.decilm_kv_heads_per_layer = tuple(per_layer) if per_layer \
            else None
        return cfg

    def load_fn(t, cfg, dtype):
        per_layer = getattr(cfg, "decilm_kv_heads_per_layer", None)
        if not per_layer:
            return _load_llama_style(t, cfg, dtype)
        d, H = cfg.head_size, cfg.num_kv_heads

        # normalise the checkpoint to uniform GQA before the generic load
        t = dict(t)
        for i, h_l in enumerate(per_layer):
            rep = H // h_l
            if rep == 1:
                continue
            for which in ("k", "v"):
                key = f"model.layers.{i}.self_attn.{which}_proj.weight"
                w = t[key].reshape(h_l, d, -1)
                t[key] = np.repeat(w, rep, axis=0).reshape(H * d, -1)
        return _load_llama_style(t, cfg, dtype)

    return cfg_fn, load_fn


@_register("JAISLMHeadModel")
def _jais():
    """JAIS (reference vllm/model_executor/models/jais.py): GPT-2 layout
    (Conv1D [in, out] tensors, fused c_attn) with ALiBi positions, muP
    scaling (embeddings_scale on the embedding, width_scale on the logits,
    1/d attention scale when scale_qk_dot_by_d), and a SwiGLU MLP where
    c_fc2 is the gate (jais.py:49-52,162-168: c_fc(x) * silu(c_fc2(x)))."""
    def cfg_fn(hf, name):
        heads = _g(hf, "num_attention_heads", "n_head")
        hidden = _g(hf, "hidden_size", "n_embd")
        swiglu = _g(hf, "activation_function") == "swiglu"
        alibi = _g(hf, "position_embedding_type", default="alibi") == "alibi"
        scale_by_d = _g(hf, "scale_qk_dot_by_d", "mup_scale_qk_dot_by_d",
                        default=False)
        d = hidden // heads
        emb_scale = _g(hf, "embeddings_scale", "mup_embeddings_scale",
                       default=1.0)
        width_scale = _g(hf, "width_scale", default=None)
        if width_scale is None:
            width_scale = (_g(hf, "mup_output_alpha", default=1.0)
                           * _g(hf, "mup_width_scale", default=1.0))
        return _base_cfg(
            hf, "JAISLMHeadModel", name,
            num_layers=_g(hf, "num_hidden_layers", "n_layer"),
            num_heads=heads, num_kv_heads=heads, hidden_size=hidden,
            head_size=d,
            intermediate_size=_g(hf, "n_inner", default=4 * hidden),
            max_model_len=_g(hf, "n_positions",
                             "max_position_embeddings", default=2048),
            norm_type="layernorm", norm_bias=True,
            pos_embedding="none" if alibi else "learned",
            alibi=alibi,
            mlp_type="gated" if swiglu else "plain",
            attention_bias=True, qkv_bias=True, o_bias=True,
            mlp_bias=True,
            tie_word_embeddings=_g(hf, "tie_word_embeddings", default=True),
            embedding_multiplier=float(emb_scale),
            # logits_scaling DIVIDES (granite semantics); JAIS multiplies
            logits_scaling=1.0 / float(width_scale),
            attention_scale=(1.0 / d) if scale_by_d else None,
            hidden_act="silu" if swiglu else _g(
                hf, "activation_function", default="gelu_new"))

    def load_fn(t, cfg, dtype):
        D = cfg.hidden_size
        pre = "" if "h.0.ln_1.weight" in t else "transformer."
        p = pre + "h.{}."
        ld = _Loader(t, cfg, dtype)
        ld.stack("input_norm", p + "ln_1.weight")
        ld.stack("input_norm_b", p + "ln_1.bias")
        ld.stack("post_attn_norm", p + "ln_2.weight")
        ld.stack("post_attn_norm_b", p + "ln_2.bias")
        # Conv1D layout [in, out]: no transpose
        ca = lambda i: t[f"{pre}h.{i}.attn.c_attn.weight"]
        cb = lambda i: t[f"{pre}h.{i}.attn.c_attn.bias"]
        ld.stack_fn("wq", lambda i: ca(i)[:, :D])
        ld.stack_fn("wk", lambda i: ca(i)[:, D:2 * D])
        ld.stack_fn("wv", lambda i: ca(i)[:, 2 * D:])
        ld.stack_fn("bq", lambda i: cb(i)[:D])
        ld.stack_fn("bk", lambda i: cb(i)[D:2 * D])
        ld.stack_fn("bv", lambda i: cb(i)[2 * D:])
        ld.stack("wo", p + "attn.c_proj.weight")
        ld.stack("bo", p + "attn.c_proj.bias")
        if cfg.mlp_type == "gated":
            ld.stack("w_gate", p + "mlp.c_fc2.weight")
            ld.stack("b_gate", p + "mlp.c_fc2.bias")
            ld.stack("w_up", p + "mlp.c_fc.weight")
            ld.stack("b_up", p + "mlp.c_fc.bias")
            ld.stack("w_down", p + "mlp.c_proj.weight")
            ld.stack("b_down", p + "mlp.c_proj.bias")
        else:
            ld.stack("w_fc1", p + "mlp.c_fc.weight")
            ld.stack("b_fc1", p + "mlp.c_fc.bias")
            ld.stack("w_fc2", p + "mlp.c_proj.weight")
            ld.stack("b_fc2", p + "mlp.c_proj.bias")
        ld.put("embed", pre + "wte.weight")
        if cfg.pos_embedding == "learned":
            ld.put("pos_embed", pre + "wpe.weight")
        ld.put("final_norm", pre + "ln_f.weight")
        ld.put("final_norm_b", pre + "ln_f.bias")
        if not cfg.tie_word_embeddings:
            ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("Phi3SmallForCausalLM")
def _phi3_small():
    """Phi-3-small (reference vllm/model_executor/models/phi3_small.py):
    LayerNorm, head-major fused query_key_value, gegelu MLP with
    interleaved gate/up columns, muP scaling (embedding multiplier, 1/
    mup_width_multiplier on logits, mup_attn_multiplier/d attention scale),
    linear rope position scale.

    Blocksparse attention (phi3_small.py:118-127) is NOT implemented; a
    checkpoint whose non-dense layers would use the blocksparse mask is
    rejected loudly unless dense_attention_every_n_layers == 1."""
    def cfg_fn(hf, name):
        if (hf.get("blocksparse_block_size") is not None
                and hf.get("dense_attention_every_n_layers", 1) != 1):
            raise ValueError(
                "Phi3Small blocksparse attention layers are not supported "
                "(reference phi3_small.py:118-127 BlocksparseParams); only "
                "checkpoints with dense_attention_every_n_layers == 1 load")
        heads = hf["num_attention_heads"]
        hidden = hf["hidden_size"]
        d = hidden // heads
        if hf.get("mup_use_scaling", False):
            attn_scale = hf["mup_attn_multiplier"] / d
        else:
            attn_scale = d ** -0.5
        scaling = hf.get("rope_scaling")
        if scaling is None and hf.get("rope_position_scale", 1.0) != 1.0:
            scaling = {"type": "linear",
                       "factor": hf["rope_position_scale"]}
        return _base_cfg(
            hf, "Phi3SmallForCausalLM", name,
            norm_type="layernorm", norm_bias=True,
            rope_theta=_g(hf, "rope_embedding_base", default=10000.0),
            rope_scaling=scaling,
            attention_bias=True, qkv_bias=True, o_bias=True, mlp_bias=True,
            attention_scale=attn_scale,
            embedding_multiplier=float(
                hf.get("mup_embedding_multiplier") or 1.0),
            logits_scaling=float(hf.get("mup_width_multiplier") or 1.0),
            hidden_act="gegelu",
            gegelu_limit=hf.get("gegelu_limit"),
            rms_norm_eps=_g(hf, "layer_norm_epsilon", default=1e-5),
            tie_word_embeddings=_g(hf, "tie_word_embeddings", default=True))

    def load_fn(t, cfg, dtype):
        d = cfg.head_size
        Hq, Hkv = cfg.num_heads, cfg.num_kv_heads
        qpk = Hq // Hkv
        p = "model.layers.{}."
        ld = _Loader(t, cfg, dtype)
        ld.stack("input_norm", p + "input_layernorm.weight")
        ld.stack("input_norm_b", p + "input_layernorm.bias")
        ld.stack("post_attn_norm", p + "post_attention_layernorm.weight")
        ld.stack("post_attn_norm_b", p + "post_attention_layernorm.bias")

        # head-major fused qkv: per kv group (qpk q-heads, 1 k, 1 v)
        def qkv(i, which, bias):
            sfx = "bias" if bias else "weight"
            w = t[f"model.layers.{i}.self_attn.query_key_value.{sfx}"]
            g = w.reshape(Hkv, (qpk + 2) * d, *w.shape[1:])
            if which == "q":
                part = g[:, :qpk * d]
            elif which == "k":
                part = g[:, qpk * d:(qpk + 1) * d]
            else:
                part = g[:, (qpk + 1) * d:]
            part = part.reshape(-1, *w.shape[1:])
            return part if bias else part.T

        for nm, wh in (("wq", "q"), ("wk", "k"), ("wv", "v")):
            ld.stack_fn(nm, lambda i, wh=wh: qkv(i, wh, False))
        for nm, wh in (("bq", "q"), ("bk", "k"), ("bv", "v")):
            ld.stack_fn(nm, lambda i, wh=wh: qkv(i, wh, True))
        ld.stack("wo", p + "self_attn.dense.weight", transpose=True)
        ld.stack("bo", p + "self_attn.dense.bias")

        # gegelu up_proj: even columns = gelu(gate) side, odd = linear(up)
        def updeint(i, odd, bias):
            sfx = "bias" if bias else "weight"
            w = t[f"model.layers.{i}.mlp.up_proj.{sfx}"]
            part = w[1::2] if odd else w[0::2]
            return part if bias else part.T

        ld.stack_fn("w_gate", lambda i: updeint(i, False, False))
        ld.stack_fn("b_gate", lambda i: updeint(i, False, True))
        ld.stack_fn("w_up", lambda i: updeint(i, True, False))
        ld.stack_fn("b_up", lambda i: updeint(i, True, True))
        ld.stack("w_down", p + "mlp.down_proj.weight", transpose=True)
        ld.stack("b_down", p + "mlp.down_proj.bias")
        ld.put("embed", "model.embed_tokens.weight")
        ld.put("final_norm", "model.final_layernorm.weight")
        ld.put("final_norm_b", "model.final_layernorm.bias")
        if not cfg.tie_word_embeddings and "lm_head.weight" in t:
            ld.put("lm_head", "lm_head.weight")
        return ld.params()

    return cfg_fn, load_fn


@_register("DeepseekForCausalLM")
def _deepseek_v1():
    """DeepSeek v1 (reference vllm/model_executor/models/deepseek.py):
    standard llama attention (no MLA) + MoE with shared experts,
    first_k_dense_replace dense layers and moe_layer_freq; softmax top-k
    routing with optional renormalisation (deepseek.py:155-165)."""
    def cfg_fn(hf, name):
        E = hf.get("n_routed_experts") or 0
        sh = ((hf.get("n_shared_experts") or 0)
              * (hf.get("moe_intermediate_size") or 0))
        return _base_cfg(
            hf, "DeepseekForCausalLM", name,
            num_experts=E,
            num_experts_per_tok=hf.get("num_experts_per_tok", 2),
            moe_intermediate_size=hf.get("moe_intermediate_size"),
            moe_norm_topk_prob=hf.get("norm_topk_prob", False),
            # dense layers ride in the shared-expert slots; pad the slot
            # width so the wider of (dense I, shared I) fits
            moe_shared_expert_size=max(sh, hf["intermediate_size"])
            if E else 0)

    def load_fn(t, cfg, dtype):
        params = _load_llama_style(t, cfg, dtype,
                                   skip_mlp=bool(cfg.num_experts))
        if not cfg.num_experts:
            return params
        D = cfg.hidden_size
        E, Im = cfg.num_experts, cfg.moe_intermediate_size
        I_sh = cfg.moe_shared_expert_size
        ld = _Loader(t, cfg, dtype)

        def moe_layer(i):
            return f"model.layers.{i}.mlp.gate.weight" in t

        def shared(i, which):
            key = f"model.layers.{i}.mlp.shared_experts.{which}.weight"
            if moe_layer(i) and key not in t:
                # n_shared_experts == 0: routed-only MoE layer
                return (np.zeros((I_sh, D), np.float32)
                        if which == "down_proj"
                        else np.zeros((D, I_sh), np.float32))
            w = (t[key] if moe_layer(i)
                 else t[f"model.layers.{i}.mlp.{which}.weight"])
            w = w.T
            if which == "down_proj":
                out = np.zeros((I_sh, D), w.dtype)
                out[:w.shape[0]] = w
            else:
                out = np.zeros((D, I_sh), w.dtype)
                out[:, :w.shape[1]] = w
            return out

        for nm, which in (("shared_gate", "gate_proj"),
                          ("shared_up", "up_proj"),
                          ("shared_down", "down_proj")):
            ld.stack_fn(nm, lambda i, which=which: shared(i, which))
        ld.stack_fn("router", lambda i: (
            t[f"model.layers.{i}.mlp.gate.weight"].T if moe_layer(i)
            else np.zeros((D, E), np.float32)))

        def experts(i, which, down=False):
            if not moe_layer(i):
                return (np.zeros((E, Im, D), np.float32) if down
                        else np.zeros((E, D, Im), np.float32))
            return np.stack([
                t[f"model.layers.{i}.mlp.experts.{e}.{which}.weight"].T
                for e in range(E)])

        ld.stack_fn("experts_gate", lambda i: experts(i, "gate_proj"))
        ld.stack_fn("experts_up", lambda i: experts(i, "up_proj"))
        ld.stack_fn("experts_down",
                    lambda i: experts(i, "down_proj", down=True))
        params["layers"].update(ld.layers)
        return params

    return cfg_fn, load_fn


@_register("ArcticForCausalLM")
def _arctic():
    """Snowflake Arctic (reference vllm/model_executor/models/arctic.py):
    llama attention + dense/MoE hybrid layers. MoE layers (every
    moe_layer_frequency-th) run routed experts on the PRE-attention
    residual plus a parallel residual_mlp (ffn=hidden) on the
    post-attention stream (arctic.py:330-357); other layers are plain
    dense FFN. Routing is softmax top-k with renormalisation when k > 1
    (arctic.py:170-174)."""
    def cfg_fn(hf, name):
        if not hf.get("use_residual", True):
            raise ValueError(
                "ArcticForCausalLM with use_residual=False is not "
                "supported (the hybrid-residual dataflow assumes the "
                "published snowflake config, arctic.py:304-309)")
        E = hf.get("num_local_experts") or 0
        k = hf.get("num_experts_per_tok", 1)
        return _base_cfg(
            hf, "ArcticForCausalLM", name,
            num_experts=E, num_experts_per_tok=k,
            moe_intermediate_size=hf["intermediate_size"],
            moe_norm_topk_prob=k > 1,
            arctic_residual=True)

    def load_fn(t, cfg, dtype):
        D = cfg.hidden_size
        E, Im = cfg.num_experts, cfg.moe_intermediate_size
        # dense branch width: residual_mlp uses hidden, dense FFN uses
        # intermediate - pad the shared slot to the max
        I_sh = max(D, cfg.intermediate_size)
        params = _load_llama_style(t, cfg, dtype, skip_mlp=True)
        ld = _Loader(t, cfg, dtype)

        def moe_layer(i):
            return (f"model.layers.{i}.block_sparse_moe.gate.weight" in t)

        # w1 = gate, w3 = up, w2 = down (SiluAndMul convention)
        def shared(i, which):
            if moe_layer(i):
                w = t[f"model.layers.{i}.residual_mlp.{which}.weight"]
            else:
                w = t[f"model.layers.{i}.block_sparse_moe.mlp."
                      f"{which}.weight"]
            w = w.T
            if which == "w2":
                out = np.zeros((I_sh, D), w.dtype)
                out[:w.shape[0]] = w
            else:
                out = np.zeros((D, I_sh), w.dtype)
                out[:, :w.shape[1]] = w
            return out

        for nm, which in (("shared_gate", "w1"), ("shared_up", "w3"),
                          ("shared_down", "w2")):
            ld.stack_fn(nm, lambda i, which=which: shared(i, which))

        def res_norm(i):
            key = f"model.layers.{i}.residual_layernorm.weight"
            if key in t:
                return t[key]
            return t[f"model.layers.{i}.post_attention_layernorm.weight"]

        ld.stack_fn("res_norm", res_norm)
        ld.stack_fn("router", lambda i: (
            t[f"model.layers.{i}.block_sparse_moe.gate.weight"].T
            if moe_layer(i) else np.zeros((D, E), np.float32)))

        def experts(i, which, down=False):
            if not moe_layer(i):
                return (np.zeros((E, Im, D), np.float32) if down
                        else np.zeros((E, D, Im), np.float32))
            return np.stack([
                t[f"model.layers.{i}.block_sparse_moe.experts.{e}."
                  f"{which}.weight"].T for e in range(E)])

        ld.stack_fn("experts_gate", lambda i: experts(i, "w1"))
        ld.stack_fn("experts_up", lambda i: experts(i, "w3"))
        ld.stack_fn("experts_down", lambda i: experts(i, "w2", down=True))
        params["layers"].update(ld.layers)
        return params

    return cfg_fn, load_fn


# Reference architectures that are intentionally NOT implemented, with the
# reason - so an unsupported checkpoint fails LOUDLY and specifically
# instead of key-erroring mid-load (reference model zoo:
# vllm/model_executor/models/). Speculative heads (medusa / mlp_speculator
# / eagle) are draft models consumed through SpeculativeConfig, not
# servable architectures.
_KNOWN_UNSUPPORTED: Dict[str, str] = {
    "BartForConditionalGeneration": "encoder-decoder (no KVC semantics for "
    "cross-attention caches in the reference either) - model-level BART "
    "(HF-parity encode/decode + cached generation) lives in models/bart.py",
    "JambaForCausalLM": "mamba mixer layers have no per-token KV cache to "
    "compress; the reference's KVC path blesses llama-family attention "
    "only and serves jamba on its VANILLA engine - model-level jamba "
    "(HF-parity forward + stateful generation) lives in models/jamba.py",
    "InternVLChatModel": "legacy trust_remote_code internvl export; "
    "re-export with transformers >= 4.52 as "
    "InternVLForConditionalGeneration (which IS supported)",
    "QWenLMHeadModel-VL": "multimodal (text QWenLMHeadModel is supported)",
    "EAGLEModel": "speculative proposer; use speculative.method instead",
    "MedusaModel": "speculative proposer; use speculative.method='medusa'",
    "MLPSpeculatorPreTrainedModel":
        "speculative proposer; use speculative.method='mlp_speculator'",
}


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def supported_architectures():
    return sorted(_REGISTRY)


def config_from_hf(hf_cfg: dict, model_name: str = "") -> ModelConfig:
    arch = (hf_cfg.get("architectures") or ["LlamaForCausalLM"])[0]
    if arch not in _REGISTRY:
        if arch in _KNOWN_UNSUPPORTED:
            raise ValueError(
                f"architecture {arch} is intentionally unsupported: "
                f"{_KNOWN_UNSUPPORTED[arch]}")
        raise ValueError(
            f"unsupported architecture {arch}; supported: "
            f"{supported_architectures()}")
    return _REGISTRY[arch].config_fn(hf_cfg, model_name)


def params_from_hf_state(t: Dict[str, np.ndarray], cfg: ModelConfig,
                         dtype=jnp.bfloat16) -> Dict[str, Any]:
    arch = cfg.architecture
    if arch not in _REGISTRY:
        raise ValueError(f"unsupported architecture {arch}")
    return _REGISTRY[arch].load_fn(t, cfg, dtype)
