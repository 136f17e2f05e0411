"""CLIP vision tower + LLaVA projector (multimodal image encoding).

The role of reference vllm/model_executor/models/clip.py (CLIPVisionModel)
and llava.py (LlavaForConditionalGeneration: vision tower -> feature
select -> multi_modal_projector -> splice into the text embedding
stream, llava.py merge_multimodal_embeddings). TPU-native shape: the ViT
is a scan over stacked layers like the text decoder; the patch conv is a
reshape + one matmul (patches are non-overlapping, so conv == unfold +
GEMM, which lands on the MXU directly); encoding runs as its own jitted
program once per image, decoupled from the serving engine - the engine
only ever receives finished [n_tokens, D_text] embeddings to scatter into
the prompt (engine/programs.py mm_embed path).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    image_size: int
    patch_size: int
    layer_norm_eps: float = 1e-5
    # llava defaults: features from the second-to-last layer, CLS dropped
    feature_layer: int = -2
    select_strategy: str = "default"
    # llava-next AnyRes grid pinpoints ((h, w) tile layouts); empty for
    # base llava
    grid_pinpoints: tuple = ()

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def config_from_hf(vc: dict, llava_cfg: Optional[dict] = None
                   ) -> VisionConfig:
    llava_cfg = llava_cfg or {}
    return VisionConfig(
        hidden_size=vc["hidden_size"],
        intermediate_size=vc["intermediate_size"],
        num_layers=vc["num_hidden_layers"],
        num_heads=vc["num_attention_heads"],
        image_size=vc["image_size"],
        patch_size=vc["patch_size"],
        layer_norm_eps=vc.get("layer_norm_eps", 1e-5),
        feature_layer=llava_cfg.get("vision_feature_layer", -2),
        select_strategy=llava_cfg.get("vision_feature_select_strategy",
                                      "default"),
        grid_pinpoints=tuple(
            tuple(p) for p in llava_cfg.get("image_grid_pinpoints") or ()),
    )


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_vision_forward(params: Dict[str, Any], cfg: VisionConfig,
                        pixel_values: jax.Array) -> jax.Array:
    """pixel_values [3, H, W] (CLIP-normalized) -> hidden states
    [1 + num_patches, D_v] taken at cfg.feature_layer (HF semantics:
    hidden_states[i] is the input of layer i, so layer -2 output == run
    all but the last layer; post_layernorm is NOT applied to intermediate
    features, matching CLIPVisionTransformer.output_hidden_states)."""
    D, P = cfg.hidden_size, cfg.patch_size
    C, H, W = pixel_values.shape
    # non-overlapping patch conv == unfold to [n_patches, C*P*P] @ W
    x = pixel_values.reshape(C, H // P, P, W // P, P)
    x = jnp.transpose(x, (1, 3, 0, 2, 4)).reshape(-1, C * P * P)
    x = x @ params["patch_embed"]                    # [n_patches, D]
    x = jnp.concatenate([params["class_embed"][None, :], x], axis=0)
    x = x + params["pos_embed"]
    x = _ln(x, params["pre_ln"], params["pre_ln_b"], cfg.layer_norm_eps)

    n_used = cfg.num_layers + 1 + cfg.feature_layer \
        if cfg.feature_layer < 0 else cfg.feature_layer
    layers = jax.tree.map(lambda a: a[:n_used], params["layers"])
    h = cfg.num_heads
    d = D // h

    def layer(x, lw):
        r = x
        y = _ln(x, lw["ln1"], lw["ln1_b"], cfg.layer_norm_eps)
        T = y.shape[0]
        q = (y @ lw["wq"] + lw["bq"]).reshape(T, h, d)
        k = (y @ lw["wk"] + lw["bk"]).reshape(T, h, d)
        v = (y @ lw["wv"] + lw["bv"]).reshape(T, h, d)
        logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * d ** -0.5
        probs = jax.nn.softmax(logits, axis=-1)     # full (non-causal)
        o = jnp.einsum("hqk,khd->qhd", probs,
                       v.astype(jnp.float32)).reshape(T, D)
        x = r + (o.astype(y.dtype) @ lw["wo"] + lw["bo"])
        r = x
        y = _ln(x, lw["ln2"], lw["ln2_b"], cfg.layer_norm_eps)
        y = _quick_gelu(y @ lw["fc1"] + lw["b1"]) @ lw["fc2"] + lw["b2"]
        return x + y, None

    x, _ = jax.lax.scan(layer, x, layers)
    return x


def llava_image_embed(params: Dict[str, Any], cfg: VisionConfig,
                      pixel_values: jax.Array) -> jax.Array:
    """Image -> projected text-space embeddings [n_tokens, D_text]
    (reference llava.py: vision tower -> feature select -> projector)."""
    feats = clip_vision_forward(params["vision"], cfg, pixel_values)
    if cfg.select_strategy == "default":
        feats = feats[1:]        # drop CLS (llava.py select "default")
    pj = params["projector"]
    y = feats @ pj["w1"] + pj["b1"]
    y = jax.nn.gelu(y, approximate=False)
    return y @ pj["w2"] + pj["b2"]


# --------------------------------------------------------- llava-next
# AnyRes tiling (reference vllm/model_executor/models/llava_next.py
# _merge_image_patch_embeddings strategy="spatial_unpad" + the
# select_best_resolution / get_anyres_image_grid_shape / unpad_image
# helpers it imports). Runs eagerly per request (shapes depend on the
# image size); the merged embeddings enter the engine through the same
# mm_embed splice as base llava.

def select_best_resolution(original_hw, possible_resolutions):
    """(h, w) of the grid pinpoint that maximizes effective resolution,
    then minimizes wasted area (transformers image_processing_llava_next
    select_best_resolution semantics)."""
    oh, ow = original_hw
    best, max_eff, min_waste = None, 0, float("inf")
    for h, w in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            best, max_eff, min_waste = (h, w), eff, waste
    return best


def anyres_grid_shape(original_hw, grid_pinpoints, tile_size):
    bh, bw = select_best_resolution(original_hw, grid_pinpoints)
    return bh // tile_size, bw // tile_size  # (num_patch_h, num_patch_w)


def _unpad_hw(x: np.ndarray, original_hw) -> np.ndarray:
    """x [C, H, W]: remove the letterbox padding added when the original
    (oh, ow) image was aspect-preserving-resized into (H, W)."""
    oh, ow = original_hw
    C, H, W = x.shape
    if ow / oh > W / H:
        new_h = int(round(oh * (W / ow), 7))
        pad = (H - new_h) // 2
        return x[:, pad:H - pad]
    new_w = int(round(ow * (H / oh), 7))
    pad = (W - new_w) // 2
    return x[:, :, pad:W - pad]


def llava_next_image_embed(params: Dict[str, Any], cfg: VisionConfig,
                           pixel_values: jax.Array, image_size,
                           grid_pinpoints) -> jax.Array:
    """AnyRes image -> merged text-space embeddings [n_tokens, D_text].

    pixel_values [n_tiles, 3, sz, sz]: tile 0 is the base (whole-image)
    resize, tiles 1.. are the best-resolution grid crops. Each tile runs
    the shared CLIP tower + projector; the grid features are re-assembled
    spatially, unpadded back to the original aspect ratio, and an
    image_newline column is appended per row (strategy "spatial_unpad").
    """
    n_tiles = pixel_values.shape[0]
    feats = [np.asarray(llava_image_embed(params, cfg, pixel_values[i]))
             for i in range(n_tiles)]
    side = cfg.image_size // cfg.patch_size
    base = feats[0]                                  # [side*side, D]
    newline = np.asarray(params["image_newline"])    # [D]
    if n_tiles == 1:
        return jnp.asarray(np.concatenate([base, newline[None]], axis=0))
    nph, npw = anyres_grid_shape(image_size, grid_pinpoints,
                                 cfg.image_size)
    other = np.stack(feats[1:1 + nph * npw])         # [np, side*side, D]
    D = other.shape[-1]
    # [nph, npw, side, side, D] -> [D, nph*side, npw*side]
    g = other.reshape(nph, npw, side, side, D).transpose(4, 0, 2, 1, 3)
    g = g.reshape(D, nph * side, npw * side)
    g = _unpad_hw(g, image_size)
    nl = np.broadcast_to(newline[:, None, None],
                         (D, g.shape[1], 1)).astype(g.dtype)
    g = np.concatenate([g, nl], axis=2)              # newline per row
    g = g.reshape(D, -1).T                           # [rows*(cols+1), D]
    return jnp.asarray(np.concatenate([base, g], axis=0))


# --------------------------------------------------------------- fuyu
def fuyu_params_from_hf(t: Dict[str, np.ndarray], dtype=jnp.float32
                        ) -> Dict[str, Any]:
    """Fuyu's vision side is ONE linear over raw flattened patches
    (reference vllm/model_executor/models/fuyu.py vision_embed_tokens;
    patchification itself is the HF FuyuImageProcessor's job, as in the
    reference)."""
    pre = ("model." if any(k.startswith("model.vision_embed_tokens")
                           for k in t) else "")
    return {
        "proj_w": jnp.asarray(
            np.asarray(t[pre + "vision_embed_tokens.weight"]).T, dtype),
        "proj_b": jnp.asarray(t[pre + "vision_embed_tokens.bias"], dtype),
    }


def fuyu_image_embed(params: Dict[str, Any],
                     image_patches: jax.Array) -> jax.Array:
    """[n, patch_size*patch_size*3] flattened patches -> [n, D_text]."""
    return (image_patches @ params["proj_w"].astype(image_patches.dtype)
            + params["proj_b"].astype(image_patches.dtype))


def expand_image_tokens(prompt_token_ids, image_token: int, n_patches: int
                        ) -> Tuple[list, np.ndarray]:
    """Expand each <image> placeholder into n_patches placeholder ids and
    return (expanded_ids, positions) - the positions the prefill program
    scatters projected patch embeddings over (reference llava.py input
    processor duplicating the image token)."""
    out, pos = [], []
    for tok in prompt_token_ids:
        if tok == image_token:
            pos.extend(range(len(out), len(out) + n_patches))
            out.extend([image_token] * n_patches)
        else:
            out.append(tok)
    return out, np.asarray(pos, np.int32)


# --------------------------------------------------------------- blip-2
# Reference vllm/model_executor/models/blip2.py: Blip2VisionModel (a CLIP
# variant: packed qkv with [q, 0, v] bias, NO pre-layernorm, post-layernorm
# applied to the final hidden states) -> Q-Former (BERT post-LN layers over
# `num_query_tokens` learned queries, cross-attending the image features
# every `cross_attention_frequency` layers) -> language_projection. The
# projected query outputs enter the prompt through the same mm_embed
# splice as llava (the reference prepends them; the LLM surface expands
# `num_query_tokens` image placeholders instead - same positions, same
# math under causal attention).

@dataclasses.dataclass(frozen=True)
class Blip2Config:
    vision: VisionConfig
    q_hidden: int            # q-former hidden size
    q_layers: int
    q_heads: int
    q_intermediate: int
    num_query_tokens: int
    cross_frequency: int = 2
    layer_norm_eps: float = 1e-12


def blip2_config_from_hf(hf: dict) -> Blip2Config:
    vc = hf["vision_config"]
    qc = hf["qformer_config"]
    vis = VisionConfig(
        hidden_size=vc["hidden_size"],
        intermediate_size=vc["intermediate_size"],
        num_layers=vc["num_hidden_layers"],
        num_heads=vc["num_attention_heads"],
        image_size=vc["image_size"],
        patch_size=vc["patch_size"],
        layer_norm_eps=vc.get("layer_norm_eps", 1e-6),
        feature_layer=0,  # unused: blip2 takes the post-LN final states
    )
    return Blip2Config(
        vision=vis,
        q_hidden=qc["hidden_size"],
        q_layers=qc["num_hidden_layers"],
        q_heads=qc["num_attention_heads"],
        q_intermediate=qc["intermediate_size"],
        num_query_tokens=hf.get("num_query_tokens", 32),
        cross_frequency=qc.get("cross_attention_frequency", 2),
        layer_norm_eps=qc.get("layer_norm_eps", 1e-12),
    )


def blip2_vision_forward(params: Dict[str, Any], cfg: VisionConfig,
                         pixel_values: jax.Array) -> jax.Array:
    """[3, H, W] -> post-layernormed hidden states [1 + n_patches, D_v]
    (HF Blip2VisionModel.last_hidden_state)."""
    D, P = cfg.hidden_size, cfg.patch_size
    C, H, W = pixel_values.shape
    x = pixel_values.reshape(C, H // P, P, W // P, P)
    x = jnp.transpose(x, (1, 3, 0, 2, 4)).reshape(-1, C * P * P)
    x = x @ params["patch_embed"] + params["patch_embed_b"]
    x = jnp.concatenate([params["class_embed"][None, :], x], axis=0)
    x = x + params["pos_embed"]          # no pre-layernorm in blip2
    h = cfg.num_heads
    d = D // h

    def layer(x, lw):
        r = x
        y = _ln(x, lw["ln1"], lw["ln1_b"], cfg.layer_norm_eps)
        T = y.shape[0]
        qkv = (y @ lw["qkv"] + lw["qkv_b"]).reshape(T, 3, h, d)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * d ** -0.5
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", probs,
                       v.astype(jnp.float32)).reshape(T, D)
        x = r + (o.astype(y.dtype) @ lw["wo"] + lw["bo"])
        r = x
        y = _ln(x, lw["ln2"], lw["ln2_b"], cfg.layer_norm_eps)
        y = jax.nn.gelu(y @ lw["fc1"] + lw["b1"],
                        approximate=False) @ lw["fc2"] + lw["b2"]
        return x + y, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return _ln(x, params["post_ln"], params["post_ln_b"],
               cfg.layer_norm_eps)


def blip2_image_embed(params: Dict[str, Any], cfg: Blip2Config,
                      pixel_values: jax.Array) -> jax.Array:
    """Image -> projected query embeddings [num_query_tokens, D_text]
    (HF Blip2ForConditionalGeneration.get_image_features: vision tower ->
    Q-Former over the learned query tokens -> language_projection)."""
    feats = blip2_vision_forward(params["vision"], cfg.vision,
                                 pixel_values)          # [N, D_v]
    eps = cfg.layer_norm_eps
    h, Dq = cfg.q_heads, cfg.q_hidden
    d = Dq // h
    x = _ln(params["query_tokens"], params["qf_ln"], params["qf_ln_b"], eps)

    def attend(q_in, kv_in, lw, pre):
        T, S = q_in.shape[0], kv_in.shape[0]
        q = (q_in @ lw[f"{pre}_wq"] + lw[f"{pre}_bq"]).reshape(T, h, d)
        k = (kv_in @ lw[f"{pre}_wk"] + lw[f"{pre}_bk"]).reshape(S, h, d)
        v = (kv_in @ lw[f"{pre}_wv"] + lw[f"{pre}_bv"]).reshape(S, h, d)
        logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * d ** -0.5
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", probs,
                       v.astype(jnp.float32)).reshape(T, Dq)
        o = o.astype(q_in.dtype) @ lw[f"{pre}_wo"] + lw[f"{pre}_bo"]
        # BERT post-LN: dense -> LayerNorm(out + residual)
        return _ln(o + q_in, lw[f"{pre}_ln"], lw[f"{pre}_ln_b"], eps)

    # cross-attention layers are a static subset (layer_idx % freq == 0):
    # python loop over per-layer param slices, traced once per image shape
    for i in range(cfg.q_layers):
        lw = jax.tree.map(lambda a: a[i], params["qf_layers"])
        x = attend(x, x, lw, "self")
        if i % cfg.cross_frequency == 0:
            x = attend(x, feats, lw, "cross")
        y = jax.nn.gelu(x @ lw["ff_w1"] + lw["ff_b1"], approximate=False)
        y = y @ lw["ff_w2"] + lw["ff_b2"]
        x = _ln(y + x, lw["ff_ln"], lw["ff_ln_b"], eps)

    return x @ params["proj_w"] + params["proj_b"]


def blip2_params_from_hf(t: Dict[str, np.ndarray], cfg: Blip2Config,
                         dtype=jnp.float32) -> Dict[str, Any]:
    """Map HF Blip2 tensor names (vision_model.*, qformer.*, query_tokens,
    language_projection.*) to the layouts above."""
    def g(key, transpose=False):
        x = np.asarray(t[key])
        return jnp.asarray(x.T if transpose else x, dtype)

    def stack(fmt, n, transpose=False):
        xs = [np.asarray(t[fmt.format(i)]) for i in range(n)]
        return jnp.asarray(
            np.stack([x.T if transpose else x for x in xs]), dtype)

    nv = cfg.vision.num_layers
    vp = "vision_model.encoder.layers.{}."
    vision = {
        "layers": {
            "ln1": stack(vp + "layer_norm1.weight", nv),
            "ln1_b": stack(vp + "layer_norm1.bias", nv),
            "ln2": stack(vp + "layer_norm2.weight", nv),
            "ln2_b": stack(vp + "layer_norm2.bias", nv),
            "qkv": stack(vp + "self_attn.qkv.weight", nv, transpose=True),
            "qkv_b": stack(vp + "self_attn.qkv.bias", nv),
            "wo": stack(vp + "self_attn.projection.weight", nv,
                        transpose=True),
            "bo": stack(vp + "self_attn.projection.bias", nv),
            "fc1": stack(vp + "mlp.fc1.weight", nv, transpose=True),
            "b1": stack(vp + "mlp.fc1.bias", nv),
            "fc2": stack(vp + "mlp.fc2.weight", nv, transpose=True),
            "b2": stack(vp + "mlp.fc2.bias", nv),
        },
        "patch_embed": jnp.asarray(
            np.asarray(t["vision_model.embeddings.patch_embedding.weight"]
                       ).reshape(cfg.vision.hidden_size, -1).T, dtype),
        "patch_embed_b": g("vision_model.embeddings.patch_embedding.bias"),
        "class_embed": g("vision_model.embeddings.class_embedding"
                         ).reshape(-1),
        "pos_embed": g("vision_model.embeddings.position_embedding"
                       ).reshape(-1, cfg.vision.hidden_size),
        "post_ln": g("vision_model.post_layernorm.weight"),
        "post_ln_b": g("vision_model.post_layernorm.bias"),
    }
    nq = cfg.q_layers
    qp = "qformer.encoder.layer.{}."

    def qstack(suffix, transpose=False):
        return stack(qp + suffix, nq, transpose=transpose)

    qf_layers = {
        "self_wq": qstack("attention.attention.query.weight",
                          transpose=True),
        "self_bq": qstack("attention.attention.query.bias"),
        "self_wk": qstack("attention.attention.key.weight", transpose=True),
        "self_bk": qstack("attention.attention.key.bias"),
        "self_wv": qstack("attention.attention.value.weight",
                          transpose=True),
        "self_bv": qstack("attention.attention.value.bias"),
        "self_wo": qstack("attention.output.dense.weight", transpose=True),
        "self_bo": qstack("attention.output.dense.bias"),
        "self_ln": qstack("attention.output.LayerNorm.weight"),
        "self_ln_b": qstack("attention.output.LayerNorm.bias"),
        "ff_w1": qstack("intermediate_query.dense.weight", transpose=True),
        "ff_b1": qstack("intermediate_query.dense.bias"),
        "ff_w2": qstack("output_query.dense.weight", transpose=True),
        "ff_b2": qstack("output_query.dense.bias"),
        "ff_ln": qstack("output_query.LayerNorm.weight"),
        "ff_ln_b": qstack("output_query.LayerNorm.bias"),
    }
    # cross-attention params exist only on every cross_frequency-th layer;
    # absent layers carry zeros (never read - the python loop above only
    # applies "cross" where the layer has one)
    def cstack(suffix, transpose=False):
        xs = []
        for i in range(nq):
            key = (qp + "crossattention." + suffix).format(i)
            if key in t:
                x = np.asarray(t[key])
                xs.append(x.T if transpose else x)
            else:
                xs.append(np.zeros_like(xs[0]) if xs else None)
        ref = next(x for x in xs if x is not None)
        xs = [x if x is not None else np.zeros_like(ref) for x in xs]
        return jnp.asarray(np.stack(xs), dtype)

    qf_layers.update({
        "cross_wq": cstack("attention.query.weight", transpose=True),
        "cross_bq": cstack("attention.query.bias"),
        "cross_wk": cstack("attention.key.weight", transpose=True),
        "cross_bk": cstack("attention.key.bias"),
        "cross_wv": cstack("attention.value.weight", transpose=True),
        "cross_bv": cstack("attention.value.bias"),
        "cross_wo": cstack("output.dense.weight", transpose=True),
        "cross_bo": cstack("output.dense.bias"),
        "cross_ln": cstack("output.LayerNorm.weight"),
        "cross_ln_b": cstack("output.LayerNorm.bias"),
    })
    return {
        "vision": vision,
        "qf_layers": qf_layers,
        "query_tokens": g("query_tokens").reshape(
            cfg.num_query_tokens, cfg.q_hidden),
        "qf_ln": g("qformer.layernorm.weight"),
        "qf_ln_b": g("qformer.layernorm.bias"),
        "proj_w": g("language_projection.weight", transpose=True),
        "proj_b": g("language_projection.bias"),
    }


# ----------------------------------------------------------- paligemma
# Reference vllm/model_executor/models/paligemma.py + siglip.py: a SigLIP
# vision tower (patch conv WITH bias, learned positions, NO class token,
# pre-LN layers with gelu_pytorch_tanh MLPs, post-layernorm on the final
# states, no pooling head) followed by one linear projector. The text
# tower is stock gemma; the prompt runs as a prefix-LM (ModelConfig
# .prefix_lm - see ops/attention.py prefill_attention). HF divides the
# projected features by sqrt(D_text) and the gemma embed path multiplies
# everything by sqrt(D_text); our splice happens AFTER the embed scaling
# and REPLACES the rows, so the raw projector output is the right value.

def siglip_vision_forward(params: Dict[str, Any], cfg: VisionConfig,
                          pixel_values: jax.Array) -> jax.Array:
    """pixel_values [3, H, W] -> post-layernormed hidden states
    [num_patches, D_v] (HF SiglipVisionTransformer.last_hidden_state with
    vision_use_head=False, as paligemma configures it)."""
    D, P = cfg.hidden_size, cfg.patch_size
    C, H, W = pixel_values.shape
    x = pixel_values.reshape(C, H // P, P, W // P, P)
    x = jnp.transpose(x, (1, 3, 0, 2, 4)).reshape(-1, C * P * P)
    x = x @ params["patch_embed"] + params["patch_embed_b"]
    x = x + params["pos_embed"]                  # no CLS token in siglip
    h = cfg.num_heads
    d = D // h

    def layer(x, lw):
        r = x
        y = _ln(x, lw["ln1"], lw["ln1_b"], cfg.layer_norm_eps)
        T = y.shape[0]
        q = (y @ lw["wq"] + lw["bq"]).reshape(T, h, d)
        k = (y @ lw["wk"] + lw["bk"]).reshape(T, h, d)
        v = (y @ lw["wv"] + lw["bv"]).reshape(T, h, d)
        logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * d ** -0.5
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", probs,
                       v.astype(jnp.float32)).reshape(T, D)
        x = r + (o.astype(y.dtype) @ lw["wo"] + lw["bo"])
        r = x
        y = _ln(x, lw["ln2"], lw["ln2_b"], cfg.layer_norm_eps)
        # siglip hidden_act = gelu_pytorch_tanh
        y = jax.nn.gelu(y @ lw["fc1"] + lw["b1"],
                        approximate=True) @ lw["fc2"] + lw["b2"]
        return x + y, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return _ln(x, params["post_ln"], params["post_ln_b"],
               cfg.layer_norm_eps)


def paligemma_image_embed(params: Dict[str, Any], cfg: VisionConfig,
                          pixel_values: jax.Array) -> jax.Array:
    """Image -> projected embeddings [num_patches, D_text] (HF
    PaliGemmaForConditionalGeneration.get_image_features WITHOUT the
    1/sqrt(D_text) scale - see the module comment above: the engine
    splice replaces post-scaled embedding rows, so HF's divide and
    gemma's multiply cancel exactly)."""
    feats = siglip_vision_forward(params["vision"], cfg, pixel_values)
    return feats @ params["proj_w"] + params["proj_b"]


def paligemma_params_from_hf(t: Dict[str, np.ndarray], cfg: VisionConfig,
                             dtype=jnp.float32) -> Dict[str, Any]:
    """Map HF paligemma tensor names (vision_tower.vision_model.* +
    multi_modal_projector.linear.*, optionally "model."-prefixed) to the
    stacked-layer layout of siglip_vision_forward."""
    pre = "model." if any(k.startswith("model.vision_tower.")
                          for k in t) else ""
    vt = pre + "vision_tower.vision_model."
    n = cfg.num_layers

    def g(key, transpose=False):
        x = np.asarray(t[key])
        return jnp.asarray(x.T if transpose else x, dtype)

    def stack(fmt, transpose=False):
        xs = [np.asarray(t[fmt.format(i)]) for i in range(n)]
        return jnp.asarray(
            np.stack([x.T if transpose else x for x in xs]), dtype)

    p = vt + "encoder.layers.{}."
    layers = {
        "ln1": stack(p + "layer_norm1.weight"),
        "ln1_b": stack(p + "layer_norm1.bias"),
        "ln2": stack(p + "layer_norm2.weight"),
        "ln2_b": stack(p + "layer_norm2.bias"),
        "wq": stack(p + "self_attn.q_proj.weight", transpose=True),
        "bq": stack(p + "self_attn.q_proj.bias"),
        "wk": stack(p + "self_attn.k_proj.weight", transpose=True),
        "bk": stack(p + "self_attn.k_proj.bias"),
        "wv": stack(p + "self_attn.v_proj.weight", transpose=True),
        "bv": stack(p + "self_attn.v_proj.bias"),
        "wo": stack(p + "self_attn.out_proj.weight", transpose=True),
        "bo": stack(p + "self_attn.out_proj.bias"),
        "fc1": stack(p + "mlp.fc1.weight", transpose=True),
        "b1": stack(p + "mlp.fc1.bias"),
        "fc2": stack(p + "mlp.fc2.weight", transpose=True),
        "b2": stack(p + "mlp.fc2.bias"),
    }
    conv = np.asarray(t[vt + "embeddings.patch_embedding.weight"])
    D = conv.shape[0]
    return {
        "vision": {
            "layers": layers,
            "patch_embed": jnp.asarray(conv.reshape(D, -1).T, dtype),
            "patch_embed_b": g(vt + "embeddings.patch_embedding.bias"),
            "pos_embed": g(vt + "embeddings.position_embedding.weight"),
            "post_ln": g(vt + "post_layernorm.weight"),
            "post_ln_b": g(vt + "post_layernorm.bias"),
        },
        "proj_w": g(pre + "multi_modal_projector.linear.weight",
                    transpose=True),
        "proj_b": g(pre + "multi_modal_projector.linear.bias"),
    }


# ------------------------------------------------------------ minicpmv
# Reference vllm/model_executor/models/minicpmv.py (Resampler2_5, the
# 2.5/2.6 shape): a SigLIP tower ("vpm") feeds a perceiver RESAMPLER -
# `query_num` learned queries cross-attend the patch features, whose
# KEYS carry a 2D sin-cos position embedding computed for the patch grid
# (MAE get_2d_sincos_pos_embed, version 2.5) - then ln_post + proj into
# the text space. Text tower is qwen2 (2.6) or llama3 (2.5).

def minicpmv_pos_2d(embed_dim: int, h: int, w: int) -> np.ndarray:
    """[h, w, embed_dim] 2D sin-cos positions (reference
    get_2d_sincos_pos_embed version (2,5); the MAE convention feeds the
    W coordinates to the 'h' half - reproduced exactly)."""
    grid_w, grid_h = np.meshgrid(np.arange(w, dtype=np.float32),
                                 np.arange(h, dtype=np.float32))

    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("hw,d->hwd", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    return np.concatenate([emb_1d(embed_dim // 2, grid_w),
                           emb_1d(embed_dim // 2, grid_h)], axis=-1)


def minicpmv_resample(params: Dict[str, Any], num_heads: int,
                      feats: jax.Array, tgt_hw) -> jax.Array:
    """[L, kv_dim] patch features -> [query_num, D_text] (reference
    Resampler2_5.forward: kv_proj -> ln_kv; keys + 2D pos; torch
    nn.MultiheadAttention with packed in_proj; ln_post; @proj)."""
    D = params["query"].shape[1]
    h, w = tgt_hw
    pos = jnp.asarray(minicpmv_pos_2d(D, h, w).reshape(-1, D),
                      feats.dtype)
    kv = feats @ params["kv_w"]
    kv = _ln(kv, params["ln_kv"], params["ln_kv_b"], 1e-5)
    q_in = _ln(params["query"], params["ln_q"], params["ln_q_b"], 1e-5)

    wq, wk, wv = jnp.split(params["in_proj_w"], 3, axis=0)   # [D, D] each
    bq, bk, bv = jnp.split(params["in_proj_b"], 3)
    d = D // num_heads
    Q = q_in.shape[0]
    L = kv.shape[0]
    q = (q_in @ wq.T + bq).reshape(Q, num_heads, d)
    k = ((kv + pos) @ wk.T + bk).reshape(L, num_heads, d)
    v = (kv @ wv.T + bv).reshape(L, num_heads, d)
    logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * d ** -0.5
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", probs,
                   v.astype(jnp.float32)).reshape(Q, D)
    o = o.astype(q_in.dtype) @ params["out_w"] + params["out_b"]
    o = _ln(o, params["ln_post"], params["ln_post_b"], 1e-5)
    return o @ params["proj"]


def minicpmv_image_embed(params: Dict[str, Any], cfg: VisionConfig,
                         num_heads: int,
                         pixel_values: jax.Array) -> jax.Array:
    """Image -> resampled embeddings [query_num, D_text]."""
    feats = siglip_vision_forward(params["vision"], cfg, pixel_values)
    side_h = pixel_values.shape[1] // cfg.patch_size
    side_w = pixel_values.shape[2] // cfg.patch_size
    return minicpmv_resample(params["resampler"], num_heads, feats,
                             (side_h, side_w))


def minicpmv_params_from_hf(t: Dict[str, np.ndarray], cfg: VisionConfig,
                            dtype=jnp.float32) -> Dict[str, Any]:
    """Map minicpmv tensor names (vpm.* siglip tower + resampler.*) to
    the siglip_vision_forward + minicpmv_resample layouts."""
    n = cfg.num_layers

    def g(key, transpose=False):
        x = np.asarray(t[key])
        return jnp.asarray(x.T if transpose else x, dtype)

    def stack(fmt, transpose=False):
        xs = [np.asarray(t[fmt.format(i)]) for i in range(n)]
        return jnp.asarray(
            np.stack([x.T if transpose else x for x in xs]), dtype)

    p = "vpm.encoder.layers.{}."
    layers = {
        "ln1": stack(p + "layer_norm1.weight"),
        "ln1_b": stack(p + "layer_norm1.bias"),
        "ln2": stack(p + "layer_norm2.weight"),
        "ln2_b": stack(p + "layer_norm2.bias"),
        "wq": stack(p + "self_attn.q_proj.weight", transpose=True),
        "bq": stack(p + "self_attn.q_proj.bias"),
        "wk": stack(p + "self_attn.k_proj.weight", transpose=True),
        "bk": stack(p + "self_attn.k_proj.bias"),
        "wv": stack(p + "self_attn.v_proj.weight", transpose=True),
        "bv": stack(p + "self_attn.v_proj.bias"),
        "wo": stack(p + "self_attn.out_proj.weight", transpose=True),
        "bo": stack(p + "self_attn.out_proj.bias"),
        "fc1": stack(p + "mlp.fc1.weight", transpose=True),
        "b1": stack(p + "mlp.fc1.bias"),
        "fc2": stack(p + "mlp.fc2.weight", transpose=True),
        "b2": stack(p + "mlp.fc2.bias"),
    }
    conv = np.asarray(t["vpm.embeddings.patch_embedding.weight"])
    D = conv.shape[0]
    return {
        "vision": {
            "layers": layers,
            "patch_embed": jnp.asarray(conv.reshape(D, -1).T, dtype),
            "patch_embed_b": g("vpm.embeddings.patch_embedding.bias"),
            "pos_embed": g("vpm.embeddings.position_embedding.weight"),
            "post_ln": g("vpm.post_layernorm.weight"),
            "post_ln_b": g("vpm.post_layernorm.bias"),
        },
        "resampler": {
            "query": g("resampler.query"),
            "kv_w": g("resampler.kv_proj.weight", transpose=True),
            "ln_q": g("resampler.ln_q.weight"),
            "ln_q_b": g("resampler.ln_q.bias"),
            "ln_kv": g("resampler.ln_kv.weight"),
            "ln_kv_b": g("resampler.ln_kv.bias"),
            "ln_post": g("resampler.ln_post.weight"),
            "ln_post_b": g("resampler.ln_post.bias"),
            "in_proj_w": g("resampler.attn.in_proj_weight"),
            "in_proj_b": g("resampler.attn.in_proj_bias"),
            "out_w": g("resampler.attn.out_proj.weight", transpose=True),
            "out_b": g("resampler.attn.out_proj.bias"),
            "proj": g("resampler.proj"),
        },
    }


# -------------------------------------------------------------- phi3v
# Reference vllm/model_executor/models/phi3v.py (Phi3HDImageEmbedding,
# adapted from microsoft/Phi-3-vision image_embedding_phi3_v.py): a
# CLIP-L/14-336 tower truncated at layer_idx (-2), per-tile features
# 2x2-merged into 4x channels (the "HD transform"), arranged
# [sub-crops + sub_GN newlines, glb_GN, global + newlines]
# (hd_transform_order='sub_glb'), then a 2-layer GELU projector. The
# reference hardcodes the CLIP-L/14-336 shape; we read overrides from
# the config's img_processor dict so tiny checkpoints test the math.

def phi3v_config_from_hf(hf: dict) -> VisionConfig:
    ip = hf.get("img_processor") or {}
    return VisionConfig(
        hidden_size=ip.get("hidden_size", 1024),
        intermediate_size=ip.get("intermediate_size", 4096),
        num_layers=ip.get("num_hidden_layers", 24),
        num_heads=ip.get("num_attention_heads", 16),
        image_size=ip.get("image_size", 336),
        patch_size=ip.get("patch_size", 14),
        layer_norm_eps=ip.get("layer_norm_eps", 1e-5),
        feature_layer=ip.get("layer_idx", -2),
        select_strategy="default",
    )


def _phi3v_hd_2x2(f: jax.Array, h_crop: int, w_crop: int) -> jax.Array:
    """[N, side*side, C] tile features -> [h_crop*side/2, w_crop*side/2,
    4C] spatial grid (reference reshape_hd_patches_2x2merge)."""
    N, L, C = f.shape
    H = int(round(L ** 0.5))
    f = f.reshape(N, H, H, C).reshape(N, H // 2, 2, H // 2, 2, C)
    f = jnp.transpose(f, (0, 1, 3, 2, 4, 5)).reshape(N, -1, 4 * C)
    f = f.reshape(h_crop, w_crop, H // 2, H // 2, 4 * C)
    f = jnp.transpose(f, (0, 2, 1, 3, 4))
    return f.reshape(h_crop * H // 2, w_crop * H // 2, 4 * C)


def _phi3v_newline(g: jax.Array, sub_gn: jax.Array) -> jax.Array:
    """Append the sub_GN separator per spatial row and flatten
    (reference add_image_newline)."""
    h = g.shape[0]
    nl = jnp.broadcast_to(sub_gn[None, None, :], (h, 1, g.shape[-1]))
    return jnp.concatenate([g, nl], axis=1).reshape(-1, g.shape[-1])


def phi3v_image_embed(params: Dict[str, Any], cfg: VisionConfig,
                      pixel_values: jax.Array, image_size,
                      tile_size: int = 336) -> jax.Array:
    """HD image -> projected embeddings [n_tokens, D_text].

    pixel_values [1 + n_crops, 3, s, s]: tile 0 is the GLOBAL resize,
    tiles 1.. the grid crops (Phi3VImageProcessor layout); image_size
    (padded_h, padded_w) in multiples of tile_size determines the crop
    grid. Order 'sub_glb': [crops+newlines, glb_GN, global+newlines]."""
    n_tiles = pixel_values.shape[0]
    feats = [clip_vision_forward(params["vision"], cfg,
                                 pixel_values[i])[1:]     # drop CLS
             for i in range(n_tiles)]
    feats = jnp.stack(feats)                              # [N, L, C]
    h, w = image_size
    h_crop, w_crop = h // tile_size, w // tile_size
    glb = _phi3v_newline(_phi3v_hd_2x2(feats[:1], 1, 1),
                         params["sub_gn"])
    sub = _phi3v_newline(
        _phi3v_hd_2x2(feats[1:1 + h_crop * w_crop], h_crop, w_crop),
        params["sub_gn"])
    emb = jnp.concatenate([sub, params["glb_gn"][None, :], glb])
    pj = params["projector"]
    y = jax.nn.gelu(emb @ pj["w1"] + pj["b1"], approximate=False)
    return y @ pj["w2"] + pj["b2"]


def phi3v_params_from_hf(t: Dict[str, np.ndarray], cfg: VisionConfig,
                         dtype=jnp.float32) -> Dict[str, Any]:
    """Map phi3v tensor names (model.vision_embed_tokens.img_processor.
    vision_model.* CLIP + glb_GN/sub_GN + img_projection.{0,2}) onto the
    clip_vision_forward layout."""
    ve = "model.vision_embed_tokens."
    vt = ve + "img_processor.vision_model."

    def g(key, transpose=False):
        x = np.asarray(t[key])
        return jnp.asarray(x.T if transpose else x, dtype)

    def stack(fmt, transpose=False):
        xs = [np.asarray(t[fmt.format(i)]) for i in range(cfg.num_layers)]
        return jnp.asarray(
            np.stack([x.T if transpose else x for x in xs]), dtype)

    p = vt + "encoder.layers.{}."
    layers = {
        "ln1": stack(p + "layer_norm1.weight"),
        "ln1_b": stack(p + "layer_norm1.bias"),
        "ln2": stack(p + "layer_norm2.weight"),
        "ln2_b": stack(p + "layer_norm2.bias"),
        "wq": stack(p + "self_attn.q_proj.weight", transpose=True),
        "bq": stack(p + "self_attn.q_proj.bias"),
        "wk": stack(p + "self_attn.k_proj.weight", transpose=True),
        "bk": stack(p + "self_attn.k_proj.bias"),
        "wv": stack(p + "self_attn.v_proj.weight", transpose=True),
        "bv": stack(p + "self_attn.v_proj.bias"),
        "wo": stack(p + "self_attn.out_proj.weight", transpose=True),
        "bo": stack(p + "self_attn.out_proj.bias"),
        "fc1": stack(p + "mlp.fc1.weight", transpose=True),
        "b1": stack(p + "mlp.fc1.bias"),
        "fc2": stack(p + "mlp.fc2.weight", transpose=True),
        "b2": stack(p + "mlp.fc2.bias"),
    }
    conv = np.asarray(t[vt + "embeddings.patch_embedding.weight"])
    D = conv.shape[0]
    return {
        "vision": {
            "layers": layers,
            "patch_embed": jnp.asarray(conv.reshape(D, -1).T, dtype),
            "class_embed": g(vt + "embeddings.class_embedding").reshape(-1),
            "pos_embed": g(vt + "embeddings.position_embedding.weight"),
            "pre_ln": g(vt + "pre_layrnorm.weight"),
            "pre_ln_b": g(vt + "pre_layrnorm.bias"),
        },
        "sub_gn": g(ve + "sub_GN").reshape(-1),
        "glb_gn": g(ve + "glb_GN").reshape(-1),
        "projector": {
            "w1": g(ve + "img_projection.0.weight", transpose=True),
            "b1": g(ve + "img_projection.0.bias"),
            "w2": g(ve + "img_projection.2.weight", transpose=True),
            "b2": g(ve + "img_projection.2.bias"),
        },
    }


# ----------------------------------------------------------- ultravox
# Reference vllm/model_executor/models/ultravox.py: audio mel features ->
# Whisper ENCODER (conv1 s1 + conv2 s2, sliced positional embeddings,
# pre-LN layers, final layernorm - the reference's ModifiedWhisperEncoder)
# -> UltravoxProjector (stack stack_factor frames into the channel axis,
# RMSNorm, linear, FLIPPED SwiGLU, linear, RMSNorm) -> splice at the
# <|audio|> placeholders (audio_token_index) through the same mm_embed
# path as the image towers. This is the AUDIO modality of the zoo.

@dataclasses.dataclass(frozen=True)
class UltravoxAudioCfg:
    d_model: int
    num_layers: int
    num_heads: int
    ffn_dim: int
    num_mel_bins: int
    max_source_positions: int
    stack_factor: int = 8
    projector_act: str = "swiglu"
    text_hidden: int = 0


def ultravox_config_from_hf(hf: dict) -> UltravoxAudioCfg:
    ac = hf["audio_config"]
    return UltravoxAudioCfg(
        d_model=ac["d_model"],
        num_layers=ac["encoder_layers"],
        num_heads=ac["encoder_attention_heads"],
        ffn_dim=ac["encoder_ffn_dim"],
        num_mel_bins=ac["num_mel_bins"],
        max_source_positions=ac["max_source_positions"],
        stack_factor=hf.get("stack_factor", 8),
        projector_act=hf.get("projector_act", "swiglu"),
        text_hidden=hf["text_config"]["hidden_size"],
    )


def _conv1d(x, w, b, stride=1, pad=1):
    """x [C, T], HF Conv1d weight [O, I, k] -> [O, T']."""
    y = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride,), padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"))[0]
    return y + b[:, None]


def whisper_encoder_forward(params: Dict[str, Any], cfg: UltravoxAudioCfg,
                            input_features: jax.Array) -> jax.Array:
    """Mel features [num_mel_bins, T] -> encoded frames [T // 2, d_model]
    (HF WhisperEncoder with the reference's sliced-positions relaxation
    for audio shorter than 30 s)."""
    x = jax.nn.gelu(_conv1d(input_features, params["conv1_w"],
                            params["conv1_b"]), approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["conv2_w"], params["conv2_b"],
                            stride=2), approximate=False)
    x = x.T                                           # [T', d]
    x = x + params["pos_embed"][:x.shape[0]]
    h = cfg.num_heads
    d = cfg.d_model // h

    def layer(x, lw):
        r = x
        y = _ln(x, lw["ln1"], lw["ln1_b"], 1e-5)
        T = y.shape[0]
        # whisper: q/v/out carry biases, k does NOT
        q = (y @ lw["wq"] + lw["bq"]).reshape(T, h, d)
        k = (y @ lw["wk"]).reshape(T, h, d)
        v = (y @ lw["wv"] + lw["bv"]).reshape(T, h, d)
        logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * d ** -0.5
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", probs,
                       v.astype(jnp.float32)).reshape(T, cfg.d_model)
        x = r + (o.astype(y.dtype) @ lw["wo"] + lw["bo"])
        r = x
        y = _ln(x, lw["ln2"], lw["ln2_b"], 1e-5)
        y = jax.nn.gelu(y @ lw["fc1"] + lw["b1"],
                        approximate=False) @ lw["fc2"] + lw["b2"]
        return x + y, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return _ln(x, params["post_ln"], params["post_ln_b"], 1e-5)


def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                               + eps) * w).astype(x.dtype)


def ultravox_audio_embed(params: Dict[str, Any], cfg: UltravoxAudioCfg,
                         input_features: jax.Array) -> jax.Array:
    """Mel [num_mel_bins, T] -> text-space embeddings
    [ceil(T/2/stack_factor), D_text] (reference UltravoxProjector:
    stack -> RMSNorm -> linear -> flipped SwiGLU -> linear -> RMSNorm)."""
    feats = whisper_encoder_forward(params["audio"], cfg, input_features)
    T, C = feats.shape
    sf = cfg.stack_factor
    T_pad = -(-T // sf) * sf
    feats = jnp.pad(feats, ((0, T_pad - T), (0, 0)))
    feats = feats.reshape(T_pad // sf, C * sf)
    pj = params["projector"]
    y = _rms(feats, pj["ln_pre"])
    y = y @ pj["w1"]
    if cfg.projector_act == "swiglu":
        # ultravox trains SwiGLU with FLIPPED halves: silu(b) * a
        a, b = jnp.split(y, 2, axis=-1)
        y = jax.nn.silu(b) * a
    else:
        y = jax.nn.gelu(y, approximate=False)
    y = y @ pj["w2"]
    return _rms(y, pj["ln_post"])


def ultravox_params_from_hf(t: Dict[str, np.ndarray],
                            cfg: UltravoxAudioCfg,
                            dtype=jnp.float32) -> Dict[str, Any]:
    """Map ultravox checkpoint names (audio_tower.* whisper encoder +
    multi_modal_projector.*) to the layout above."""
    at = "audio_tower."
    if not any(k.startswith(at) for k in t):
        at = "model.audio_tower."
    mp = at.replace("audio_tower.", "multi_modal_projector.")
    n = cfg.num_layers

    def g(key, transpose=False):
        x = np.asarray(t[key])
        return jnp.asarray(x.T if transpose else x, dtype)

    def stack(fmt, transpose=False):
        xs = [np.asarray(t[fmt.format(i)]) for i in range(n)]
        return jnp.asarray(
            np.stack([x.T if transpose else x for x in xs]), dtype)

    p = at + "layers.{}."
    layers = {
        "ln1": stack(p + "self_attn_layer_norm.weight"),
        "ln1_b": stack(p + "self_attn_layer_norm.bias"),
        "ln2": stack(p + "final_layer_norm.weight"),
        "ln2_b": stack(p + "final_layer_norm.bias"),
        "wq": stack(p + "self_attn.q_proj.weight", transpose=True),
        "bq": stack(p + "self_attn.q_proj.bias"),
        "wk": stack(p + "self_attn.k_proj.weight", transpose=True),
        "wv": stack(p + "self_attn.v_proj.weight", transpose=True),
        "bv": stack(p + "self_attn.v_proj.bias"),
        "wo": stack(p + "self_attn.out_proj.weight", transpose=True),
        "bo": stack(p + "self_attn.out_proj.bias"),
        "fc1": stack(p + "fc1.weight", transpose=True),
        "b1": stack(p + "fc1.bias"),
        "fc2": stack(p + "fc2.weight", transpose=True),
        "b2": stack(p + "fc2.bias"),
    }
    return {
        "audio": {
            "layers": layers,
            "conv1_w": g(at + "conv1.weight"),
            "conv1_b": g(at + "conv1.bias"),
            "conv2_w": g(at + "conv2.weight"),
            "conv2_b": g(at + "conv2.bias"),
            "pos_embed": g(at + "embed_positions.weight"),
            "post_ln": g(at + "layer_norm.weight"),
            "post_ln_b": g(at + "layer_norm.bias"),
        },
        "projector": {
            "ln_pre": g(mp + "ln_pre.weight"),
            "w1": g(mp + "linear_1.weight", transpose=True),
            "w2": g(mp + "linear_2.weight", transpose=True),
            "ln_post": g(mp + "ln_post.weight"),
        },
    }


# ------------------------------------------------------------ internvl
# Reference vllm/model_executor/models/internvl.py + intern_vit.py:
# InternViT (BEiT-lineage ViT: CLS token + absolute positions, pre-LN
# layers with LAYER-SCALE lambdas, optional full-dim RMS qk-norm, no
# final layernorm when use_mean_pooling) -> drop CLS -> pixel-shuffle
# downsample (0.5 => 4x channel fold) -> LayerNorm+MLP projector into the
# text space. Text tower is stock qwen2/llama; splice is the usual
# mm_embed path.

@dataclasses.dataclass(frozen=True)
class InternVLVisionCfg:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    image_size: int
    patch_size: int
    layer_norm_eps: float = 1e-6
    norm_type: str = "layer_norm"       # "layer_norm" | "rms_norm"
    use_qk_norm: bool = False
    downsample_ratio: float = 0.5
    hidden_act: str = "gelu"


def internvl_config_from_hf(hf: dict) -> InternVLVisionCfg:
    vc = hf["vision_config"]
    img = vc["image_size"]
    pat = vc["patch_size"]
    return InternVLVisionCfg(
        hidden_size=vc["hidden_size"],
        intermediate_size=vc["intermediate_size"],
        num_layers=vc["num_hidden_layers"],
        num_heads=vc["num_attention_heads"],
        image_size=img[0] if isinstance(img, (list, tuple)) else img,
        patch_size=pat[0] if isinstance(pat, (list, tuple)) else pat,
        layer_norm_eps=vc.get("layer_norm_eps", 1e-6),
        norm_type=vc.get("norm_type", "layer_norm"),
        use_qk_norm=vc.get("use_qk_norm", False),
        downsample_ratio=hf.get("downsample_ratio", 0.5),
        hidden_act=vc.get("hidden_act", "gelu"),
    )


def _ivl_norm(x, w, b, eps, norm_type):
    if norm_type == "rms_norm":
        xf = x.astype(jnp.float32)
        return (xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
            * w).astype(x.dtype)
    return _ln(x, w, b, eps)


def internvl_vision_forward(params: Dict[str, Any],
                            cfg: InternVLVisionCfg,
                            pixel_values: jax.Array) -> jax.Array:
    """[3, H, W] -> last hidden states [1 + n_patches, D_v] (HF
    InternVLVisionModel.last_hidden_state with use_mean_pooling=True,
    i.e. NO final layernorm)."""
    D, P = cfg.hidden_size, cfg.patch_size
    C, H, W = pixel_values.shape
    x = pixel_values.reshape(C, H // P, P, W // P, P)
    x = jnp.transpose(x, (1, 3, 0, 2, 4)).reshape(-1, C * P * P)
    x = x @ params["patch_embed"] + params["patch_embed_b"]
    x = jnp.concatenate([params["cls_token"][None, :], x], axis=0)
    if "pos_embed" in params:
        x = x + params["pos_embed"]
    h = cfg.num_heads
    d = D // h
    eps, nt = cfg.layer_norm_eps, cfg.norm_type

    def layer(x, lw):
        r = x
        y = _ivl_norm(x, lw["ln1"], lw.get("ln1_b"), eps, nt)
        T = y.shape[0]
        q = y @ lw["wq"]
        k = y @ lw["wk"]
        v = y @ lw["wv"]
        if "bq" in lw:
            q, k, v = q + lw["bq"], k + lw["bk"], v + lw["bv"]
        if cfg.use_qk_norm:
            # full-dim RMS norm BEFORE the head split (HF q_norm/k_norm)
            q = _ivl_norm(q, lw["q_norm"], None, eps, "rms_norm")
            k = _ivl_norm(k, lw["k_norm"], None, eps, "rms_norm")
        q = q.reshape(T, h, d)
        k = k.reshape(T, h, d)
        v = v.reshape(T, h, d)
        logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * d ** -0.5
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", probs,
                       v.astype(jnp.float32)).reshape(T, D)
        o = o.astype(y.dtype) @ lw["wo"] + lw["bo"]
        x = r + o * lw["lambda1"]                 # layer scale
        r = x
        y = _ivl_norm(x, lw["ln2"], lw.get("ln2_b"), eps, nt)
        y = _act_gelu(y @ lw["fc1"] + lw["b1"],
                      cfg.hidden_act) @ lw["fc2"] + lw["b2"]
        return r + y * lw["lambda2"], None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return x


def _act_gelu(x, name):
    if name == "gelu_pytorch_tanh":
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def internvl_pixel_shuffle(x: jax.Array, sf: float) -> jax.Array:
    """HF InternVLModel.pixel_shuffle on [W, H, C] (batch dropped):
    downsamples the grid by sf and folds 1/sf^2 neighboring features
    into the channel axis."""
    W, H, C = x.shape
    x = x.reshape(W, int(H * sf), int(C / sf))
    x = jnp.transpose(x, (1, 0, 2))
    x = x.reshape(int(H * sf), int(W * sf), int(C / sf ** 2))
    return jnp.transpose(x, (1, 0, 2))


def internvl_image_embed(params: Dict[str, Any], cfg: InternVLVisionCfg,
                         pixel_values: jax.Array) -> jax.Array:
    """Image -> projected embeddings [(side*ds)^2, D_text] (HF
    InternVLModel.get_image_features: tower -> drop CLS -> pixel shuffle
    -> LayerNorm + 2-layer MLP projector)."""
    feats = internvl_vision_forward(params["vision"], cfg,
                                    pixel_values)[1:]       # drop CLS
    side = cfg.image_size // cfg.patch_size
    g = feats.reshape(side, side, -1)
    g = internvl_pixel_shuffle(g, cfg.downsample_ratio)
    g = g.reshape(-1, g.shape[-1])
    pj = params["projector"]
    y = _ln(g, pj["ln"], pj["ln_b"], 1e-5)
    y = jax.nn.gelu(y @ pj["w1"] + pj["b1"], approximate=False)
    return y @ pj["w2"] + pj["b2"]


def internvl_params_from_hf(t: Dict[str, np.ndarray],
                            cfg: InternVLVisionCfg,
                            dtype=jnp.float32) -> Dict[str, Any]:
    """Map HF internvl tensor names (model.vision_tower.* +
    model.multi_modal_projector.*) to the stacked layout above."""
    pre = ("model." if any(k.startswith("model.vision_tower.")
                           for k in t) else "")
    vt = pre + "vision_tower."
    mp = pre + "multi_modal_projector."
    n = cfg.num_layers

    def g(key, transpose=False):
        x = np.asarray(t[key])
        return jnp.asarray(x.T if transpose else x, dtype)

    def stack(fmt, transpose=False):
        xs = [np.asarray(t[fmt.format(i)]) for i in range(n)]
        return jnp.asarray(
            np.stack([x.T if transpose else x for x in xs]), dtype)

    def stack_opt(d, name, fmt, transpose=False):
        if fmt.format(0) in t:
            d[name] = stack(fmt, transpose)

    p = vt + "encoder.layer.{}."
    layers = {
        "ln1": stack(p + "layernorm_before.weight"),
        "ln2": stack(p + "layernorm_after.weight"),
        "wq": stack(p + "attention.q_proj.weight", transpose=True),
        "wk": stack(p + "attention.k_proj.weight", transpose=True),
        "wv": stack(p + "attention.v_proj.weight", transpose=True),
        "wo": stack(p + "attention.projection_layer.weight",
                    transpose=True),
        "bo": stack(p + "attention.projection_layer.bias"),
        "fc1": stack(p + "mlp.fc1.weight", transpose=True),
        "b1": stack(p + "mlp.fc1.bias"),
        "fc2": stack(p + "mlp.fc2.weight", transpose=True),
        "b2": stack(p + "mlp.fc2.bias"),
        "lambda1": stack(p + "lambda_1"),
        "lambda2": stack(p + "lambda_2"),
    }
    stack_opt(layers, "ln1_b", p + "layernorm_before.bias")
    stack_opt(layers, "ln2_b", p + "layernorm_after.bias")
    stack_opt(layers, "bq", p + "attention.q_proj.bias")
    stack_opt(layers, "bk", p + "attention.k_proj.bias")
    stack_opt(layers, "bv", p + "attention.v_proj.bias")
    if cfg.use_qk_norm:
        layers["q_norm"] = stack(p + "attention.q_norm.weight")
        layers["k_norm"] = stack(p + "attention.k_norm.weight")
    conv = np.asarray(
        t[vt + "embeddings.patch_embeddings.projection.weight"])
    D = conv.shape[0]
    vision = {
        "layers": layers,
        "patch_embed": jnp.asarray(conv.reshape(D, -1).T, dtype),
        "patch_embed_b": g(
            vt + "embeddings.patch_embeddings.projection.bias"),
        "cls_token": g(vt + "embeddings.cls_token").reshape(-1),
    }
    if vt + "embeddings.position_embeddings" in t:
        vision["pos_embed"] = g(
            vt + "embeddings.position_embeddings").reshape(-1, D)
    return {
        "vision": vision,
        "projector": {
            "ln": g(mp + "layer_norm.weight"),
            "ln_b": g(mp + "layer_norm.bias"),
            "w1": g(mp + "linear_1.weight", transpose=True),
            "b1": g(mp + "linear_1.bias"),
            "w2": g(mp + "linear_2.weight", transpose=True),
            "b2": g(mp + "linear_2.bias"),
        },
    }


# ----------------------------------------------------------- chameleon
# Reference vllm/model_executor/models/chameleon.py: images enter the
# TEXT vocabulary - a VQ-VAE (Make-a-Scene VQGAN) encoder tokenizes the
# image into discrete codebook indices, which map onto BPE ids via the
# config's vocabulary_map (IMGIMG tokens). No embedding splice at all:
# the prompt's <image> placeholders are REPLACED by real token ids and
# the engine serves plain text from there.

@dataclasses.dataclass(frozen=True)
class ChameleonVQConfig:
    embed_dim: int
    num_embeddings: int
    base_channels: int
    channel_multiplier: tuple
    num_res_blocks: int
    attn_resolutions: tuple
    resolution: int
    latent_channels: int
    in_channels: int = 3


def chameleon_vq_config_from_hf(hf: dict) -> ChameleonVQConfig:
    vq = hf["vq_config"]
    return ChameleonVQConfig(
        embed_dim=vq["embed_dim"],
        num_embeddings=vq["num_embeddings"],
        base_channels=vq["base_channels"],
        channel_multiplier=tuple(vq["channel_multiplier"]),
        num_res_blocks=vq["num_res_blocks"],
        attn_resolutions=tuple(vq.get("attn_resolutions") or ()),
        resolution=vq["resolution"],
        latent_channels=vq["latent_channels"],
        in_channels=vq.get("in_channels", 3),
    )


def _conv2d(x, w, b, stride=1, pad=1):
    """x [C, H, W], HF conv weight [O, I, kh, kw] -> [O, H', W']."""
    y = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)] if isinstance(pad, int) else pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]
    return y + b[:, None, None]


def _gn(x, w, b, groups=32, eps=1e-6):
    """GroupNorm over [C, H, W] (HF GroupNorm(32, C, eps=1e-6))."""
    C, H, W = x.shape
    g = x.reshape(groups, C // groups, H, W).astype(jnp.float32)
    mu = jnp.mean(g, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(g, axis=(1, 2, 3), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return g.reshape(C, H, W) * w[:, None, None] + b[:, None, None]


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _vq_resnet(x, p):
    h = _conv2d(_swish(_gn(x, p["n1_w"], p["n1_b"])),
                p["c1_w"], p["c1_b"])
    h = _conv2d(_swish(_gn(h, p["n2_w"], p["n2_b"])),
                p["c2_w"], p["c2_b"])
    if "nin_w" in p:          # channel change: 1x1 shortcut
        x = _conv2d(x, p["nin_w"], p["nin_b"], pad=0)
    return x + h


def _vq_attn(x, p):
    h = _gn(x, p["n_w"], p["n_b"])
    q = _conv2d(h, p["q_w"], p["q_b"], pad=0)
    k = _conv2d(h, p["k_w"], p["k_b"], pad=0)
    v = _conv2d(h, p["v_w"], p["v_b"], pad=0)
    C, H, W = q.shape
    logits = jnp.einsum("cq,ck->qk", q.reshape(C, H * W),
                        k.reshape(C, H * W)) * C ** -0.5
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("qk,ck->cq", probs, v.reshape(C, H * W))
    o = _conv2d(o.reshape(C, H, W), p["o_w"], p["o_b"], pad=0)
    return x + o


def chameleon_vq_indices(params: Dict[str, Any], cfg: ChameleonVQConfig,
                         pixel_values: jax.Array) -> jax.Array:
    """[3, res, res] -> flat codebook indices [latent_h * latent_w] i32
    (HF ChameleonVQVAE.encode: encoder -> quant_conv -> nearest-codebook
    quantizer)."""
    h = _conv2d(pixel_values, params["conv_in_w"], params["conv_in_b"])
    for level in params["down"]:
        for blk in level["blocks"]:
            h = _vq_resnet(h, blk["res"])
            if "attn" in blk:
                h = _vq_attn(h, blk["attn"])
        if "down_w" in level:
            # asymmetric (0,1,0,1) pad + stride-2 conv (HF ConvDownsample)
            h = jax.lax.conv_general_dilated(
                h[None].astype(jnp.float32),
                level["down_w"].astype(jnp.float32),
                window_strides=(2, 2), padding=[(0, 1), (0, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))[0] \
                + level["down_b"][:, None, None]
    h = _vq_resnet(h, params["mid_b1"])
    h = _vq_attn(h, params["mid_attn"])
    h = _vq_resnet(h, params["mid_b2"])
    h = _conv2d(_swish(_gn(h, params["out_n_w"], params["out_n_b"])),
                params["conv_out_w"], params["conv_out_b"])
    h = _conv2d(h, params["quant_w"], params["quant_b"], pad=0)
    C, H, W = h.shape
    z = h.transpose(1, 2, 0).reshape(-1, C)          # [hw, embed_dim]
    e = params["codebook"].astype(jnp.float32)       # [n_emb, embed_dim]
    d2 = (jnp.sum(z * z, axis=1, keepdims=True)
          + jnp.sum(e * e, axis=1)[None] - 2.0 * z @ e.T)
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def chameleon_img2bpe(vocabulary_map: Dict[str, int]) -> np.ndarray:
    """VQ codebook index -> BPE token id lookup table (HF
    ChameleonImageVocabularyMapping: IMGIMG names encode the index with
    A-J digit characters, last char dropped)."""
    chr_map = {chr(ord("A") + i): str(i) for i in range(10)}
    pairs = {}
    for name, tok in vocabulary_map.items():
        if name.startswith("IMGIMG"):
            idx = int("".join(chr_map.get(c, c) for c in name[6:-1]))
            pairs[idx] = tok
    # unmapped codebook indices are -1 so a quantizer output missing from
    # vocabulary_map fails loudly instead of splicing token id 0
    table = np.full(max(pairs) + 1, -1, np.int32)
    for idx, tok in pairs.items():
        table[idx] = tok
    return table


def chameleon_image_tokens(params, cfg: ChameleonVQConfig,
                           img2bpe: np.ndarray,
                           pixel_values: jax.Array) -> np.ndarray:
    """[3, res, res] image -> BPE token ids (the text ids the engine
    serves; reference chameleon.py input mapper + model.get_image_tokens)."""
    idx = np.asarray(chameleon_vq_indices(params, cfg, pixel_values))
    toks = img2bpe[idx]
    if (toks < 0).any():
        bad = np.unique(idx[toks < 0])[:8]
        raise ValueError(
            f"chameleon VQ indices {bad.tolist()} missing from "
            "vocabulary_map (img2bpe table has no BPE id for them)")
    return toks


def chameleon_vq_params_from_hf(t: Dict[str, np.ndarray],
                                cfg: ChameleonVQConfig,
                                dtype=jnp.float32) -> Dict[str, Any]:
    """Map HF chameleon vqmodel tensor names (model.vqmodel.encoder.* +
    quant_conv + quantize.embedding) to the pytree above."""
    pre = ("model.vqmodel." if any(k.startswith("model.vqmodel.")
                                   for k in t) else "vqmodel.")

    def g(key):
        return jnp.asarray(t[pre + key], dtype)

    def resnet(px):
        p = {
            "n1_w": g(px + "norm1.weight"), "n1_b": g(px + "norm1.bias"),
            "c1_w": g(px + "conv1.weight"), "c1_b": g(px + "conv1.bias"),
            "n2_w": g(px + "norm2.weight"), "n2_b": g(px + "norm2.bias"),
            "c2_w": g(px + "conv2.weight"), "c2_b": g(px + "conv2.bias"),
        }
        if pre + px + "nin_shortcut.weight" in t:
            p["nin_w"] = g(px + "nin_shortcut.weight")
            p["nin_b"] = g(px + "nin_shortcut.bias")
        return p

    def attn(px):
        return {
            "n_w": g(px + "norm.weight"), "n_b": g(px + "norm.bias"),
            "q_w": g(px + "q.weight"), "q_b": g(px + "q.bias"),
            "k_w": g(px + "k.weight"), "k_b": g(px + "k.bias"),
            "v_w": g(px + "v.weight"), "v_b": g(px + "v.bias"),
            "o_w": g(px + "proj_out.weight"),
            "o_b": g(px + "proj_out.bias"),
        }

    down = []
    curr_res = cfg.resolution
    n_levels = len(cfg.channel_multiplier)
    for lvl in range(n_levels):
        blocks = []
        for b in range(cfg.num_res_blocks):
            blk = {"res": resnet(f"encoder.down.{lvl}.block.{b}.")}
            if curr_res in cfg.attn_resolutions:
                blk["attn"] = attn(f"encoder.down.{lvl}.attn.{b}.")
            blocks.append(blk)
        level = {"blocks": blocks}
        if lvl != n_levels - 1:
            level["down_w"] = g(f"encoder.down.{lvl}.downsample.conv.weight")
            level["down_b"] = g(f"encoder.down.{lvl}.downsample.conv.bias")
            curr_res //= 2
        down.append(level)
    return {
        "conv_in_w": g("encoder.conv_in.weight"),
        "conv_in_b": g("encoder.conv_in.bias"),
        "down": down,
        "mid_b1": resnet("encoder.mid.block_1."),
        "mid_attn": attn("encoder.mid.attn_1."),
        "mid_b2": resnet("encoder.mid.block_2."),
        "out_n_w": g("encoder.norm_out.weight"),
        "out_n_b": g("encoder.norm_out.bias"),
        "conv_out_w": g("encoder.conv_out.weight"),
        "conv_out_b": g("encoder.conv_out.bias"),
        "quant_w": g("quant_conv.weight"),
        "quant_b": g("quant_conv.bias"),
        "codebook": g("quantize.embedding.weight"),
    }


# ----------------------------------------------------------------- loading
def params_from_hf(t: Dict[str, np.ndarray], cfg: VisionConfig,
                   dtype=jnp.float32) -> Dict[str, Any]:
    """Map HF llava tensor names (vision_tower.vision_model.* +
    multi_modal_projector.*; transformers >= 4.52 prefixes both with
    "model.") to the stacked-layer layout above."""
    pre = "model." if any(k.startswith("model.vision_tower.")
                          for k in t) else ""
    vt = pre + "vision_tower.vision_model."
    mp = pre + "multi_modal_projector."

    def g(key):
        return jnp.asarray(t[key], dtype)

    def stack(fmt, transpose=False):
        xs = [np.asarray(t[fmt.format(i)]) for i in range(cfg.num_layers)]
        xs = np.stack([x.T if transpose else x for x in xs])
        return jnp.asarray(xs, dtype)

    p = vt + "encoder.layers.{}."
    layers = {
        "ln1": stack(p + "layer_norm1.weight"),
        "ln1_b": stack(p + "layer_norm1.bias"),
        "ln2": stack(p + "layer_norm2.weight"),
        "ln2_b": stack(p + "layer_norm2.bias"),
        "wq": stack(p + "self_attn.q_proj.weight", transpose=True),
        "bq": stack(p + "self_attn.q_proj.bias"),
        "wk": stack(p + "self_attn.k_proj.weight", transpose=True),
        "bk": stack(p + "self_attn.k_proj.bias"),
        "wv": stack(p + "self_attn.v_proj.weight", transpose=True),
        "bv": stack(p + "self_attn.v_proj.bias"),
        "wo": stack(p + "self_attn.out_proj.weight", transpose=True),
        "bo": stack(p + "self_attn.out_proj.bias"),
        "fc1": stack(p + "mlp.fc1.weight", transpose=True),
        "b1": stack(p + "mlp.fc1.bias"),
        "fc2": stack(p + "mlp.fc2.weight", transpose=True),
        "b2": stack(p + "mlp.fc2.bias"),
    }
    # HF stores the patch conv as [D, 3, P, P]; our unfold layout wants
    # [3*P*P, D] with (C, ph, pw) flattening to match the transpose above
    conv = np.asarray(t[vt + "embeddings.patch_embedding.weight"])
    D = conv.shape[0]
    patch_w = conv.reshape(D, -1).T
    return {
        "vision": {
            "layers": layers,
            "patch_embed": jnp.asarray(patch_w, dtype),
            "class_embed": g(vt + "embeddings.class_embedding"),
            "pos_embed": g(vt + "embeddings.position_embedding.weight"),
            "pre_ln": g(vt + "pre_layrnorm.weight"),
            "pre_ln_b": g(vt + "pre_layrnorm.bias"),
        },
        "projector": {
            "w1": jnp.asarray(
                np.asarray(t[mp + "linear_1.weight"]).T, dtype),
            "b1": g(mp + "linear_1.bias"),
            "w2": jnp.asarray(
                np.asarray(t[mp + "linear_2.weight"]).T, dtype),
            "b2": g(mp + "linear_2.bias"),
        },
        # llava-next: the learned row-separator embedding appended per
        # spatial row in the AnyRes merge (absent in base llava)
        **({"image_newline": g(pre + "image_newline")}
           if (pre + "image_newline") in t else {}),
    }
