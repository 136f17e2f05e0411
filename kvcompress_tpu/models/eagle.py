"""EAGLE speculative draft head.

The role of reference vllm/model_executor/models/eagle.py (+ the EAGLE
rows of spec_decode/): a 1-layer llama-style draft whose layer-0 input is
`fc([token_embedding ; target_hidden_state])` - the draft extrapolates the
TARGET's feature stream, which is what makes its acceptance rate beat a
plain small draft. Serving integration here differs from the reference's
separate proposer worker: the draft runs over the same ring KV cache as
draft-model speculation (engine/programs.py _build_draft_round), the
verify program exports its per-position hidden states on DEVICE, and the
next round's draft consumes them with zero extra host transfers.

Hidden pairing (eagle.py forward): the fc input for predicting the token
after t is (embed(t), target_hidden_at_t's_position). Ring warm-up has no
target hiddens for prompt positions, so the warm pass feeds zeros - a
quality (acceptance) cost on the first rounds only; verification makes
proposal quality a speed knob, never a correctness one.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from kvcompress_tpu.config import ModelConfig


def load_eagle(path: str, target_cfg: ModelConfig, target_params,
               dtype=jnp.float32) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Load an EAGLE checkpoint directory. EAGLE checkpoints carry fc +
    llama decoder layers (no lm_head; often no embedding - both are the
    target's, eagle.py:60-74). Config may nest the llama fields under
    "model" (vllm EAGLEConfig)."""
    from kvcompress_tpu.models.registry import (_load_llama_style,
                                                config_from_hf)
    from kvcompress_tpu.models.weights import _read_all_tensors

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    inner = hf.get("model") if isinstance(hf.get("model"), dict) else hf
    tv = hf.get("truncated_vocab_size")
    if tv and tv != inner.get("vocab_size", tv):
        raise ValueError("EAGLE truncated_vocab_size is not supported")
    inner = dict(inner)
    inner.setdefault("architectures", ["LlamaForCausalLM"])
    dcfg = config_from_hf(inner, model_name=path)
    dcfg.architecture = "EAGLEModel"
    dcfg.eagle = True

    t = _read_all_tensors(path)
    # normalize names to the model.layers.* form _load_llama_style reads
    ren: Dict[str, np.ndarray] = {}
    for k, v in t.items():
        k2 = k.removeprefix("model.")
        if k2.startswith(("layers.", "embed_tokens.", "norm.")):
            ren["model." + k2] = v
        else:
            ren[k2] = v
    fc_w = ren.pop("fc.weight")
    fc_b = ren.pop("fc.bias", None)
    D = dcfg.hidden_size
    if "model.embed_tokens.weight" not in ren:
        ren["model.embed_tokens.weight"] = np.asarray(
            target_params["embed"], np.float32)
    if "model.norm.weight" not in ren:
        ren["model.norm.weight"] = np.ones((D,), np.float32)
    if "lm_head.weight" not in ren:
        # share the target's head (eagle.py: lm_head = target lm_head)
        dcfg.tie_word_embeddings = False
        ren["lm_head.weight"] = np.asarray(
            target_params.get("lm_head", target_params["embed"]),
            np.float32)
    params = _load_llama_style(ren, dcfg, dtype)
    params["fc_w"] = jnp.asarray(np.asarray(fc_w).T, dtype)  # [2D, D]
    if fc_b is not None:
        params["fc_b"] = jnp.asarray(fc_b, dtype)
    return dcfg, params


def init_eagle_params(target_cfg: ModelConfig, target_params,
                      num_layers: int = 1, seed: int = 0,
                      dtype=jnp.float32, fc_mode: str = "embed",
                      ) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Test/bench constructor. fc_mode:
    - "embed": fc = [I; 0] (pass the token embedding through, ignore the
      hidden) with the TARGET's own layers - the draft then computes
      exactly the target distribution, so acceptance is ~100% and the
      eagle plumbing is exercised end-to-end with a known answer.
    - "mix": fc = [I/2 ; I/2] (hidden stream genuinely used)."""
    import dataclasses
    D = target_cfg.hidden_size
    # no position-0 masking: this draft is constructed to equal the
    # TARGET, which does not zero its position-0 input
    dcfg = dataclasses.replace(target_cfg, eagle=True,
                               eagle_mask_pos0=False,
                               architecture="EAGLEModel")
    params = dict(target_params)
    eye = np.eye(D, dtype=np.float32)
    zero = np.zeros((D, D), np.float32)
    if fc_mode == "embed":
        fc = np.concatenate([eye, zero], axis=0)
    elif fc_mode == "mix":
        fc = np.concatenate([eye * 0.5, eye * 0.5], axis=0)
    else:
        raise ValueError(fc_mode)
    params["fc_w"] = jnp.asarray(fc, dtype)
    return dcfg, params


def fc_embed(dparams, x, hidden, positions=None):
    """The EAGLE layer-0 input transform: fc([embed ; target hidden]).

    When positions is given, the output is zeroed where positions == 0,
    matching the reference draft's training-time behavior (reference
    vllm/model_executor/models/eagle.py:91 `inputs_embeds[positions == 0]
    = 0`) — there is no "previous target hidden" for the first token, and
    checkpoints are trained with that input masked."""
    cat = jnp.concatenate([x, hidden.astype(x.dtype)], axis=-1)
    y = cat @ dparams["fc_w"].astype(x.dtype)
    if "fc_b" in dparams:
        y = y + dparams["fc_b"].astype(x.dtype)
    if positions is not None:
        y = jnp.where((positions == 0)[..., None], jnp.zeros_like(y), y)
    return y
