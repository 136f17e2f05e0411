"""Speculative proposer heads: Medusa and MLP-speculator.

Re-design of the reference's proposer workers
(vllm/spec_decode/medusa_worker.py, mlp_speculator_worker.py; models at
vllm/model_executor/models/medusa.py and mlp_speculator.py). The reference
runs the proposer as a separate model pass between scheduler steps; here
the proposal is FUSED into the verification program
(engine/programs.py:_build_verify): the verify pass already produces the
target's hidden state at the accepted position, so the heads run on it in
the same XLA program and the proposals for the NEXT round ride back to the
host in the packed result that is fetched anyway. Zero extra dispatches,
zero extra fetches per speculative round.

Both proposers are greedy/top-1 (matching this engine's greedy-only
speculative decoding; the reference Medusa notes it only supports top-1
proposals too, medusa.py:37-38).

Head semantics (behavioral parity, independently implemented):
- Medusa (medusa.py:17-85): head k is a stack of residual blocks
  x <- x + silu(W x) on the target hidden state followed by a per-head
  lm head; head k proposes the token at offset k+2 from the verified
  position (the bonus token is offset +1).
- MLP speculator (mlp_speculator.py:57-188): a recurrent chain over
  heads; each step embeds the previously proposed token, projects the
  carried state, sums with the paper's state/emb weighting, applies a
  scale-and-shift RMS norm and GELU, then a per-head lm head. With
  tie_weights the same tensors are reused for heads >= 1.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ProposerSpec:
    """Static (trace-time) proposer description. Params travel separately
    as a pytree so the verify program can be jitted once per (kind, Q)."""
    kind: str                      # "medusa" | "mlp_speculator"
    n_predict: int                 # heads available in the checkpoint
    scale_input: bool = False      # mlp_speculator ln0 on the target hidden
    emb_alpha: float = 1.0         # mlp_speculator emb_weight/state_weight


def _rms(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)).astype(x.dtype)


def medusa_propose(params: Dict[str, Any], hidden: jax.Array,
                   gamma: int) -> jax.Array:
    """[S, D] accepted-position hidden -> [S, gamma] proposed token ids.

    params: blocks [K, R, D, D] (R stacked residual-block weights per
    head), lm [K, D, V]."""
    blocks, lm = params["blocks"], params["lm"]
    K, R = blocks.shape[0], blocks.shape[1]
    assert gamma <= K, (gamma, K)
    props = []
    hf = hidden.astype(jnp.float32)
    for k in range(gamma):
        x = hf
        for r in range(R):
            x = x + jax.nn.silu(x @ blocks[k, r].astype(jnp.float32))
        logits = x @ lm[k].astype(jnp.float32)
        props.append(jnp.argmax(logits, axis=-1).astype(jnp.int32))
    return jnp.stack(props, axis=1)


def mlp_spec_propose(spec: ProposerSpec, params: Dict[str, Any],
                     hidden: jax.Array, last_token: jax.Array,
                     gamma: int) -> jax.Array:
    """[S, D] hidden + [S] bonus token -> [S, gamma] proposals.

    params (lists of per-head arrays; tied checkpoints repeat the same
    array): emb [V, I], proj [D|I, I], head [I, V], ln_w/ln_b [I]."""
    assert gamma <= spec.n_predict, (gamma, spec.n_predict)
    state = hidden.astype(jnp.float32)
    if spec.scale_input:
        state = _rms(state) / math.sqrt(2.0)
    tok = last_token
    props = []
    for k in range(gamma):
        z = params["emb"][k].astype(jnp.float32)[tok]          # [S, I]
        state = state @ params["proj"][k].astype(jnp.float32)  # [S, I]
        state = state + z * spec.emb_alpha
        state = (_rms(state) * params["ln_w"][k].astype(jnp.float32)
                 + params["ln_b"][k].astype(jnp.float32))
        state = jax.nn.gelu(state, approximate=False)
        logits = state @ params["head"][k].astype(jnp.float32)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        props.append(tok)
    return jnp.stack(props, axis=1)


def propose(spec: ProposerSpec, params: Dict[str, Any], hidden: jax.Array,
            last_token: jax.Array, gamma: int) -> jax.Array:
    if spec.kind == "medusa":
        return medusa_propose(params, hidden, gamma)
    if spec.kind == "mlp_speculator":
        return mlp_spec_propose(spec, params, hidden, last_token, gamma)
    raise ValueError(f"unknown proposer kind {spec.kind}")


# ---------------------------------------------------------------------------
# Checkpoint loading / test init
# ---------------------------------------------------------------------------


def _mlp_spec_from_cfg(hf: dict) -> ProposerSpec:
    n_predict = int(hf.get("n_predict", hf.get("num_lookahead_tokens", 1)))
    inner = int(hf.get("inner_dim") or 0) or int(hf["emb_dim"])
    sw = 0.5 ** (0.5 / n_predict)
    ew = math.sqrt((1 - sw * sw) * (inner / 2))
    return ProposerSpec(kind="mlp_speculator", n_predict=n_predict,
                        scale_input=bool(hf.get("scale_input", False)),
                        emb_alpha=ew / sw)


def load_proposer(path: str, dtype=jnp.float32
                  ) -> Tuple[ProposerSpec, Dict[str, Any]]:
    """Load a Medusa or MLP-speculator head checkpoint from an HF-style
    directory (config.json + safetensors). Torch-free, mirroring
    models/weights.py."""
    from kvcompress_tpu.models.weights import _read_all_tensors

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    arch = (hf.get("architectures") or [hf.get("model_type", "")])[0]
    t = _read_all_tensors(path)
    t = {k.removeprefix("speculator."): v for k, v in t.items()}

    if "medusa" in arch.lower() or "medusa" in str(
            hf.get("model_type", "")).lower():
        K = int(hf["num_heads"])
        R = int(hf.get("num_hidden_layers", 1))
        blocks = np.stack([
            np.stack([
                np.asarray(t[f"blocks.{k}.layers.{r}.weight"]).T
                for r in range(R)]) for k in range(K)])
        lm = np.stack([
            np.asarray(t[f"lm_heads.{k}.weight"]).T for k in range(K)])
        spec = ProposerSpec(kind="medusa", n_predict=K)
        params = {"blocks": jnp.asarray(blocks, dtype),
                  "lm": jnp.asarray(lm, dtype)}
        return spec, params

    if ("mlpspeculator" in arch.lower().replace("_", "")
            or hf.get("model_type") == "mlp_speculator"):
        spec = _mlp_spec_from_cfg(hf)
        K = spec.n_predict
        tie = bool(hf.get("tie_weights", False))

        def per_head(fmt, transpose=False, proj=False):
            """With tie_weights the reference reuses one emb/head/ln module
            for every head, while proj ties from head 1 on (head 0's input
            projection maps emb_dim -> inner_dim and stays separate),
            mlp_speculator.py:84-106."""
            cache: Dict[int, Any] = {}
            out = []
            for k in range(K):
                kk = (min(k, 1) if proj else 0) if tie else k
                if kk not in cache:
                    w = np.asarray(t[fmt.format(kk)])
                    cache[kk] = jnp.asarray(w.T if transpose else w, dtype)
                out.append(cache[kk])
            return out

        params = {
            "emb": per_head("emb.{}.weight"),
            "proj": per_head("proj.{}.weight", transpose=True, proj=True),
            "head": per_head("head.{}.weight", transpose=True),
            "ln_w": per_head("ln.{}.weight"),
            "ln_b": per_head("ln.{}.bias"),
        }
        return spec, params

    raise ValueError(
        f"not a recognised proposer checkpoint: architectures={arch!r} "
        f"(expected Medusa or MLPSpeculator)")


def init_medusa_params(hidden_size: int, vocab_size: int, num_heads: int,
                       num_layers: int = 1, seed: int = 0,
                       dtype=jnp.float32) -> Tuple[ProposerSpec, Dict]:
    rng = np.random.default_rng(seed)
    s = 0.02
    params = {
        "blocks": jnp.asarray(rng.standard_normal(
            (num_heads, num_layers, hidden_size, hidden_size)) * s, dtype),
        "lm": jnp.asarray(rng.standard_normal(
            (num_heads, hidden_size, vocab_size)) * s, dtype),
    }
    return ProposerSpec(kind="medusa", n_predict=num_heads), params


def init_mlp_spec_params(emb_dim: int, inner_dim: int, vocab_size: int,
                         n_predict: int, scale_input: bool = False,
                         seed: int = 0, dtype=jnp.float32
                         ) -> Tuple[ProposerSpec, Dict]:
    rng = np.random.default_rng(seed)
    s = 0.02
    spec = _mlp_spec_from_cfg({"n_predict": n_predict, "emb_dim": emb_dim,
                               "inner_dim": inner_dim,
                               "scale_input": scale_input})
    params = {
        "emb": [jnp.asarray(rng.standard_normal(
            (vocab_size, inner_dim)) * s, dtype) for _ in range(n_predict)],
        "proj": [jnp.asarray(rng.standard_normal(
            (emb_dim if k == 0 else inner_dim, inner_dim)) * s, dtype)
            for k in range(n_predict)],
        "head": [jnp.asarray(rng.standard_normal(
            (inner_dim, vocab_size)) * s, dtype) for _ in range(n_predict)],
        "ln_w": [jnp.ones((inner_dim,), dtype) for _ in range(n_predict)],
        "ln_b": [jnp.zeros((inner_dim,), dtype) for _ in range(n_predict)],
    }
    return spec, params
