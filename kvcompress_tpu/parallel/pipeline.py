"""Pipeline parallelism: a GPipe schedule inside one jitted SPMD program.

The reference implements PP with per-stage worker processes, NCCL
send/recv between pipeline ranks and one "virtual engine" per in-flight
microbatch (vllm/distributed/parallel_state.py:798-807 get_pp_group,
vllm/worker/worker.py + engine/llm_engine.py virtual-engine plumbing).
None of that process machinery exists here - the TPU-native formulation is
a MESH AXIS: layer-stacked parameters (already [L, ...] for the lax.scan
decoder trunk, models/decoder.py:620-643) shard their layer axis over a
"pipe" axis, and ONE shard_map program runs the classic GPipe software
pipeline: at tick t, stage p runs its local layer block on microbatch
t - p and hands the activations to stage p+1 with a single ppermute hop
over ICI. No host round-trips, no send/recv plumbing, no virtual engines -
the whole schedule (fill, steady state, drain) is `lax.scan` over
M + P - 1 ticks.

Composition with tensor parallelism: the mesh is ("pipe", "model"); only
"pipe" is manual inside the shard_map, "model" stays an auto (GSPMD) axis
so the megatron shardings of parallel/mesh.py apply unchanged WITHIN each
stage - XLA inserts the usual TP collectives per layer, and the ppermute
rides the pipe axis.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kvcompress_tpu.config import ModelConfig

PIPE_AXIS = "pipe"
MODEL_AXIS = "model"


def build_pp_mesh(pp_size: int, tp_size: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = pp_size * tp_size
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(pp_size, tp_size)
    return Mesh(arr, (PIPE_AXIS, MODEL_AXIS))


def stage_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs placing each layer-stacked leaf's leading [L] axis on
    the pipe axis; embedding / final norm / lm_head replicate (stage 0 and
    stage P-1 use them; for very large vocabularies shard them over
    "model" via parallel/mesh.py on top of this)."""
    layers = {k: P(PIPE_AXIS) for k in params["layers"]}
    top = {k: P() for k in params if k != "layers"}
    top["layers"] = layers
    return top


def shard_params_pp(params, mesh: Mesh):
    specs = stage_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def pipeline_forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_mb: jax.Array,      # [M, Tm] i32 microbatched tokens
    pos_mb: jax.Array,        # [M, Tm] i32 positions
    mesh: Mesh,
    attn_fn=None,             # (layer_xs, q, k, v, cache)->(out, cache);
                              # default full causal attention
    layer_xs: Any = None,     # pytree with leading [L] per-layer inputs
) -> jax.Array:
    """GPipe forward: returns final hidden states [M, Tm, D].

    Tick t, stage p processes microbatch t - p; M + P - 1 ticks drain the
    pipe. Bubble fraction = (P-1)/(M+P-1): callers pick M >= ~4P for
    steady-state efficiency. Output hidden states are psum-broadcast from
    the last stage so every device returns the full [M, Tm, D]."""
    from kvcompress_tpu.models import decoder as D

    Pp = mesh.shape[PIPE_AXIS]
    L = cfg.num_layers
    assert L % Pp == 0, f"num_layers={L} not divisible by pp={Pp}"
    M, Tm = token_mb.shape
    if attn_fn is None:
        attn_fn = _causal_attn
    if layer_xs is None:
        layer_xs = jnp.zeros((L, 1), jnp.int32)

    def stage_fn(local_layers, local_xs, top, tokens, positions):
        p = jax.lax.axis_index(PIPE_AXIS)
        pparams = dict(top)
        pparams["layers"] = local_layers
        D_ = cfg.hidden_size

        def tick(carry, t):
            h_prev, outs = carry
            mb = t - p
            valid = (mb >= 0) & (mb < M)
            mbc = jnp.clip(mb, 0, M - 1)
            tok = tokens[mbc]
            pos = positions[mbc]
            # stage 0 embeds; later stages consume the ppermuted hidden
            x0 = D._embed(pparams, cfg, tok, pos)
            x = jnp.where(p == 0, x0, h_prev).astype(x0.dtype)
            cos, sin = D.precompute_rope(cfg, pos)
            step = D._layer_step_fn(cfg, Tm, cos, sin, attn_fn,
                                    collect=False)
            (y, _), _ = jax.lax.scan(step, (x, None),
                                     (local_layers, local_xs))
            # last stage: final norm, record the finished microbatch
            fin = D._norm(y, pparams["final_norm"],
                          pparams.get("final_norm_b"), cfg)
            rec = jnp.where(valid & (p == Pp - 1), 1.0, 0.0)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, rec * fin + (1 - rec) * outs[mbc], mbc, 0)
            # hand activations to the next stage over ICI
            h_next = jax.lax.ppermute(
                y, PIPE_AXIS, [(i, i + 1) for i in range(Pp - 1)])
            return (h_next, outs), None

        h0 = jnp.zeros((Tm, D_), top["embed"].dtype)
        outs0 = jnp.zeros((M, Tm, D_), jnp.float32)
        (_, outs), _ = jax.lax.scan(tick, (h0, outs0),
                                    jnp.arange(M + Pp - 1))
        # broadcast the last stage's outputs to every pipe rank
        outs = jax.lax.psum(
            jnp.where(p == Pp - 1, outs, jnp.zeros_like(outs)), PIPE_AXIS)
        return outs

    top = {k: v for k, v in params.items() if k != "layers"}
    shard = jax.shard_map(
        stage_fn, mesh=mesh, axis_names={PIPE_AXIS},
        in_specs=(P(PIPE_AXIS), P(PIPE_AXIS), P(), P(), P()),
        out_specs=P(), check_vma=False)
    return shard(params["layers"], layer_xs, top, token_mb, pos_mb)


def _causal_attn(_, q, k, v, cache):
    """Full causal attention with GQA head repetition (parity oracle for
    tests; the serving engine passes its own cache-aware attn_fn)."""
    T, H, d = q.shape
    k = jnp.repeat(k, H // k.shape[1], axis=1)
    v = jnp.repeat(v, H // v.shape[1], axis=1)
    logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * d ** -0.5
    mask = jnp.tril(jnp.ones((T, T), bool))
    logits = jnp.where(mask[None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype), cache
