"""Mesh construction and sharding specs.

Replaces the reference's process-group machinery
(vllm/distributed/parallel_state.py:72-979, device_communicators/) with the
jax SPMD model: one program, a ("data", "model") Mesh, NamedSharding
annotations, and XLA-inserted collectives over ICI/DCN.

Sharding layout (SURVEY.md section 2.7):
- weights: megatron-style tensor parallel - qkv/gate/up column-sharded,
  o/down row-sharded, vocab-sharded embeddings; all over the "model" axis.
- KV cache + metrics + positions: the physical block pool is partitioned on
  the block axis across "model" shards; block tables / context lens shard on
  the kv-head axis. KV-Compress is embarrassingly parallel per kv head (per
  head block tables AND per-head eviction counts), so compression runs
  shard-local except the per-sequence block-budget selection, which is a
  small cross-shard reduction the compiler lowers to one all-gather of block
  metrics.
- batch (decode) shards over "data".
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kvcompress_tpu.core.state import CacheState

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def build_mesh(tp_size: int, dp_size: int = 1,
               devices=None, pp_size: int = 1) -> Mesh:
    """("data", "pipe", "model") mesh. The pipe axis is present only when
    pp_size > 1 (serving pipeline parallelism, parallel/pipeline.py);
    existing two-axis callers are unaffected."""
    devices = devices if devices is not None else jax.devices()
    n = tp_size * dp_size * pp_size
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    if pp_size > 1:
        arr = np.asarray(devices[:n]).reshape(dp_size, pp_size, tp_size)
        return Mesh(arr, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))
    arr = np.asarray(devices[:n]).reshape(dp_size, tp_size)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def param_specs(params: Dict[str, Any], pp: bool = False,
                ep: bool = False) -> Dict[str, Any]:
    """PartitionSpec pytree matching the models/decoder.py param layout:
    megatron TP - column-sharded up-projections (+ their biases),
    row-sharded down-projections, vocab-sharded embeddings, replicated
    norms; MoE experts shard on the intermediate axis (TP style, matching
    the reference's fused_moe) or, with ep=True, on the EXPERT axis
    (expert parallelism: each shard holds E/tp whole experts; the dense
    dispatch partitions via GSPMD, the grouped dispatch via
    decoder._moe_grouped_experts_ep)."""
    m = MODEL_AXIS
    # [L, in, out] column-parallel (shard out) and their [L, out] biases
    col_w = {"wq", "wk", "wv", "w_gate", "w_up", "w_fc1", "shared_gate",
             "shared_up"}
    col_b = {"bq", "bk", "bv", "b_gate", "b_up", "b_fc1"}
    # [L, in, out] row-parallel (shard in); output bias replicated
    row_w = {"wo", "w_down", "w_fc2", "shared_down"}

    def layer_spec(k, v):
        base = k
        if k.endswith("_q8"):
            base = k[:-3]
        elif k.endswith("_q4"):
            base = k[:-3]
        elif k.endswith(("_scale4", "_zero4")):
            # int4 group scales/zeros [L, in/g, out] mirror their weight's
            # sharded axis: out for column-parallel, the (grouped) in axis
            # for row-parallel
            base = k[:-7] if k.endswith("_scale4") else k[:-6]
            if base in col_w:
                return P(None, None, m)
            if base in row_w:
                return P(None, m, None)
            return P(*([None] * v.ndim))
        elif k.endswith("_scale"):
            # scales follow the output axis of their weight: sharded for
            # column-parallel targets, replicated for row-parallel
            base = k[:-6]
            if ep and base.startswith("experts_"):
                return P(None, m, *([None] * (v.ndim - 2)))
            if base in col_w:
                return P(*([None] * (v.ndim - 1) + [m]))
            return P(*([None] * v.ndim))
        k = base
        if k in col_w:
            return P(None, None, m)
        if k in col_b:
            return P(None, m)
        if k in row_w:
            return P(None, m, None)
        if k in ("experts_gate", "experts_up", "experts_down"):
            if ep:  # [L, E, in, out]: whole experts per shard
                return P(None, m, None, None)
            if k == "experts_down":
                return P(None, None, m, None)
            return P(None, None, None, m)
        # norms, router, shared_router, bo/b_fc2/b_down: replicated
        return P(*([None] * v.ndim))

    def with_pipe(spec: P) -> P:
        # layer-stacked leaves: the leading [L] axis shards over the pipe
        # stages (GPipe serving, parallel/pipeline.py)
        return P(*((PIPE_AXIS,) + tuple(spec)[1:])) if pp else spec

    specs = {
        "layers": {k: with_pipe(layer_spec(k, v))
                   for k, v in params["layers"].items()},
    }
    vocab_sharded = {"embed", "embed_q8", "embed_scale", "lm_head",
                     "lm_head_q8", "lm_head_scale"}
    for k, v in params.items():
        if k == "layers":
            continue
        if k in vocab_sharded:
            specs[k] = P(*([m] + [None] * (v.ndim - 1)))
        else:  # final_norm(_b), lm_head_b, pos_embed
            specs[k] = P(*([None] * v.ndim))
    return specs


def state_specs(quantized: bool = False, pp: bool = False) -> CacheState:
    """PartitionSpec pytree for CacheState: block pool partitioned across
    model shards (and pipe stages when pp, stage-major — matching the
    layer-group-major allocator partition order of core/state.py);
    tables/context shard on the layer axis over pipe and the kv-head axis
    over model."""
    m = MODEL_AXIS
    pool = (PIPE_AXIS, m) if pp else m
    lx = PIPE_AXIS if pp else None
    return CacheState(
        k_cache=P(pool, None, None),
        v_cache=P(pool, None, None),
        kv_metrics=P(pool, None),
        kv_positions=P(pool, None),
        block_tables=P(lx, None, m, None),
        context_lens=P(lx, None, m),
        # one allocator partition per (stage, TP shard) (core/state.py):
        # stacks and tops shard with their pool partition
        free_stack=P(pool, None),
        free_top=P(pool),
        # int8 cache: scale planes shard with their pool partition
        k_scale=P(pool, None) if quantized else None,
        v_scale=P(pool, None) if quantized else None,
    )


def shard_params(params: Dict[str, Any], mesh: Mesh,
                 ep: bool = False) -> Dict[str, Any]:
    specs = param_specs(params, pp=PIPE_AXIS in mesh.axis_names, ep=ep)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)))


def shard_state(state: CacheState, mesh: Mesh) -> CacheState:
    specs = state_specs(quantized=state.quantized,
                        pp=PIPE_AXIS in mesh.axis_names)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, specs)
