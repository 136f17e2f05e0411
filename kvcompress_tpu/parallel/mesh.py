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


def build_mesh(tp_size: int, dp_size: int = 1,
               devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = tp_size * dp_size
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp_size, tp_size)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching models/llama.py param layout."""
    m = MODEL_AXIS
    layer_specs = {
        "input_norm": P(None, None),
        "post_attn_norm": P(None, None),
        "wq": P(None, None, m),
        "wk": P(None, None, m),
        "wv": P(None, None, m),
        "wo": P(None, m, None),
        "w_gate": P(None, None, m),
        "w_up": P(None, None, m),
        "w_down": P(None, m, None),
        "bq": P(None, m),
        "bk": P(None, m),
        "bv": P(None, m),
    }
    specs = {
        "embed": P(m, None),
        "final_norm": P(None),
        "layers": {k: layer_specs[k] for k in params["layers"]},
    }
    if "lm_head" in params:
        specs["lm_head"] = P(m, None)
    return specs


def state_specs() -> CacheState:
    """PartitionSpec pytree for CacheState: block pool partitioned across
    model shards; tables/context sharded on the kv-head axis."""
    m = MODEL_AXIS
    return CacheState(
        k_cache=P(m, None, None),
        v_cache=P(m, None, None),
        kv_metrics=P(m, None),
        kv_positions=P(m, None),
        block_tables=P(None, None, m, None),
        context_lens=P(None, None, m),
        free_stack=P(None),
        free_top=P(),
    )


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)))


def shard_state(state: CacheState, mesh: Mesh) -> CacheState:
    specs = state_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, specs)
