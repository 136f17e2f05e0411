"""Expert parallelism (EP): MoE expert weights sharded on the EXPERT axis
over the model mesh axis (parallel/mesh.py param_specs(ep=True)).

Beyond the reference: its fused_moe layers only TP-shard the intermediate
dimension (SURVEY.md section 2.7 EP row). Two paths:
- dense dispatch: GSPMD partitions the all-expert einsums and inserts the
  combine all-reduce from the shardings alone;
- grouped dispatch: decoder._moe_grouped_experts_ep runs a shard_map in
  which each shard recovers its LOCAL top-k from its slice of the dense
  routing matrix, runs the local ragged-dot GEMMs, and psums.

Both must equal the single-device grouped/dense result exactly (weight-0
local picks contribute exactly zero), on the virtual 8-device CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from kvcompress_tpu.models import decoder as D
from kvcompress_tpu.parallel.mesh import MODEL_AXIS, build_mesh

from tests.test_moe_dispatch import _moe_cfg, _moe_weights


def _shard_expert_weights(lw, mesh):
    out = {}
    for k, v in lw.items():
        if k.startswith("experts_"):
            spec = P(MODEL_AXIS, *([None] * (v.ndim - 1)))
        else:
            spec = P(*([None] * v.ndim))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


@pytest.mark.parametrize("routing", ["softmax_topk", "sigmoid_noaux"])
@pytest.mark.parametrize("tp", [4, 8])
def test_grouped_ep_equals_single_device(routing, tp):
    cfg = _moe_cfg(routing,
                   **(dict(moe_n_group=2, moe_topk_group=1,
                           moe_routed_scaling=2.5)
                      if routing == "sigmoid_noaux" else {}))
    cfg = dataclasses.replace(cfg, moe_dispatch="grouped")
    lw = _moe_weights(cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (13, cfg.hidden_size),
                          jnp.float32)
    ref = np.asarray(D._moe_mlp(x, lw, cfg), np.float32)

    mesh = build_mesh(tp)
    lw_s = _shard_expert_weights(lw, mesh)
    D.set_ep_mesh(mesh)
    try:
        got = np.asarray(jax.jit(
            lambda xx, ww: D._moe_mlp(xx, ww, cfg))(x, lw_s), np.float32)
    finally:
        D.set_ep_mesh(None)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_dense_ep_equals_single_device():
    """Dense dispatch under expert-axis sharding: pure GSPMD, no code."""
    cfg = dataclasses.replace(_moe_cfg(), moe_dispatch="dense")
    lw = _moe_weights(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (9, cfg.hidden_size),
                          jnp.float32)
    ref = np.asarray(D._moe_mlp(x, lw, cfg), np.float32)

    mesh = build_mesh(8)
    lw_s = _shard_expert_weights(lw, mesh)
    got = np.asarray(jax.jit(
        lambda xx, ww: D._moe_mlp(xx, ww, cfg))(x, lw_s), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_ep_param_specs():
    from kvcompress_tpu.parallel.mesh import param_specs
    params = {"layers": {
        "experts_gate": np.zeros((2, 8, 4, 6), np.float32),
        "experts_down": np.zeros((2, 8, 6, 4), np.float32),
        "experts_gate_q8": np.zeros((2, 8, 4, 6), np.int8),
        "experts_gate_scale": np.zeros((2, 8, 1, 6), np.float32),
        "wq": np.zeros((2, 4, 4), np.float32),
    }, "embed": np.zeros((16, 4), np.float32)}
    sp = param_specs(params, ep=True)["layers"]
    m = MODEL_AXIS
    assert sp["experts_gate"] == P(None, m, None, None)
    assert sp["experts_down"] == P(None, m, None, None)
    assert sp["experts_gate_q8"] == P(None, m, None, None)
    assert sp["experts_gate_scale"] == P(None, m, None, None)
    assert sp["wq"] == P(None, None, m)  # TP unchanged
    sp_tp = param_specs(params)["layers"]
    assert sp_tp["experts_gate"] == P(None, None, None, m)
