"""Grouped (ragged_dot) MoE expert dispatch vs the dense all-experts
einsum — exact-equivalence and quantized-path coverage.

The grouped path plays the role of the reference's token-sorted fused MoE
kernels (vllm/model_executor/layers/fused_moe/fused_moe.py: topk ids ->
sorted token groups -> grouped GEMM -> weighted scatter), reshaped for TPU
as jax.lax.ragged_dot over expert-sorted rows. Both paths must produce the
SAME output: the dense path computes every expert for every token and
weights by the sparse routing matrix, so any row with weight 0 contributes
exactly 0 — grouped simply skips those rows.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvcompress_tpu.config import ModelConfig
from kvcompress_tpu.models import decoder as D


def _moe_cfg(routing="softmax_topk", **kw):
    base = dict(hidden_size=64, intermediate_size=96,
                moe_intermediate_size=80, num_experts=8,
                num_experts_per_tok=2, moe_routing=routing,
                hidden_act="silu")
    base.update(kw)
    return ModelConfig(**base)


def _moe_weights(cfg, seed=0, dtype=jnp.float32):
    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    d = cfg.hidden_size
    i = cfg.moe_intermediate_size or cfg.intermediate_size
    E = cfg.num_experts
    lw = {
        "router": jax.random.normal(k[0], (d, E), dtype) * 0.5,
        "experts_gate": jax.random.normal(k[1], (E, d, i), dtype) * d**-0.5,
        "experts_up": jax.random.normal(k[2], (E, d, i), dtype) * d**-0.5,
        "experts_down": jax.random.normal(k[3], (E, i, d), dtype) * i**-0.5,
    }
    if cfg.moe_routing == "sigmoid_noaux":
        lw["router_bias"] = jax.random.normal(k[4], (E,), dtype) * 0.1
    return lw


def _run_both(cfg, lw, x):
    import dataclasses
    dense = D._moe_mlp(x, lw, dataclasses.replace(cfg, moe_dispatch="dense"))
    grouped = D._moe_mlp(
        x, lw, dataclasses.replace(cfg, moe_dispatch="grouped"))
    return np.asarray(dense, np.float32), np.asarray(grouped, np.float32)


@pytest.mark.parametrize("routing", ["softmax_topk", "sparsemixer",
                                     "sigmoid_noaux"])
def test_grouped_equals_dense(routing):
    cfg = _moe_cfg(routing,
                   **(dict(moe_n_group=2, moe_topk_group=1,
                           moe_routed_scaling=2.5)
                      if routing == "sigmoid_noaux" else {}))
    lw = _moe_weights(cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (13, cfg.hidden_size),
                          jnp.float32)
    dense, grouped = _run_both(cfg, lw, x)
    np.testing.assert_allclose(grouped, dense, rtol=2e-5, atol=2e-5)


def test_grouped_equals_dense_int8_experts():
    """Per-(expert, out-channel) int8 scales gather correctly per sorted
    row (the _q8/_scale convention of quantization/int8.py)."""
    from kvcompress_tpu.quantization.int8 import _quantize
    cfg = _moe_cfg()
    lw = _moe_weights(cfg)
    for name in ("experts_gate", "experts_up", "experts_down"):
        q, s = _quantize(lw.pop(name))
        lw[f"{name}_q8"], lw[f"{name}_scale"] = q, s
    x = jax.random.normal(jax.random.PRNGKey(3), (9, cfg.hidden_size),
                          jnp.float32)
    dense, grouped = _run_both(cfg, lw, x)
    np.testing.assert_allclose(grouped, dense, rtol=2e-5, atol=2e-5)


def test_grouped_equals_dense_bf16_decode_batch():
    """Decode-shaped batch (T=1) in bf16 — the latency-critical case."""
    cfg = _moe_cfg()
    lw = {k: v.astype(jnp.bfloat16) for k, v in _moe_weights(cfg).items()}
    x = jax.random.normal(jax.random.PRNGKey(11), (1, cfg.hidden_size),
                          jnp.bfloat16)
    dense, grouped = _run_both(cfg, lw, x)
    np.testing.assert_allclose(grouped, dense, rtol=2e-2, atol=2e-2)


@pytest.mark.full
def test_grouped_dispatch_step_time():
    """Grouped dispatch does strictly less matmul work (T*k*d*i vs
    T*E*d*i, an E/k=4x saving at mixtral ratios). The wall-clock win
    needs Mosaic's grouped-GEMM lowering of ragged_dot, which only
    exists on TPU — the CPU backend lowers ragged_dot to a scalar loop
    that can LOSE to one big dense einsum at test shapes, so this
    asserts on TPU only; benchmarks/kvcompress/benchmark_moe_dispatch.py
    is the recorded measurement."""
    if jax.devices()[0].platform == "cpu":
        pytest.skip("ragged_dot grouped-GEMM lowering is TPU-only")
    import dataclasses
    cfg = _moe_cfg(hidden_size=256, moe_intermediate_size=512)
    lw = {k: v.astype(jnp.bfloat16) for k, v in _moe_weights(cfg).items()}
    x = jax.random.normal(jax.random.PRNGKey(5), (1024, cfg.hidden_size),
                          jnp.bfloat16)

    def timed(dispatch):
        c = dataclasses.replace(cfg, moe_dispatch=dispatch)
        f = jax.jit(lambda a: D._moe_mlp(a, lw, c))
        f(x).block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(10):
            f(x).block_until_ready()
        return (time.perf_counter() - t0) / 10

    t_dense, t_grouped = timed("dense"), timed("grouped")
    assert t_grouped < t_dense / 1.15, (t_dense, t_grouped)
