"""Micro-benchmark: grouped (ragged_dot) vs dense all-experts MoE dispatch.

The grouped path is the TPU reshaping of the reference's token-sorted fused
MoE kernels (vllm/model_executor/layers/fused_moe/fused_moe.py): top-k ids
-> expert-sorted rows -> grouped GEMM -> weighted scatter-add. FLOPs are
T*k*d*i vs the dense path's T*E*d*i (4x less at mixtral E=8 k=2).

Run on the real chip (`python benchmarks/kvcompress/benchmark_moe_dispatch.py`)
— the CPU backend lowers ragged_dot to a scalar loop and is not meaningful.
Emits one JSON line per shape.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from kvcompress_tpu.config import ModelConfig
from kvcompress_tpu.models import decoder as D


def bench(T, d, i, E, k, iters=10):
    cfg = ModelConfig(hidden_size=d, intermediate_size=i,
                      moe_intermediate_size=i, num_experts=E,
                      num_experts_per_tok=k, hidden_act="silu")
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    lw = {
        "router": jax.random.normal(keys[0], (d, E), jnp.bfloat16) * 0.5,
        "experts_gate": jax.random.normal(keys[1], (E, d, i), jnp.bfloat16),
        "experts_up": jax.random.normal(keys[2], (E, d, i), jnp.bfloat16),
        "experts_down": jax.random.normal(keys[3], (E, i, d), jnp.bfloat16),
    }
    x = jax.random.normal(keys[4], (T, d), jnp.bfloat16)

    def timed(dispatch):
        c = dataclasses.replace(cfg, moe_dispatch=dispatch)
        f = jax.jit(lambda a: D._moe_mlp(a, lw, c))
        f(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            f(x).block_until_ready()
        return (time.perf_counter() - t0) / iters

    t_dense, t_grouped = timed("dense"), timed("grouped")
    flops_g = 3 * 2 * T * k * d * i  # gate+up+down grouped GEMMs
    print(json.dumps({
        "shape": {"T": T, "d": d, "i": i, "E": E, "k": k},
        "dense_ms": round(t_dense * 1e3, 3),
        "grouped_ms": round(t_grouped * 1e3, 3),
        "speedup": round(t_dense / t_grouped, 2),
        "grouped_tflops": round(flops_g / t_grouped / 1e12, 2),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    # mixtral-8x7b layer shape (d=4096 i=14336 E=8 k=2): prefill + decode
    for T in (1, 64, 1024, 6144):
        bench(T, 4096, 14336, 8, 2)
    # qwen2-moe-a14b-ish fine-grained experts (E=64 k=8)
    for T in (64, 1024):
        bench(T, 3584, 2560, 64, 8)
