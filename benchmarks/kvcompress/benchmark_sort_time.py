"""Micro-benchmark: the eviction-scheduling sort (the reference's documented
compression bottleneck, vllm/config.py:974-985; reference micro-benches at
benchmarks/kvcompress/benchmark_sort_time*.py).

Times kvcompress_tpu.kvcompress.eviction.schedule_evictions (the two-key
lax.sort pipeline) across workspace sizes on the current backend.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from kvcompress_tpu.kvcompress.eviction import schedule_evictions


def bench(B, L, H, n, bs=16, iters=10):
    rng = np.random.default_rng(0)
    metrics = jnp.asarray(rng.random((B, L, H, n)), jnp.float32)
    positions = jnp.asarray(
        np.broadcast_to(np.arange(n, dtype=np.int32), (B, L, H, n)))
    ctx = jnp.full((B, L, H), n, jnp.int32)
    last = jnp.full((B,), n - 1, jnp.int32)
    prot = jnp.full((B,), 32, jnp.int32)
    evict = jnp.full((B,), (n // bs) // 2, jnp.int32)

    fn = jax.jit(lambda m: schedule_evictions(
        m, positions, ctx, last, prot, evict, bs))
    out = fn(metrics)
    out.evicted_mask.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(metrics)
    out.evicted_mask.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    total_kv = B * L * H * n
    print(f"B={B} L={L} H={H} n={n} ({total_kv/1e6:.2f}M KVs): "
          f"{dt*1e3:.2f} ms  ({total_kv/dt/1e6:.0f}M KV/s)")


if __name__ == "__main__":
    for B, n in ((8, 1024), (8, 2048), (32, 2048), (32, 4096)):
        bench(B, 8, 8, n)
