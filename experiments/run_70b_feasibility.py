"""Llama-3.1-70B-FP8 @ TP=8 feasibility on a v5e-8 slice.

The reference's second flagship benchmark serves Llama-3.1-70B-FP8 on
8 GPUs (reference benchmarks/scripts/benchmark_llama3_70b.sh). Multi-chip
hardware is not reachable from this environment, so feasibility is
established on the virtual 8-device CPU mesh in two parts:

1. MEMORY: the full 70B shape (80L, 64/8 heads, d=128, ffn 28672, vocab
   128256) with fp8 weights is AOT-lowered at TP=8 using abstract
   (jax.eval_shape) parameters - nothing is materialized - and XLA's
   memory analysis (or the analytic fallback the engine also uses,
   engine/llm_engine.py:_profile_num_blocks) sizes the per-shard HBM
   budget: weights + temps + block tables + KV cache blocks against the
   16 GB of a v5e chip.

2. EXECUTION: a depth-2 model at the FULL 70B width (8192 hidden, 64
   query heads, 128256 vocab, fp8) actually serves requests through
   LLMEngine.step() on the 8-way mesh - prefill, decode bursts and
   compression all execute, proving the sharded program graph is not just
   compilable but runnable.

Writes experiments/results_70b_feasibility.json.

Usage: python experiments/run_70b_feasibility.py
(The script pins the CPU backend and the 8-device virtual mesh itself,
the same way tests/conftest.py does - setting JAX_PLATFORMS=cpu in the
PROCESS environment instead makes the axon sitecustomize take a blocking
registration path on this image.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_BYTES = 16 << 30          # v5e chip
UTIL = 0.90                   # gpu_memory_utilization default


def llama70b_config(num_layers=80, dtype="bfloat16"):
    from kvcompress_tpu.config import ModelConfig
    return ModelConfig(
        num_layers=num_layers, num_heads=64, num_kv_heads=8, head_size=128,
        hidden_size=8192, intermediate_size=28672, vocab_size=128256,
        max_model_len=8192, rope_theta=500000.0,
        tie_word_embeddings=False, dtype=dtype)


def engine_config(mc, max_num_seqs=64, prefill_bucket=2048):
    from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                       KVCompressConfig, ParallelConfig,
                                       SchedulerConfig)
    return EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, cache_dtype="bfloat16"),
        kvcompress=KVCompressConfig(
            compression_interval=16, max_kv_per_compression=1 << 22,
            max_cache_moves_per_compression=1 << 20),
        scheduler=SchedulerConfig(
            max_num_seqs=max_num_seqs, max_model_len=mc.max_model_len,
            prefill_buckets=(prefill_bucket,)),
        parallel=ParallelConfig(tensor_parallel_size=8),
    )


def budget_fields(mc, cfg, params_shard: int, temp_shard: int, TP: int):
    """Per-shard HBM budget: weights + temps + block tables, remainder to
    KV cache blocks (the same arithmetic as the engine's profiled sizing,
    engine/llm_engine.py:_profile_num_blocks)."""
    L, S, H = mc.num_layers, cfg.scheduler.max_num_seqs, mc.num_kv_heads
    Bmax = cfg.max_blocks_per_head
    H_shard = H // TP
    tables = (L * S * H_shard * Bmax + L * S * H_shard) * 4
    bs = cfg.cache.block_size
    per_block = 2 * bs * mc.head_size * 2 + 4  # bf16 k+v + free-stack entry
    budget = int(HBM_BYTES * UTIL) - params_shard - temp_shard - tables
    nblocks_shard = max(budget, 0) // per_block
    nblocks_total = nblocks_shard * TP
    kv_tokens_per_head = nblocks_total * bs // (L * H)
    # each sequence's per-head context; uncompressed max context:
    max_ctx_uncompressed = kv_tokens_per_head // S
    feasible = nblocks_shard > 0 and max_ctx_uncompressed >= 512
    return {
        "tables_per_shard_gb": round(tables / 1e9, 3),
        "cache_per_shard_gb": round(nblocks_shard * per_block / 1e9, 3),
        "num_blocks_total": int(nblocks_total),
        "kv_tokens_per_head_total": int(kv_tokens_per_head),
        "max_num_seqs": S,
        "max_uncompressed_context_at_full_batch": int(max_ctx_uncompressed),
        "max_context_at_cr64_full_batch": int(max_ctx_uncompressed * 64),
        "feasible": bool(feasible),
    }


def shard_bytes(sds, spec, tp: int) -> int:
    """Per-shard bytes of one abstract leaf under its PartitionSpec."""
    import numpy as np
    n = int(np.prod(sds.shape)) * sds.dtype.itemsize
    sharded = any(ax is not None for ax in (spec or ()))
    return n // tp if sharded else n


def main():
    t0 = time.time()
    os.environ.setdefault("KVC_COMPILATION_CACHE", "/tmp/kvc_70b_cache")
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_platforms", "cpu")

    from kvcompress_tpu.utils import hostcache
    hostcache.configure("cpu", tag="70b")  # part 1 compiles before any
    # LLMEngine exists, so wire the persistent cache up explicitly

    from kvcompress_tpu.config import cdiv
    from kvcompress_tpu.models.decoder import init_params
    from kvcompress_tpu.parallel.mesh import (MODEL_AXIS, build_mesh,
                                              param_specs, shard_state)
    from kvcompress_tpu.quantization.fp8 import (
        quantize_params as quantize_fp8)

    assert len(jax.devices()) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8")
    mesh = build_mesh(tp_size=8)
    TP = 8

    # ---- part 1: full-shape memory analysis with abstract params --------
    mc = llama70b_config()
    cfg = engine_config(mc)

    abstract = jax.eval_shape(
        lambda: quantize_fp8(init_params(mc, dtype=jnp.bfloat16)))
    specs = param_specs(abstract)
    flat_a, tree = jax.tree.flatten(abstract)
    flat_s, _ = jax.tree.flatten(specs)
    params_shard = sum(shard_bytes(a, s, TP)
                       for a, s in zip(flat_a, flat_s))
    params_total = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                       for a in flat_a)
    print(f"params: total {params_total / 1e9:.1f} GB, "
          f"per-shard {params_shard / 1e9:.2f} GB (fp8 + f32 scales)")

    from jax.sharding import NamedSharding
    sharded_abstract = jax.tree.map(
        lambda a, s: jax.ShapeDtypeStruct(
            a.shape, a.dtype, sharding=NamedSharding(mesh, s)),
        abstract, specs)

    # lower+compile the prefill program at the 2048 bucket against a
    # nominal tiny cache (the same shapes the engine's own profiled
    # sizing uses, llm_engine.py:_profile_temp_bytes)
    from kvcompress_tpu.core.state import init_cache_state
    from kvcompress_tpu.engine.programs import EnginePrograms
    from kvcompress_tpu.engine.sampler import SamplingTensors

    nominal = init_cache_state(
        num_blocks=64 * TP, block_size=16, head_size=mc.head_size,
        num_layers=mc.num_layers, max_num_seqs=cfg.scheduler.max_num_seqs,
        num_kv_heads=mc.num_kv_heads,
        max_blocks_per_head=cfg.max_blocks_per_head,
        cache_dtype=jnp.bfloat16, num_block_partitions=TP)
    nominal = shard_state(nominal, mesh)
    progs = EnginePrograms(cfg, sharded_abstract, attn_impl="xla",
                           mesh=mesh)
    T = 2048
    st1 = SamplingTensors.from_params([None], pad_to=1,
                                      vocab_size=mc.vocab_size)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((1,), jnp.float32)
    print("lowering+compiling TP=8 prefill program (abstract params)...")
    lowered = progs._build_prefill(T).lower(
        nominal, sharded_abstract, jnp.zeros((T,), jnp.int32),
        jnp.asarray(T, jnp.int32), jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32), st1, rng,
        jnp.asarray(0, jnp.int32), z, jnp.zeros((1,), bool),
        jnp.zeros((1, 1), jnp.float32), jnp.asarray(0, jnp.int32),
        jnp.zeros((1, 1), jnp.float32), jnp.full((1,), T, jnp.int32))
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    temp_cpu_measured = (int(ma.temp_size_in_bytes)
                         if ma is not None
                         and getattr(ma, "temp_size_in_bytes", 0) else None)
    # analytic TPU bound: prefill activations ~ T x max(hidden, ffn/TP,
    # vocab/TP) x 4B x small pipeline depth; compression workspace
    # dominates at 4 sort copies of the gathered window.  XLA:CPU's
    # memory_analysis over-reports for the TPU target (no TPU fusion /
    # VMEM streaming - it materializes every [T, ffn] intermediate), so
    # feasibility uses the analytic model; the measured CPU number is
    # recorded alongside, and --tpu-proxy replaces it with a real on-chip
    # measurement of one shard's shapes when the tunnel is reachable.
    act = T * max(mc.hidden_size,
                  mc.intermediate_size // TP,
                  mc.vocab_size // TP) * 4 * 4
    comp = cfg.kvcompress.max_kv_per_compression * 4 * 8 // TP
    temp_shard = max(act, comp)
    temp_src = "analytic_tpu_model"
    measured = ("unavailable" if temp_cpu_measured is None
                else f"{temp_cpu_measured / 1e9:.2f} GB")
    print(f"temp per shard: {temp_shard / 1e9:.2f} GB ({temp_src}; "
          f"cpu-xla measured {measured})")

    result = {
        "model": "llama-3.1-70b-shape fp8 W8(+f32 scales) bf16 activations",
        "tp": TP,
        "hbm_per_chip_gb": HBM_BYTES / 1e9,
        "utilization": UTIL,
        "params_total_gb": round(params_total / 1e9, 2),
        "params_per_shard_gb": round(params_shard / 1e9, 3),
        "temp_per_shard_gb": round(temp_shard / 1e9, 3),
        "temp_source": temp_src,
        "temp_per_shard_cpu_xla_gb": (
            round(temp_cpu_measured / 1e9, 3)
            if temp_cpu_measured else None),
        "prefill_compile_s": round(time.time() - t0, 1),
    }
    result.update(budget_fields(mc, cfg, params_shard, temp_shard, TP))

    # ---- part 2: depth-2 full-width engine run on the 8-way mesh -------
    print("part 2: depth-2 full-width fp8 engine on the TP=8 mesh...")
    t1 = time.time()
    mc2 = llama70b_config(num_layers=2)
    cfg2 = engine_config(mc2, max_num_seqs=4, prefill_bucket=128)
    params2 = quantize_fp8(init_params(mc2, seed=0, dtype=jnp.bfloat16))

    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.sampling_params import SamplingParams
    eng = LLMEngine(cfg2, params2, num_blocks=512, attn_impl="xla",
                    mesh=mesh)
    rng_np = np.random.default_rng(0)
    for i in range(3):
        eng.add_request(str(i),
                        prompt_token_ids=rng_np.integers(
                            0, 1000, size=96).tolist(),
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=8, ignore_eos=True,
                            max_cache_tokens=64, protected_window_size=16))
    steps = 0
    while eng.has_unfinished_requests():
        eng.step()
        steps += 1
    result["depth2_run"] = {
        "steps": steps,
        "evicted_kvs": int(eng.scheduler.total_evicted_kvs),
        "wall_s": round(time.time() - t1, 1),
    }
    print(f"depth-2 run: {steps} steps, "
          f"evicted {result['depth2_run']['evicted_kvs']} KVs")

    out = os.path.join(os.path.dirname(__file__),
                       "results_70b_feasibility.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    print(f"wrote {out}")


def main_tpu_proxy():
    """Replace the analytic temp bound with a REAL on-chip measurement.

    One TP=8 shard of the 70B is exactly a single-chip model with heads,
    ffn and vocab divided by 8 (hidden/activations replicated between the
    megatron blocks), so its AOT memory analysis on the real v5e chip IS
    the per-shard temp the budget needs - no multi-chip hardware required.
    Compile-only: parameters stay abstract (jax.eval_shape), nothing close
    to 70B is materialized. Updates results_70b_feasibility.json in place.
    """
    t0 = time.time()
    os.environ.setdefault("KVC_COMPILATION_CACHE", "/tmp/kvc_70b_tpu_cache")
    import jax
    import jax.numpy as jnp
    plat = jax.devices()[0].platform
    assert plat in ("tpu", "axon"), f"need the TPU tunnel, got {plat}"

    from kvcompress_tpu.config import ModelConfig
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.models.decoder import init_params
    from kvcompress_tpu.quantization.fp8 import (
        quantize_params as quantize_fp8)

    TP = 8
    mc = ModelConfig(
        num_layers=80, num_heads=64 // TP, num_kv_heads=8 // TP,
        head_size=128, hidden_size=8192, intermediate_size=28672 // TP,
        vocab_size=128256 // TP, max_model_len=8192, rope_theta=500000.0,
        tie_word_embeddings=False, dtype="bfloat16")
    cfg = engine_config(mc)
    cfg.parallel.tensor_parallel_size = 1  # the shard IS one chip

    abstract = jax.eval_shape(
        lambda: quantize_fp8(init_params(mc, dtype=jnp.bfloat16)))
    impl = os.environ.get("KVC_70B_PROXY_ATTN", "pallas")
    try:
        eng = LLMEngine(cfg, abstract, num_blocks=64, attn_impl=impl)
        print(f"AOT-compiling shard-shaped programs on {plat} "
              f"(attn={impl})...")
        temp = eng._profile_temp_bytes(abstract)
    except Exception as e:
        if impl == "pallas":
            print(f"pallas shard proxy failed ({e!r}); retrying with xla")
            impl = "xla"
            eng = LLMEngine(cfg, abstract, num_blocks=64, attn_impl="xla")
            temp = eng._profile_temp_bytes(abstract)
        else:
            raise
    print(f"on-chip per-shard temp: {temp / 1e9:.3f} GB "
          f"({time.time() - t0:.0f}s)")

    out = os.path.join(os.path.dirname(__file__),
                       "results_70b_feasibility.json")
    with open(out) as f:
        result = json.load(f)
    result["temp_per_shard_gb"] = round(temp / 1e9, 3)
    result["temp_source"] = f"tpu_shard_proxy({plat},attn={impl})"
    mc_full = llama70b_config()
    cfg_full = engine_config(mc_full)
    params_shard = int(result["params_per_shard_gb"] * 1e9)
    result.update(budget_fields(mc_full, cfg_full, params_shard, temp, TP))
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    if "--tpu-proxy" in sys.argv:
        main_tpu_proxy()
    else:
        main()
