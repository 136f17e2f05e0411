"""Throughput benchmark (driver contract: prints ONE JSON line).

Workload mirrors the reference's canonical KVC throughput bench
(/root/reference/benchmarks/benchmark_throughput.py:95-147 + README.md:131-147):
N prompts of fixed input length, fixed output length, greedy, with
per-request max_cache_tokens giving compression rate CR vs the input length
(max_cache_tokens = max(block, input_len / CR rounded to blocks)).

Reports generated-token throughput with continual compression at CR=64 and
its ratio vs the uncompressed run on the same hardware (the reference's
headline metric is the throughput *gain* from compression).
"""

import json
import os
import time

import numpy as np


def build_engine(compress: bool, quick: bool):
    import jax.numpy as jnp
    from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                       KVCompressConfig, ModelConfig,
                                       ParallelConfig, SchedulerConfig)
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.models.llama import init_llama_params

    if quick:
        model = ModelConfig(
            num_layers=2, num_heads=4, num_kv_heads=2, head_size=16,
            hidden_size=64, intermediate_size=128, vocab_size=512,
            max_model_len=512)
        num_blocks, max_seqs = 4096, 8
        dtype = jnp.float32
        cache_dtype = "float32"
    else:
        # Llama-3.1-8B per-layer shape at quarter depth (head_size 128,
        # GQA 32/8). The workload mirrors the reference's canonical
        # memory-pressured single-device regime (README.md:131-147: many
        # prompts, long inputs, KV pool far smaller than the uncompressed
        # working set) scaled to one v5e chip: the uncompressed baseline
        # can only admit a few sequences at a time, while CR=64
        # compression fits the whole batch - the headline effect.
        model = ModelConfig(
            num_layers=8, num_heads=32, num_kv_heads=8, head_size=128,
            hidden_size=4096, intermediate_size=14336, vocab_size=128256,
            max_model_len=2560, rope_theta=500000.0,
            tie_word_embeddings=True)
        num_blocks, max_seqs = 40960, 32
        dtype = jnp.bfloat16
        cache_dtype = "bfloat16"

    cfg = EngineConfig(
        model=model,
        cache=CacheConfig(block_size=16, cache_dtype=cache_dtype),
        kvcompress=KVCompressConfig(
            enabled=compress, compression_interval=16,
            max_kv_per_compression=1 << 21,
            max_cache_moves_per_compression=1 << 17),
        scheduler=SchedulerConfig(
            max_num_seqs=max_seqs, max_model_len=model.max_model_len,
            prefill_buckets=(128, 512, 1024, 2048)),
        parallel=ParallelConfig(),
    )
    params = init_llama_params(model, seed=0, dtype=dtype)
    if os.environ.get("BENCH_QUANT") == "int8":
        from kvcompress_tpu.quantization import quantize_params
        params = quantize_params(params)
    return LLMEngine(cfg, params, num_blocks=num_blocks,
                     attn_impl=os.environ.get("BENCH_ATTN", "auto"))


def run(engine, prompts, output_len, max_cache_tokens):
    from kvcompress_tpu.sampling_params import SamplingParams
    for i, p in enumerate(prompts):
        engine.add_request(
            str(i), prompt_token_ids=p,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=output_len, ignore_eos=True,
                max_cache_tokens=max_cache_tokens,
                protected_window_size=32, compress_once=False))
    n_gen = 0
    t0 = time.monotonic()
    while engine.has_unfinished_requests():
        engine.step()
    dt = time.monotonic() - t0
    n_gen = len(prompts) * output_len
    return n_gen / dt


def main():
    quick = os.environ.get("BENCH_QUICK") == "1"
    rng = np.random.default_rng(0)
    cr = 64
    if quick:
        n_prompts, input_len, output_len = 4, 128, 16
    else:
        n_prompts, input_len, output_len = 32, 2048, 128
    vocab = 512 if quick else 128256
    block = 16
    prompts = [rng.integers(0, vocab, size=input_len).tolist()
               for _ in range(n_prompts)]
    max_cache_tokens = max(block, input_len // cr // block * block)

    # Warm with a full batch so every (batch-bucket, nb-bucket) compression
    # program and the decode/prefill programs are compiled before timing,
    # then measure two passes and keep the best (the shared-tunnel chip
    # shows bimodal interference; the best pass is the machine capability).
    warm_n = min(8, n_prompts)
    warm_tokens = 40  # enough decode steps to hit compression cadence twice
    eng_c = build_engine(compress=True, quick=quick)
    run(eng_c, prompts[:warm_n], warm_tokens, max_cache_tokens)
    tput_c = max(run(eng_c, prompts, output_len, max_cache_tokens)
                 for _ in range(1 if quick else 2))
    del eng_c

    eng_b = build_engine(compress=False, quick=quick)
    run(eng_b, prompts[:warm_n], warm_tokens, -1)
    tput_b = max(run(eng_b, prompts, output_len, -1)
                 for _ in range(1 if quick else 2))

    print(json.dumps({
        "metric": f"decode_tokens_per_s_cr{cr}",
        "value": round(tput_c, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tput_c / tput_b, 3),
    }))


if __name__ == "__main__":
    main()
