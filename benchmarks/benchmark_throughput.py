"""Offline throughput benchmark.

The equivalent of reference benchmarks/benchmark_throughput.py:95-147,
391-409: N prompts of fixed (or dataset-derived) input length, fixed output
length, with `--enable-kvc` and `--compression-rate` converted to
per-request max_cache_tokens exactly like the reference
(max_cache_tokens = max(block, input_len / cr // block * block),
benchmark_throughput.py:391-393).

Usage (synthetic prompts, no dataset needed):
    python benchmarks/benchmark_throughput.py --model /path/to/model \\
        --num-prompts 256 --input-len 6000 --output-len 500 \\
        --enable-kvc --compression-rate 64 --protected-window-size 32
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--num-prompts", type=int, default=256)
    p.add_argument("--input-len", type=int, default=6000)
    p.add_argument("--output-len", type=int, default=500)
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--max-num-seqs", type=int, default=64)
    p.add_argument("--max-model-len", type=int, default=None)
    p.add_argument("--num-blocks", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--enable-kvc", action="store_true")
    p.add_argument("--compression-rate", type=float, default=1.0)
    p.add_argument("--protected-window-size", type=int, default=32)
    p.add_argument("--metric-collection-buffer-size", type=int, default=0)
    p.add_argument("--compress-once", action="store_true")
    p.add_argument("--compression-interval", type=int, default=16)
    p.add_argument("--output-json", default=None)
    args = p.parse_args(argv)

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams

    max_model_len = args.max_model_len or (
        args.input_len + args.output_len + 64)
    llm = LLM(args.model, tokenizer=args.tokenizer, dtype=args.dtype,
              num_blocks=args.num_blocks, block_size=args.block_size,
              max_num_seqs=args.max_num_seqs, max_model_len=max_model_len,
              enable_kvcompress=args.enable_kvc,
              compression_interval=args.compression_interval,
              seed=args.seed)

    # reference CR -> cache-size conversion (benchmark_throughput.py:391-393)
    if args.enable_kvc and args.compression_rate > 1.0:
        mct = max(args.block_size,
                  int(args.input_len / args.compression_rate)
                  // args.block_size * args.block_size)
    else:
        mct = -1
    sp = SamplingParams(
        temperature=0.0, max_tokens=args.output_len, ignore_eos=True,
        max_cache_tokens=mct,
        protected_window_size=args.protected_window_size,
        metric_collection_buffer_size=args.metric_collection_buffer_size,
        compress_once=args.compress_once)

    vocab = llm.llm_engine.cfg.model.vocab_size
    rng = np.random.default_rng(args.seed)
    prompts = [rng.integers(0, vocab, size=args.input_len).tolist()
               for _ in range(args.num_prompts)]

    # warm (compiles)
    llm.generate(prompt_token_ids=prompts[:min(8, len(prompts))],
                 sampling_params=sp)

    t0 = time.perf_counter()
    llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    dt = time.perf_counter() - t0

    total_tokens = args.num_prompts * (args.input_len + args.output_len)
    gen_tokens = args.num_prompts * args.output_len
    result = {
        "elapsed_s": round(dt, 2),
        "requests_per_s": round(args.num_prompts / dt, 3),
        "total_tokens_per_s": round(total_tokens / dt, 2),
        "output_tokens_per_s": round(gen_tokens / dt, 2),
        "compression_rate": args.compression_rate if args.enable_kvc else 1,
        "max_cache_tokens": mct,
        "evicted_kvs": llm.llm_engine.scheduler.total_evicted_kvs,
    }
    print(json.dumps(result))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    sys.exit(main())
