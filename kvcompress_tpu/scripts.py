"""CLI: `python -m kvcompress_tpu.scripts serve ...` / console entry `kvc`.

The analogue of reference vllm/scripts.py (vllm serve :27-37,121-123) with
the KVC engine flags of vllm/engine/arg_utils.py:783-915.
"""

from __future__ import annotations

import argparse
import sys


def add_engine_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("model", help="path to a local HF model directory")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--trust-remote-code", action="store_true",
                   help="allow tokenizer/config classes shipped inside "
                        "the local checkpoint directory")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--quantization", "-q", default=None,
                   choices=["int8", "fp8", "int4"],
                   help="weight-only quantization; AWQ/GPTQ checkpoints "
                        "default to int4 automatically")
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--max-num-seqs", type=int, default=64)
    p.add_argument("--max-model-len", type=int, default=None)
    p.add_argument("--gpu-memory-utilization", type=float, default=0.9)
    p.add_argument("--kv-cache-dtype", default="auto",
                   choices=("auto", "bfloat16", "float32", "int8"),
                   help="int8 = per-KV-scale quantized cache (the "
                        "reference's --kv-cache-dtype fp8 counterpart)")
    p.add_argument("--num-blocks", type=int, default=None,
                   help="override profiled cache size (blocks)")
    p.add_argument("--enable-prefix-caching", action="store_true",
                   help="pool finished uncompressed prompts' blocks for "
                        "copy-reuse by later shared-prefix prompts")
    p.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    p.add_argument("--pipeline-parallel-size", "-pp", type=int, default=1)
    p.add_argument("--data-parallel-size", "-dp", type=int, default=1,
                   help="engine replicas on disjoint mesh slices "
                        "(parallel/data_parallel.py)")
    p.add_argument("--seed", type=int, default=0)
    # --- KV-Compress flags (reference arg_utils.py:783-915) ---
    p.add_argument("--enable-kvc", action="store_true", default=False)
    p.add_argument("--compression-interval", type=int, default=16)
    p.add_argument("--max-kv-per-compression", type=int, default=5_000_000)
    p.add_argument("--prefill-metric-collection-window-size", type=int,
                   default=32)
    p.add_argument("--prefill-metric-collection-block-size", type=int,
                   default=1024)
    p.add_argument("--metric-aggregation", default="L2-maxpool",
                   choices=["L2-maxpool", "L2", "average-maxpool", "average"])
    p.add_argument("--kv-head-bias-path", default=None)
    p.add_argument("--kv-head-bias-weight", type=float, default=1.0)
    p.add_argument("--disable-decoding-metrics", action="store_true")
    # --- LoRA (reference --enable-lora / --max-loras / --max-lora-rank) ---
    p.add_argument("--enable-lora", action="store_true")
    p.add_argument("--max-loras", type=int, default=4)
    p.add_argument("--max-lora-rank", type=int, default=16)
    # --- speculative decoding (reference --num-speculative-tokens etc) ---
    p.add_argument("--num-speculative-tokens", type=int, default=0)
    p.add_argument("--speculative-method", default="ngram",
                   choices=["ngram", "draft", "medusa", "mlp_speculator",
                            "eagle"])
    p.add_argument("--speculative-draft-model", default=None,
                   help="draft/proposer checkpoint dir for methods other "
                        "than ngram")
    # reference --spec-decoding-acceptance-method (arg_utils.py)
    p.add_argument("--spec-decoding-acceptance-method",
                   default="rejection_sampler",
                   choices=["rejection_sampler",
                            "typical_acceptance_sampler"])
    p.add_argument("--typical-acceptance-sampler-posterior-threshold",
                   type=float, default=0.09)
    p.add_argument("--typical-acceptance-sampler-posterior-alpha",
                   type=float, default=0.3)
    p.add_argument("--ngram-prompt-lookup-min", type=int, default=1)
    p.add_argument("--ngram-prompt-lookup-max", type=int, default=4)
    # --- multi-step scheduling (reference --num-scheduler-steps) ---
    p.add_argument("--num-scheduler-steps", type=int, default=0)


def llm_kwargs(args) -> dict:
    return dict(
        model=args.model,
        tokenizer=args.tokenizer,
        trust_remote_code=args.trust_remote_code,
        dtype=args.dtype,
        quantization=args.quantization,
        num_blocks=args.num_blocks,
        block_size=args.block_size,
        max_num_seqs=args.max_num_seqs,
        max_model_len=args.max_model_len,
        gpu_memory_utilization=args.gpu_memory_utilization,
        kv_cache_dtype=args.kv_cache_dtype,
        enable_kvcompress=args.enable_kvc,
        enable_prefix_caching=args.enable_prefix_caching,
        compression_interval=args.compression_interval,
        max_kv_per_compression=args.max_kv_per_compression,
        prefill_metric_collection_window_size=(
            args.prefill_metric_collection_window_size),
        prefill_metric_collection_block_size=(
            args.prefill_metric_collection_block_size),
        metric_aggregation=args.metric_aggregation,
        kv_head_bias_file=args.kv_head_bias_path,
        kv_head_bias_weight=args.kv_head_bias_weight,
        record_decoding_metrics=not args.disable_decoding_metrics,
        tensor_parallel_size=args.tensor_parallel_size,
        pipeline_parallel_size=args.pipeline_parallel_size,
        data_parallel_size=args.data_parallel_size,
        enable_lora=args.enable_lora,
        max_loras=args.max_loras,
        max_lora_rank=args.max_lora_rank,
        num_speculative_tokens=args.num_speculative_tokens,
        speculative_method=args.speculative_method,
        speculative_draft_model=args.speculative_draft_model,
        spec_decoding_acceptance_method=args.spec_decoding_acceptance_method,
        typical_acceptance_sampler_posterior_threshold=(
            args.typical_acceptance_sampler_posterior_threshold),
        typical_acceptance_sampler_posterior_alpha=(
            args.typical_acceptance_sampler_posterior_alpha),
        ngram_prompt_lookup_min=args.ngram_prompt_lookup_min,
        ngram_prompt_lookup_max=args.ngram_prompt_lookup_max,
        num_scheduler_steps=args.num_scheduler_steps,
        seed=args.seed,
    )


def build_llm(args):
    from kvcompress_tpu.entrypoints.llm import LLM
    return LLM(**llm_kwargs(args))


def cmd_serve(args) -> None:
    from kvcompress_tpu.entrypoints.openai.api_server import OpenAIServer
    if args.rpc:
        # decoupled mode (reference api_server.py:97-130): engine in its
        # own process, this process keeps HTTP + tokenizer only
        from transformers import AutoTokenizer
        from kvcompress_tpu.entrypoints.openai.rpc import (
            RPCEngineClient, spawn_engine_process)
        proc, sock_path = spawn_engine_process(llm_kwargs(args))
        client = RPCEngineClient(sock_path, connect_timeout=600.0)
        tok = AutoTokenizer.from_pretrained(args.tokenizer or args.model)
        server = OpenAIServer(rpc=client, tokenizer=tok,
                              model_name=args.model)
        print(f"kvcompress-tpu serving {args.model} on "
              f"{args.host}:{args.port} (rpc engine pid {proc.pid})",
              flush=True)
        try:
            server.serve(host=args.host, port=args.port)
        finally:
            client.shutdown()
            proc.join(timeout=10)
        return
    llm = build_llm(args)
    server = OpenAIServer(llm.llm_engine, model_name=args.model, llm=llm)
    print(f"kvcompress-tpu serving {args.model} on "
          f"{args.host}:{args.port}", flush=True)
    server.serve(host=args.host, port=args.port)


def cmd_generate(args) -> None:
    from kvcompress_tpu.sampling_params import SamplingParams
    llm = build_llm(args)
    sp = SamplingParams(temperature=args.temperature,
                        max_tokens=args.max_tokens,
                        max_cache_tokens=args.max_cache_tokens,
                        protected_window_size=args.protected_window_size,
                        compress_once=args.compress_once)
    outs = llm.generate([args.prompt], sp)
    print(outs[0].outputs[0].text)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("kvc")
    sub = parser.add_subparsers(dest="cmd", required=True)

    serve = sub.add_parser("serve", help="start the OpenAI-compatible server")
    add_engine_args(serve)
    serve.add_argument("--host", default="0.0.0.0")
    serve.add_argument("--port", type=int, default=8000)
    serve.add_argument("--rpc", action="store_true",
                       help="run the engine in its own process behind a "
                            "unix-socket RPC (reference "
                            "entrypoints/openai/rpc/)")
    serve.set_defaults(fn=cmd_serve)

    gen = sub.add_parser("generate", help="one-shot generation")
    add_engine_args(gen)
    gen.add_argument("--prompt", required=True)
    gen.add_argument("--temperature", type=float, default=0.0)
    gen.add_argument("--max-tokens", type=int, default=64)
    gen.add_argument("--max-cache-tokens", type=int, default=-1)
    gen.add_argument("--protected-window-size", type=int, default=32)
    gen.add_argument("--compress-once", action="store_true")
    gen.set_defaults(fn=cmd_generate)

    env = sub.add_parser(
        "env-help", help="list every KVC_* environment knob")
    env.set_defaults(fn=lambda a: print(
        __import__("kvcompress_tpu.envs", fromlist=["x"]).document()))

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
