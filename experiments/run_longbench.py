"""LongBench evaluation runner.

The equivalent of reference experiments/run_longbench.py:1-184: sweep
LongBench datasets with per-request max_cache_tokens derived from a
compression rate (min 128, block-rounded, run_longbench.py engine build
:63-83), writing predictions for eval.py scoring.

Zero-egress note: datasets must be local JSONL files
({"input":..., "context":..., "answers": [...], "length": N} per line,
the LongBench format) under --data-dir/<dataset>.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os


PROMPT_TEMPLATES = {
    # condensed LongBench templates (dataset -> format string)
    "narrativeqa": ("You are given a story and a question. Answer briefly."
                    "\n\nStory: {context}\n\nQuestion: {input}\n\nAnswer:"),
    "qasper": ("Answer the question based on the paper."
               "\n\nPaper: {context}\n\nQuestion: {input}\n\nAnswer:"),
    "default": "{context}\n\n{input}\n\nAnswer:",
}

DATASET_MAX_GEN = {"narrativeqa": 128, "qasper": 128, "default": 64}


def find_real_checkpoint():
    """Locate a real pretrained decoder checkpoint on local disk, if one
    ever lands on this (zero-egress) image: $KVC_LONGBENCH_MODEL, else
    the first directory under the common local model roots that holds a
    config.json + weights. Returns None when nothing is found."""
    import glob
    env = os.environ.get("KVC_LONGBENCH_MODEL")
    if env and os.path.isfile(os.path.join(env, "config.json")):
        return env
    roots = ["/root/models", "/models", "/data/models",
             os.path.expanduser("~/models"),
             os.path.expanduser("~/.cache/huggingface/hub")]
    for root in roots:
        for cfg_path in sorted(glob.glob(
                os.path.join(root, "**", "config.json"), recursive=True)):
            d = os.path.dirname(cfg_path)
            has_weights = any(
                glob.glob(os.path.join(d, pat))
                for pat in ("*.safetensors", "*.bin", "*.gguf", "*.pt"))
            if not has_weights:
                continue
            try:
                with open(cfg_path) as f:
                    archs = json.load(f).get("architectures") or []
            except (OSError, json.JSONDecodeError):
                continue
            if archs:
                return d
    return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   help="checkpoint dir, or 'auto' to use the first real "
                        "pretrained checkpoint found on local disk "
                        "($KVC_LONGBENCH_MODEL or common model roots)")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--datasets", nargs="+", default=["narrativeqa"])
    p.add_argument("--out-dir", default="longbench_preds")
    p.add_argument("--compression-rate", type=float, default=0.0,
                   help="cr > 0 derives per-request max_cache_tokens")
    p.add_argument("--max-cache-tokens", type=int, default=-1)
    p.add_argument("--protected-window-size", type=int, default=32)
    p.add_argument("--metric-collection-buffer-size", type=int, default=0)
    p.add_argument("--prefill-metric-collection-window-size", type=int,
                   default=32)
    p.add_argument("--prefill-metric-collection-block-size", type=int,
                   default=1024)
    p.add_argument("--no-maxpool", action="store_true")
    p.add_argument("--kv-head-bias-path", default=None)
    p.add_argument("--max-model-len", type=int, default=33000)
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--num-blocks", type=int, default=0,
                   help="cache blocks; 0 = profiled from device memory")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    args = p.parse_args(argv)
    if args.model == "auto":
        found = find_real_checkpoint()
        if found is None:
            raise SystemExit(
                "--model auto: no pretrained checkpoint on local disk "
                "(set KVC_LONGBENCH_MODEL or place one under /root/models)")
        print(f"[longbench] auto-detected checkpoint: {found}")
        args.model = found

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams

    llm = LLM(args.model, dtype=args.dtype,
              max_model_len=args.max_model_len,
              num_blocks=args.num_blocks or None,
              block_size=args.block_size, enable_kvcompress=True,
              prefill_metric_collection_window_size=(
                  args.prefill_metric_collection_window_size),
              prefill_metric_collection_block_size=(
                  args.prefill_metric_collection_block_size),
              metric_aggregation=("L2" if args.no_maxpool
                                  else "L2-maxpool"),
              kv_head_bias_file=args.kv_head_bias_path)
    tok = llm.llm_engine.tokenizer
    # the engine clamps max_model_len to the model's trained context;
    # truncate against the EFFECTIVE length, not the requested one
    eff_max_len = llm.llm_engine.cfg.scheduler.max_model_len

    os.makedirs(args.out_dir, exist_ok=True)
    for ds in args.datasets:
        path = os.path.join(args.data_dir, f"{ds}.jsonl")
        rows = [json.loads(l) for l in open(path)]
        if args.limit:
            rows = rows[:args.limit]
        tmpl = PROMPT_TEMPLATES.get(ds, PROMPT_TEMPLATES["default"])
        max_gen = DATASET_MAX_GEN.get(ds, DATASET_MAX_GEN["default"])

        prompts, sps = [], []
        for row in rows:
            prompt = tmpl.format(**row)
            ids = tok.encode(prompt)
            if len(ids) > eff_max_len - max_gen:
                # LongBench convention: truncate from the middle
                keep = eff_max_len - max_gen
                ids = ids[:keep // 2] + ids[-(keep - keep // 2):]
            prompts.append(ids)
            if args.max_cache_tokens > 0:
                mct = args.max_cache_tokens
            elif args.compression_rate > 0:
                # reference run_longbench.py: cr -> per-request budget,
                # min 128, block-rounded
                mct = max(128, int(len(ids) / args.compression_rate)
                          // args.block_size * args.block_size)
            else:
                mct = -1
            sps.append(SamplingParams(
                temperature=0.0, max_tokens=max_gen,
                max_cache_tokens=mct,
                protected_window_size=args.protected_window_size,
                metric_collection_buffer_size=(
                    args.metric_collection_buffer_size),
                compress_once=True))

        outs = llm.generate(prompt_token_ids=prompts, sampling_params=sps)
        out_path = os.path.join(args.out_dir, f"{ds}.jsonl")
        with open(out_path, "w") as f:
            for row, out in zip(rows, outs):
                f.write(json.dumps({
                    "pred": out.outputs[0].text,
                    "answers": row.get("answers", []),
                    "all_classes": row.get("all_classes"),
                    "length": row.get("length"),
                }) + "\n")
        print(f"{ds}: wrote {len(rows)} predictions to {out_path}")


if __name__ == "__main__":
    main()
