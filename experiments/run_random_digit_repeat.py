"""Random-digit repeat harness.

The role of reference experiments/run_random_digit_repeat.py and the
tests/kvcompress/test_random_digit_repeat.py fixtures: prompts of random
digits the model must repeat back, where correctness under KV eviction is
directly measurable (exact-match rate and per-token accuracy vs the
compression configuration). Requires a real instruction-tuned checkpoint.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def make_prompt(rng, n_digits: int) -> str:
    digits = " ".join(str(rng.integers(0, 10)) for _ in range(n_digits))
    return (f"Repeat the following digits exactly: {digits}\n"
            f"Repeated digits:"), digits


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--num-prompts", type=int, default=32)
    p.add_argument("--num-digits", type=int, default=100)
    p.add_argument("--max-cache-tokens", type=int, default=-1)
    p.add_argument("--target-compression-rate", type=float, default=1.0)
    p.add_argument("--protected-window-size", type=int, default=32)
    p.add_argument("--compress-once", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams

    llm = LLM(args.model, enable_kvcompress=True)
    rng = np.random.default_rng(args.seed)
    prompts, expected = zip(*(make_prompt(rng, args.num_digits)
                              for _ in range(args.num_prompts)))
    sp = SamplingParams(
        temperature=0.0, max_tokens=args.num_digits * 2 + 8,
        max_cache_tokens=args.max_cache_tokens,
        target_compression_rate=args.target_compression_rate,
        protected_window_size=args.protected_window_size,
        compress_once=args.compress_once)
    outs = llm.generate(list(prompts), sp)

    exact = 0
    tok_acc = []
    for out, exp in zip(outs, expected):
        pred = out.outputs[0].text.strip()
        exp_digits = exp.split()
        pred_digits = pred.split()[:len(exp_digits)]
        matches = sum(a == b for a, b in zip(pred_digits, exp_digits))
        tok_acc.append(matches / len(exp_digits))
        exact += pred.startswith(exp)
    print(json.dumps({
        "exact_match": exact / len(outs),
        "digit_accuracy": float(np.mean(tok_acc)),
        "evicted_kvs": llm.llm_engine.scheduler.total_evicted_kvs,
    }))


if __name__ == "__main__":
    main()
