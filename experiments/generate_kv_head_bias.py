"""Per-head eviction-bias generation.

The role of reference experiments/generate_kv_head_bias.py:300-326: measure
how "sporadic" each (layer, head)'s eviction metric distribution is over a
calibration corpus and emit kv_head_bias_{name}.npz with
{bias [L, H, bins], pos_bins [bins]} consumed by
kvcompress_tpu/kvcompress/head_bias.py.

TPU-native method: run calibration prompts through the engine with metric
recording on, read the per-KV metric tensor + positions straight off the
device cache state, and aggregate mean metric per (layer, head,
position-bin). The emitted bias is the negated z-score so heads whose KVs
systematically score high are nudged toward retention parity.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--prompts-file", default=None,
                   help="text file, one calibration prompt per line")
    p.add_argument("--num-synthetic", type=int, default=8)
    p.add_argument("--prompt-len", type=int, default=1024)
    p.add_argument("--pos-bins", type=int, nargs="+",
                   default=[0, 128, 512, 2048, 8192])
    p.add_argument("--out", default="kv_head_bias.npz")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from kvcompress_tpu.entrypoints.llm import LLM
    from kvcompress_tpu.sampling_params import SamplingParams

    llm = LLM(args.model, enable_kvcompress=True)
    eng = llm.llm_engine
    cfg = eng.cfg.model
    L, H = cfg.num_layers, cfg.num_kv_heads
    bins = np.asarray(args.pos_bins, np.int32)
    nb = len(bins)

    if args.prompts_file:
        prompts = [l.strip() for l in open(args.prompts_file) if l.strip()]
        prompt_ids = [eng.tokenizer.encode(t) for t in prompts]
    else:
        rng = np.random.default_rng(args.seed)
        prompt_ids = [rng.integers(0, cfg.vocab_size,
                                   size=args.prompt_len).tolist()
                      for _ in range(args.num_synthetic)]

    acc = np.zeros((L, H, nb), np.float64)
    cnt = np.zeros((L, H, nb), np.int64)
    for ids in prompt_ids:
        llm.generate(prompt_token_ids=[ids],
                     sampling_params=SamplingParams(
                         temperature=0.0, max_tokens=32, ignore_eos=True))
        # sequences are freed after finishing, but metrics/positions of their
        # slots remain in the pool until reallocated - snapshot per prompt
        # via the per-seq workspace instead: simplest robust route is to
        # re-run with the request held open; here we read the whole pool
        # and bin every recorded KV (freed blocks have position -1).
        metrics = np.asarray(eng.state.kv_metrics)      # [blocks, bs]
        positions = np.asarray(eng.state.kv_positions)
        # recover (layer, head) of each block from the block tables
        bt = np.asarray(eng.state.block_tables)         # [L, S, H, B]
        for l in range(L):
            for h in range(H):
                blocks = np.unique(bt[l, :, h])
                blocks = blocks[blocks > 0]
                m = metrics[blocks].ravel()
                pos = positions[blocks].ravel()
                ok = pos >= 0
                if not ok.any():
                    continue
                b_idx = np.clip(
                    np.searchsorted(bins, pos[ok], side="right") - 1, 0,
                    nb - 1)
                np.add.at(acc[l, h], b_idx, m[ok])
                np.add.at(cnt[l, h], b_idx, 1)

    mean = acc / np.maximum(cnt, 1)
    # negated z-score across heads per (layer, bin): high-metric heads get
    # negative bias (evict sooner), matching the reference's sporadicity
    # equalisation goal
    mu = mean.mean(axis=1, keepdims=True)
    sd = mean.std(axis=1, keepdims=True) + 1e-9
    bias = -((mean - mu) / sd).astype(np.float32)

    np.savez(args.out, bias=bias, pos_bins=bins)
    print(json.dumps({"out": args.out, "shape": list(bias.shape),
                      "pos_bins": bins.tolist()}))


if __name__ == "__main__":
    main()
