"""Draft-model speculative decoding benchmark on the real chip.

Trains a target (2L, d=128) and a smaller draft (2L, d=64) symbol-copier on
the TPU (~3 min), then measures greedy decode wall time with and without
speculation. On TPU serving the per-step cost is dispatch round-trip +
weights-HBM-bound forward, so replacing gamma+1 target steps with one fused
draft round + one verify pass is a real win - the economics a CPU unit test
cannot show (tiny-model CPU cost is op-count-bound, and a correct draft has
the same op count per step as the target; see
tests/test_spec_decode.py::test_draft_model_spec_wall_speedup_small_draft).

Writes experiments/results_spec_decode.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import run_digit_cr_sweep as sweep
    from kvcompress_tpu.config import (CacheConfig, EngineConfig,
                                       KVCompressConfig, ModelConfig,
                                       ParallelConfig, SchedulerConfig,
                                       SpeculativeConfig)
    from kvcompress_tpu.engine.llm_engine import LLMEngine
    from kvcompress_tpu.sampling_params import SamplingParams

    print("training target copier (d=128)...")
    tgt_cfg, tgt_params = sweep.train_copy_model(1500)
    draft_cfg = ModelConfig(
        num_layers=2, num_heads=2, num_kv_heads=2, head_size=32,
        hidden_size=64, intermediate_size=128, vocab_size=sweep.VOCAB,
        max_model_len=tgt_cfg.max_model_len, rope_theta=10000.0,
        tie_word_embeddings=True, dtype="float32")
    print("training draft copier (d=64)...")
    draft_cfg, draft_params = sweep.train_copy_model(1500, cfg=draft_cfg)

    n = sweep.N_DIGITS
    rng = np.random.default_rng(7)
    prompts = [([sweep.BOS]
                + (rng.choice(sweep.VOCAB - 12, size=n,
                              replace=False) + 12).tolist()
                + [sweep.SEP]) for _ in range(4)]

    def run(spec_tokens, draft):
        ecfg = EngineConfig(
            model=sweep.model_config(),
            cache=CacheConfig(block_size=16, cache_dtype="float32"),
            kvcompress=KVCompressConfig(enabled=False),
            scheduler=SchedulerConfig(
                max_num_seqs=4, max_model_len=tgt_cfg.max_model_len,
                prefill_buckets=(128,)),
            parallel=ParallelConfig(),
            speculative=SpeculativeConfig(
                num_speculative_tokens=spec_tokens,
                method="draft" if draft else "ngram", draft_window=192),
        )
        eng = LLMEngine(ecfg, tgt_params, num_blocks=2048,
                        attn_impl="xla", draft=draft)
        eng.multi_step = 1  # single-token steps: the spec-decode regime
        rids = [eng.add_request(None, prompt_token_ids=p,
                                sampling_params=SamplingParams(
                                    temperature=0.0, max_tokens=n,
                                    ignore_eos=True)) for p in prompts]
        t0 = time.monotonic()
        outs = {}
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o
        dt = time.monotonic() - t0
        return [outs[r].outputs[0].token_ids for r in rids], dt, eng

    base_out, _, _ = run(0, None)                      # compile warm
    spec_out, _, eng = run(4, (draft_cfg, draft_params))
    acc = eng.stats.counters.get("spec_accepted_tokens", 0)
    prop = eng.stats.counters.get("spec_proposed_tokens", 1)
    agree = np.mean([np.mean([a == b for a, b in zip(x, y)])
                     for x, y in zip(spec_out, base_out)])

    t_base = min(run(0, None)[1] for _ in range(3))
    t_spec = min(run(4, (draft_cfg, draft_params))[1] for _ in range(3))
    speedup = t_base / t_spec
    payload = {
        "setup": "trained symbol-copier target d=128 2L, draft d=64 2L, "
                 "gamma=4, 4 seqs x 64 tokens greedy, single v5e chip",
        "t_base_s": round(t_base, 3),
        "t_spec_s": round(t_spec, 3),
        "speedup": round(speedup, 3),
        "acceptance_rate": round(float(acc) / float(prop), 3),
        "output_agreement": round(float(agree), 4),
        "reference": "vllm/spec_decode/multi_step_worker.py",
    }
    out = os.path.join(os.path.dirname(__file__),
                       "results_spec_decode.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
