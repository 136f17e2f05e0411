"""A REAL qa_f1-vs-compression curve through the REAL LongBench pipeline.

VERDICT round-2 item 5 asks for a nonzero LongBench-pipeline score curve;
with zero egress there is no pretrained checkpoint, so the subject is the
committed TRAINED filler-prefix copier (tests/artifacts/filler_copier.npz,
the model behind the exactness-under-compression contract). This script:

1. exports it as an HF llama checkpoint (run_longbench_synthetic.py
   export_hf_llama) with a WordLevel tokenizer whose string for the
   copier's SEP id is literally "Answer:" - run_longbench.py's prompt
   template "{context}\\n\\n{input}\\n\\nAnswer:" then tokenizes to
   EXACTLY the [BOS filler digits SEP] layout the model was trained on;
2. writes a LongBench-format dataset whose contexts are filler+digit
   streams and whose answer is the digit string;
3. runs experiments/run_longbench.py (the real runner: engine build,
   per-request budgets, predictions jsonl) at several max_cache_tokens
   budgets - compress_once, the reference's LongBench regime - and scores
   with experiments/eval.py qa_f1.

Writes experiments/results_longbench_filler.json: score vs effective CR.
Match: reference experiments/run_longbench.py + out-8b score-by-cr curve
(stated stand-in: a 2-layer trained model, 66-token contexts).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BOS, SEP = 11, 10
FILLER_LO, FILLER_HI = 200, 256
DIGIT_LO, DIGIT_HI = 12, 200
N_FILLER, N_DIGITS = 32, 32


def tok_str(i: int) -> str:
    return "Answer:" if i == SEP else f"x{i:03d}"


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("KVC_COMPILATION_CACHE", "/tmp/kvc_filler_lb")

    from kvcompress_tpu.utils.params_io import load_params_npz
    from tests.test_compression_exactness import (_ARTIFACT,
                                                  copier_model_config)
    from run_longbench_synthetic import export_hf_llama
    import run_longbench
    import eval as lb_eval

    assert os.path.exists(_ARTIFACT), "train via train_test_copier.py"
    cfg = copier_model_config()
    params = load_params_npz(_ARTIFACT)
    if "lm_head" not in params:  # tied: export untied with embed as head
        params = dict(params)
        params["lm_head"] = params["embed"]
    import dataclasses
    cfg = dataclasses.replace(cfg, tie_word_embeddings=False)

    ckpt = "/tmp/kvc_filler_longbench"
    export_hf_llama(cfg, params, ckpt)

    # WordLevel tokenizer: string of id i is x{i:03d}, except SEP which is
    # the literal "Answer:" so the runner's template reconstructs the
    # training-time [.. digits SEP] prompt exactly
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast
    vocab = {tok_str(i): i for i in range(cfg.vocab_size)}
    t = Tokenizer(models.WordLevel(vocab, unk_token=tok_str(1)))
    t.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=t,
                                   unk_token=tok_str(1),
                                   pad_token=tok_str(0))
    fast.save_pretrained(ckpt)

    # ---- dataset ------------------------------------------------------
    rng = np.random.default_rng(7)
    rows = []
    for _ in range(24):
        filler = rng.integers(FILLER_LO, FILLER_HI, size=N_FILLER)
        d = rng.choice(DIGIT_HI - DIGIT_LO, size=N_DIGITS,
                       replace=False) + DIGIT_LO
        ctx_ids = [BOS] + filler.tolist() + d.tolist()
        rows.append({
            "context": " ".join(tok_str(i) for i in ctx_ids),
            "input": "",
            "answers": [" ".join(tok_str(i) for i in d)],
            "length": len(ctx_ids) + 1,
        })
    data_dir = os.path.join(ckpt, "data")
    os.makedirs(data_dir, exist_ok=True)
    with open(os.path.join(data_dir, "filler_copy.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    run_longbench.DATASET_MAX_GEN["filler_copy"] = N_DIGITS
    run_longbench.PROMPT_TEMPLATES["filler_copy"] = \
        "{context}{input} Answer:"

    # ---- budget sweep through the real runner + scorer ----------------
    prompt_kv = 2 + N_FILLER + N_DIGITS  # BOS + filler + digits + SEP
    curve = []
    for mct in (-1, 48, 40, 32, 24):
        out_dir = os.path.join(ckpt, f"preds_m{mct}")
        run_longbench.main([
            "--model", ckpt, "--data-dir", data_dir,
            "--datasets", "filler_copy", "--out-dir", out_dir,
            "--max-cache-tokens", str(mct),
            "--protected-window-size", "8", "--dtype", "float32",
            "--max-model-len", "160", "--num-blocks", "4096",
        ])
        preds = [json.loads(l) for l in
                 open(os.path.join(out_dir, "filler_copy.jsonl"))]
        score = float(np.mean([lb_eval.qa_f1(p["pred"], p["answers"])
                               for p in preds]))
        cr = "off" if mct < 0 else round(prompt_kv / mct, 2)
        curve.append({"max_cache_tokens": mct, "compression_rate": cr,
                      "qa_f1": round(score, 4)})
        print(f"mct={mct} (cr={cr}): qa_f1={score:.4f}", flush=True)

    payload = {
        "dataset": ("filler_copy (SYNTHETIC stand-in in LongBench jsonl "
                    "format; no pretrained checkpoint reachable offline)"),
        "model": ("trained filler-prefix copier "
                  "(tests/artifacts/filler_copier.npz), served from an "
                  "exported HF checkpoint through the full "
                  "run_longbench.py -> eval.py pipeline"),
        "compress_once": True,
        "rows_per_point": len(rows),
        "reference": "experiments/run_longbench.py:63-83 + out-8b curves",
        "curve": curve,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_longbench_filler.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
