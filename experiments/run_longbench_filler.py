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

Modes:
  default      - the short copier's mild-CR curve (budgets -1,48,40,32,24)
  --grid paper - the reference paper's CR grid {1,2,4,8,16,32,64} with
                 ablations (maxpool on/off, protected-window 8/32), run on
                 the LONG-context copier artifact
                 (tests/artifacts/filler_copier_long.npz, filler ~600-2000
                 tokens - train via train_test_copier.py --long). Matches
                 the reference's score-by-CR evidence
                 (/root/reference/experiments/run_longbench.py:63-83 +
                 README.md:78-110 KVC-w8/full configs, out-8b plots).

Writes experiments/results_longbench_filler.json (default) or
results_longbench_filler_grid.json (--grid paper).
"""

from __future__ import annotations

import argparse
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


def prepare_checkpoint(artifact, ckpt_dir, long_ctx=False):
    """Export the trained copier npz as an HF llama checkpoint with the
    WordLevel tokenizer whose SEP string is the literal 'Answer:'."""
    import dataclasses
    from kvcompress_tpu.utils.params_io import load_params_npz
    from run_longbench_synthetic import export_hf_llama

    if long_ctx:
        from tests.test_compression_exactness import (
            long_copier_model_config as _cfg)
    else:
        from tests.test_compression_exactness import (
            copier_model_config as _cfg)
    cfg = _cfg()
    params = load_params_npz(artifact)
    if "lm_head" not in params:  # tied: export untied with embed as head
        params = dict(params)
        params["lm_head"] = params["embed"]
    cfg = dataclasses.replace(cfg, tie_word_embeddings=False)
    export_hf_llama(cfg, params, ckpt_dir)

    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast
    vocab = {tok_str(i): i for i in range(cfg.vocab_size)}
    t = Tokenizer(models.WordLevel(vocab, unk_token=tok_str(1)))
    t.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=t,
                                   unk_token=tok_str(1),
                                   pad_token=tok_str(0))
    fast.save_pretrained(ckpt_dir)
    return cfg


def make_dataset(ckpt_dir, n_rows=24, n_filler=N_FILLER,
                 n_digits=N_DIGITS, seed=7, name="filler_copy"):
    """LongBench-format jsonl of filler+digit contexts; answer = digits."""
    import run_longbench
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n_rows):
        f = n_filler if np.isscalar(n_filler) else int(
            rng.integers(n_filler[0], n_filler[1]))
        filler = rng.integers(FILLER_LO, FILLER_HI, size=f)
        d = rng.choice(DIGIT_HI - DIGIT_LO, size=n_digits,
                       replace=False) + DIGIT_LO
        ctx_ids = [BOS] + filler.tolist() + d.tolist()
        rows.append({
            "context": " ".join(tok_str(i) for i in ctx_ids),
            "input": "",
            "answers": [" ".join(tok_str(i) for i in d)],
            "length": len(ctx_ids) + 1,
        })
    data_dir = os.path.join(ckpt_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    with open(os.path.join(data_dir, f"{name}.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    run_longbench.DATASET_MAX_GEN[name] = n_digits
    run_longbench.PROMPT_TEMPLATES[name] = "{context}{input} Answer:"
    return data_dir, rows


def score_budget(ckpt, data_dir, mct, *, name="filler_copy",
                 protected_window=8, no_maxpool=False, head_bias=None,
                 max_model_len=160, num_blocks=4096):
    """One run_longbench.py pass at a budget; returns mean qa_f1."""
    import run_longbench
    import eval as lb_eval
    out_dir = os.path.join(
        ckpt, f"preds_m{mct}_w{protected_window}"
              f"{'_nomax' if no_maxpool else ''}")
    argv = [
        "--model", ckpt, "--data-dir", data_dir,
        "--datasets", name, "--out-dir", out_dir,
        "--max-cache-tokens", str(mct),
        "--protected-window-size", str(protected_window),
        "--dtype", "float32",
        "--max-model-len", str(max_model_len),
        "--num-blocks", str(num_blocks),
    ]
    if no_maxpool:
        argv.append("--no-maxpool")
    if head_bias:
        argv += ["--kv-head-bias-path", head_bias]
    run_longbench.main(argv)
    preds = [json.loads(l) for l in
             open(os.path.join(out_dir, f"{name}.jsonl"))]
    return float(np.mean([lb_eval.qa_f1(p["pred"], p["answers"])
                          for p in preds]))


def _setup_backend():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    try:
        jax.config.update("jax_platforms",
                          os.environ.get("JAX_PLATFORMS", "cpu"))
    except Exception:
        pass
    os.environ.setdefault("KVC_COMPILATION_CACHE", "/tmp/kvc_filler_lb")


def main_short():
    _setup_backend()
    from tests.test_compression_exactness import _ARTIFACT
    assert os.path.exists(_ARTIFACT), "train via train_test_copier.py"
    ckpt = "/tmp/kvc_filler_longbench"
    prepare_checkpoint(_ARTIFACT, ckpt)
    data_dir, rows = make_dataset(ckpt)

    prompt_kv = 2 + N_FILLER + N_DIGITS  # BOS + filler + digits + SEP
    curve = []
    for mct in (-1, 48, 40, 32, 24):
        score = score_budget(ckpt, data_dir, mct)
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


def main_paper_grid(n_rows=16):
    """The reference paper's CR grid {1..64} with ablations, on the
    LONG-context copier (contexts ~600-2000 tokens so CR=64 still leaves
    a budget that can hold the answer digits + protected window)."""
    _setup_backend()
    from tests.test_compression_exactness import _ARTIFACT_LONG, LONG_PAD_T
    assert os.path.exists(_ARTIFACT_LONG), \
        "train via train_test_copier.py --long (minutes on the TPU chip)"
    ckpt = "/tmp/kvc_filler_longbench_grid"
    prepare_checkpoint(_ARTIFACT_LONG, ckpt, long_ctx=True)
    n_digits = 24
    data_dir, rows = make_dataset(
        ckpt, n_rows=n_rows, n_filler=(1200, 1800), n_digits=n_digits,
        seed=17, name="filler_copy_long")
    avg_kv = int(np.mean([r["length"] for r in rows]))

    grid = []
    for cr in (1, 2, 4, 8, 16, 32, 64):
        # reference cr -> budget formula (benchmark_throughput.py:391-393
        # uses max(128, .); here contexts are ~1.5k so the floor is the
        # answer+window capacity instead)
        for window, no_maxpool in ((8, False), (32, False), (8, True)):
            mct = max(n_digits + window + 8, avg_kv // cr)
            score = score_budget(
                ckpt, data_dir, mct, name="filler_copy_long",
                protected_window=window, no_maxpool=no_maxpool,
                max_model_len=LONG_PAD_T + 64, num_blocks=16384)
            grid.append({
                "cr": cr, "max_cache_tokens": mct,
                "protected_window": window,
                "maxpool": not no_maxpool,
                "qa_f1": round(score, 4)})
            print(f"cr={cr} mct={mct} w={window} "
                  f"maxpool={not no_maxpool}: qa_f1={score:.4f}",
                  flush=True)

    payload = {
        "dataset": ("filler_copy_long (SYNTHETIC LongBench-format "
                    "stand-in, contexts ~1200-1800 tokens; no pretrained "
                    "checkpoint reachable offline)"),
        "model": "long-context filler copier (filler_copier_long.npz)",
        "compress_once": True,
        "rows_per_point": len(rows),
        "avg_prompt_kv": avg_kv,
        "reference": ("paper grid: /root/reference/experiments/"
                      "run_longbench.py + README.md:78-110"),
        "grid": grid,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_longbench_filler_grid.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", choices=["short", "paper"], default="short")
    ap.add_argument("--rows", type=int, default=16)
    a = ap.parse_args()
    if a.grid == "paper":
        main_paper_grid(a.rows)
    else:
        main_short()
