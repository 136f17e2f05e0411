"""LongBench scoring (the role of reference experiments/eval.py +
experiments/metrics.py): qa_f1, rouge-L, and classification accuracy over
prediction files written by run_longbench.py."""

from __future__ import annotations

import argparse
import json
import re
import string
from collections import Counter


def normalize(s: str) -> str:
    s = s.lower()
    s = "".join(ch for ch in s if ch not in string.punctuation)
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def qa_f1(pred: str, answers) -> float:
    best = 0.0
    p_toks = normalize(pred).split()
    for ans in answers:
        a_toks = normalize(ans).split()
        common = Counter(p_toks) & Counter(a_toks)
        n_same = sum(common.values())
        if n_same == 0:
            continue
        prec = n_same / len(p_toks)
        rec = n_same / len(a_toks)
        best = max(best, 2 * prec * rec / (prec + rec))
    return best


def rouge_l(pred: str, answers) -> float:
    def lcs(a, b):
        dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i, x in enumerate(a):
            for j, y in enumerate(b):
                dp[i + 1][j + 1] = (dp[i][j] + 1 if x == y
                                    else max(dp[i][j + 1], dp[i + 1][j]))
        return dp[-1][-1]

    best = 0.0
    p = normalize(pred).split()
    for ans in answers:
        a = normalize(ans).split()
        if not p or not a:
            continue
        l = lcs(p, a)
        if l == 0:
            continue
        prec, rec = l / len(p), l / len(a)
        best = max(best, 2 * prec * rec / (prec + rec))
    return best


def classification_score(pred: str, answers, all_classes) -> float:
    em = [c for c in (all_classes or []) if c in pred]
    for ans in answers:
        if ans in em:
            return 1.0 / max(len(em), 1)
    return 0.0


SCORERS = {
    "narrativeqa": qa_f1, "qasper": qa_f1, "hotpotqa": qa_f1,
    "2wikimqa": qa_f1, "musique": qa_f1, "multifieldqa_en": qa_f1,
    "gov_report": rouge_l, "qmsum": rouge_l, "multi_news": rouge_l,
    "samsum": rouge_l,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pred_files", nargs="+")
    args = p.parse_args()
    for path in args.pred_files:
        ds = path.rsplit("/", 1)[-1].removesuffix(".jsonl")
        rows = [json.loads(l) for l in open(path)]
        scorer = SCORERS.get(ds, qa_f1)
        total = 0.0
        for r in rows:
            if r.get("all_classes"):
                total += classification_score(r["pred"], r["answers"],
                                              r["all_classes"])
            else:
                total += scorer(r["pred"], r["answers"])
        print(f"{ds}: {100.0 * total / max(len(rows), 1):.2f} "
              f"({len(rows)} examples)")


if __name__ == "__main__":
    main()
