"""Plot accuracy-vs-compression-rate curves from the sweep artifacts.

The role of reference experiments/plot_longbench.py /
plot_longbench_categories.py (score-vs-CR panels per task), over OUR
artifacts:
- experiments/results_digit_cr_sweep.json (random-symbol-repeat sweep,
  metric-guided vs random-eviction ablation, head-bias variants), and
- experiments/results_longbench_filler.json (the LongBench-format
  synthetic filler-copier curve through run_longbench.py -> eval.py).

Usage:
    python experiments/plot_cr_sweep.py --out plots/
"""

from __future__ import annotations

import argparse
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def _cr(v):
    return 1.0 if v == "off" else float(v)


def plot_digit_sweep(ax, path):
    data = json.load(open(path))
    rows = data["results"]
    variants = {
        "metric-guided": [r for r in rows if not r.get("random_eviction")
                          and not r.get("head_bias")],
        "random eviction": [r for r in rows if r.get("random_eviction")],
        "head bias": [r for r in rows if r.get("head_bias")],
    }
    for label, rs in variants.items():
        rs = sorted(rs, key=lambda r: _cr(r["compression_rate"]))
        if not rs:
            continue
        ax.plot([_cr(r["compression_rate"]) for r in rs],
                [r["token_accuracy"] for r in rs], marker="o", label=label)
    ax.set_xscale("log", base=2)
    ax.set_xlabel("compression rate")
    ax.set_ylabel("token accuracy")
    ax.set_title(data["task"])
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)


def plot_filler_curve(ax, path):
    data = json.load(open(path))
    rows = sorted(data["curve"], key=lambda r: _cr(r["compression_rate"]))
    ax.plot([_cr(r["compression_rate"]) for r in rows],
            [r["qa_f1"] for r in rows], marker="s", color="tab:green")
    ax.set_xscale("log", base=2)
    ax.set_xlabel("compression rate")
    ax.set_ylabel("qa_f1")
    ax.set_title("filler-copier curve (SYNTHETIC LongBench-format stand-in)",
                 fontsize=9)
    ax.grid(alpha=0.3)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--digit-sweep",
                    default=os.path.join(HERE, "results_digit_cr_sweep.json"))
    ap.add_argument("--filler",
                    default=os.path.join(HERE,
                                         "results_longbench_filler.json"))
    ap.add_argument("--out", default="plots")
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.out, exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    plot_digit_sweep(axes[0], args.digit_sweep)
    plot_filler_curve(axes[1], args.filler)
    path = os.path.join(args.out, "accuracy_vs_cr.png")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
