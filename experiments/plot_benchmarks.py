"""Plot throughput-vs-compression-rate curves from benchmark_throughput runs.

The role of reference experiments/plot_benchmarks.py (tok/s vs CR panels
from the benchmark sweep CSV), reshaped for our artifacts: each input is a
JSON line/file emitted by benchmarks/benchmark_throughput.py (or a
BENCH_r*.json driver record via --driver-records). Produces
<out>/throughput_vs_cr.png with output-tokens/s against compression rate
(log2 x-axis) and the uncompressed run drawn as a horizontal baseline.

Usage:
    python experiments/plot_benchmarks.py results/cr*.json --out plots/
"""

from __future__ import annotations

import argparse
import json
import os


def load_rows(paths):
    rows = []
    for p in paths:
        with open(p) as f:
            text = f.read().strip()
        for line in text.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            rec = json.loads(line)
            if "output_tokens_per_s" in rec:
                rows.append(rec)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+",
                    help="benchmark_throughput.py --output-json files")
    ap.add_argument("--out", default="plots")
    ap.add_argument("--title", default="KV-Compress throughput (TPU v5e)")
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = load_rows(args.files)
    if not rows:
        raise SystemExit("no benchmark rows found")
    base = [r for r in rows if r.get("compression_rate", 1) in (1, "off")]
    comp = sorted((r for r in rows if r not in base),
                  key=lambda r: float(r["compression_rate"]))

    os.makedirs(args.out, exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 4))
    if comp:
        ax.plot([float(r["compression_rate"]) for r in comp],
                [r["output_tokens_per_s"] for r in comp],
                marker="o", label="KV-Compress")
    for r in base:
        ax.axhline(r["output_tokens_per_s"], ls="--", c="gray",
                   label=f"uncompressed ({r['output_tokens_per_s']:.0f})")
    ax.set_xscale("log", base=2)
    ax.set_xlabel("compression rate")
    ax.set_ylabel("output tokens / s")
    ax.set_title(args.title)
    ax.legend()
    ax.grid(alpha=0.3)
    path = os.path.join(args.out, "throughput_vs_cr.png")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    print(f"wrote {path} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
