#!/usr/bin/env bash
# 70B sweep shape (reference benchmarks/scripts/benchmark_llama3_70b.sh):
# requires an 8-chip v5e slice (TP=8) — see
# experiments/results_70b_feasibility.json for the per-shard budget. Runs
# the same sweep as the 8B script with tensor_parallel_size=8 via the CLI.
set -euo pipefail
MODEL=${MODEL:?set MODEL=/path/to/llama-3.1-70b-fp8}
OUT=${OUT:-bench_sweep_70b}
PROMPTS=${PROMPTS:-64}
mkdir -p "$OUT"
for CR in 8 16 32 64; do
  python benchmarks/benchmark_throughput.py --model "$MODEL" \
    --num-prompts "$PROMPTS" --input-len 6000 --output-len 500 \
    --enable-kvc --compression-rate "$CR" --protected-window-size 32 \
    --output-json "$OUT/cr$CR.json"
done
python experiments/plot_benchmarks.py "$OUT"/*.json --out "$OUT"
