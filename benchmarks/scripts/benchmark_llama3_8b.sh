#!/usr/bin/env bash
# Canonical Llama-3.1-8B throughput sweep (the role of reference
# benchmarks/scripts/benchmark_llama3_8b.sh): output tok/s at input 6000 /
# output 500 across compression rates, plus the uncompressed baseline,
# then the throughput-vs-CR plot. Point MODEL at a local Llama-3.1-8B
# checkpoint directory (safetensors/.bin/GGUF all work).
set -euo pipefail
MODEL=${MODEL:?set MODEL=/path/to/llama-3.1-8b}
OUT=${OUT:-bench_sweep}
PROMPTS=${PROMPTS:-64}
mkdir -p "$OUT"
for CR in 8 16 32 64; do
  python benchmarks/benchmark_throughput.py --model "$MODEL" \
    --num-prompts "$PROMPTS" --input-len 6000 --output-len 500 \
    --enable-kvc --compression-rate "$CR" --protected-window-size 32 \
    --output-json "$OUT/cr$CR.json"
done
python benchmarks/benchmark_throughput.py --model "$MODEL" \
  --num-prompts "$PROMPTS" --input-len 6000 --output-len 500 \
  --output-json "$OUT/uncompressed.json"
python experiments/plot_benchmarks.py "$OUT"/*.json --out "$OUT"
