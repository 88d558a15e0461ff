#!/bin/bash
# Round-5 TPU measurement queue — ONE job at a time on the tunneled chip.
# Usage: bash tools/r5_tpu_queue.sh [stage...]   (default: all stages)
set -u
export PYTHONUNBUFFERED=1
cd "$(dirname "$0")/.."
mkdir -p results

run() {
  local name="$1"; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))"
  timeout "$QT" "$@" > "results/r5_${name}.log" 2>&1
  echo "=== $name exit=$? ($(date -u +%H:%M:%S))"
  tail -2 "results/r5_${name}.log"
}

stages="${*:-kcheck ladder attnfp8 eng8b int4s256 int4s384 int4s512 prefix moe}"

for st in $stages; do
  case "$st" in
    kcheck)  QT=2400 run kcheck python tools/tpu_kernel_check.py ;;
    ladder)  QT=3000 run quality_ladder python tools/quality_ladder.py ;;
    attnfp8) QT=2400 run attn_fp8 python tools/attn_bench.py --fp8 ;;
    eng8b)   QT=4200 run eng8b_ctx512 python benchmarks/engine_decode_bench.py \
               --model 8b --seqs 168 --prompt-len 319 \
               --chunked-prefill --async-scheduling ;;
    int4s256) QT=4200 run int4_s256 python benchmarks/engine_decode_bench.py \
               --model 8b --bits 4 --seqs 256 --async-scheduling ;;
    int4s384) QT=4200 run int4_s384 python benchmarks/engine_decode_bench.py \
               --model 8b --bits 4 --seqs 384 --chunked-prefill \
               --async-scheduling ;;
    int4s512) QT=4200 run int4_s512 python benchmarks/engine_decode_bench.py \
               --model 8b --bits 4 --seqs 512 --chunked-prefill \
               --async-scheduling ;;
    prefix)  QT=3600 run prefix_cache python benchmarks/prefix_cache_bench.py ;;
    moe)     QT=3000 run moe python benchmarks/moe_decode_bench.py ;;
    *) echo "unknown stage $st" ;;
  esac
done
echo "QUEUE DONE"
