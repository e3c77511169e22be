#!/bin/bash
# Collect the full on-chip evidence set in one pass (one process at a time —
# only one process can hold the TPU). Usage:
#   bash scripts/onchip_evidence.sh [outdir]
# Each step appends to $OUT; a step that cannot claim the device fails fast
# rather than blocking the rest.
set -u
OUT="$(realpath -m "${1:-onchip_evidence}")"  # absolute BEFORE the cd
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name="$1"; shift
  echo "=== $name: $*" | tee -a "$OUT/log.txt"
  timeout 1800 "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "rc=$? ($name)" | tee -a "$OUT/log.txt"
  tail -3 "$OUT/$name.out" | tee -a "$OUT/log.txt"
}

# 1. Headline bench (RTF, latencies, roofline fraction, cold start).
run bench python bench.py

# 2. Training throughput, f32 vs bf16 mixed precision.
run train_f32  python scripts/bench_train.py --batch_size 16 --frames 1024
run train_bf16 python scripts/bench_train.py --batch_size 16 --frames 1024 --bf16

# 3. Roofline from the TPU backend's own cost model (falls back to CPU
#    lowering when the plugin lacks cost_analysis).
run roofline python scripts/roofline.py --json

# 4. On-chip test spots: pipeline + vocoder parity suites on the real chip.
run tests_pipeline env IRIS_TEST_PLATFORM=native python -m pytest \
    tests/test_pipeline.py tests/test_hifigan.py -q -x

# 5. Streaming-vocoder exactness on chip.
run tests_stream env IRIS_TEST_PLATFORM=native python -m pytest \
    tests/test_stream_vocode.py -q -x

echo "done — see $OUT/" | tee -a "$OUT/log.txt"
