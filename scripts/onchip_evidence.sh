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
  timeout "${T:-1800}" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "rc=$? ($name)" | tee -a "$OUT/log.txt"
  tail -3 "$OUT/$name.out" | tee -a "$OUT/log.txt"
}

# 1. Headline bench (RTF, latencies, roofline fraction, cold start).
run bench python bench.py

# 2. Training throughput: f32 vs bf16 at the small and deployment batch
#    sizes (the bf16 verdict flips with batch — docs/PERF.md), plus one
#    GAN fine-tuning pair.
run train_f32  python scripts/bench_train.py --batch_size 16 --frames 1024
run train_bf16 python scripts/bench_train.py --batch_size 16 --frames 1024 --bf16
run train_f32_b128  python scripts/bench_train.py --batch_size 128 --frames 1024
run train_bf16_b128 python scripts/bench_train.py --batch_size 128 --frames 1024 --bf16
run train_gan python scripts/bench_train.py --stage gan --batch_size 16 --segment_frames 32 --iters 6

# 2b. Synthesis batch sweep (knee + bulk scaling).
run batch_sweep python scripts/bench_batch_sweep.py --batches 8,32,128 --iters 5

# 3. Roofline from the TPU backend's own cost model (falls back to CPU
#    lowering when the plugin lacks cost_analysis).
run roofline python scripts/roofline.py --json

# 4. On-chip test spots: pipeline + vocoder parity suites on the real chip.
run tests_pipeline env IRIS_TEST_PLATFORM=native python -m pytest \
    tests/test_pipeline.py tests/test_hifigan.py -q -x

# 5. Streaming-vocoder exactness on chip.
run tests_stream env IRIS_TEST_PLATFORM=native python -m pytest \
    tests/test_stream_vocode.py -q -x

# 6. Vocoder per-stage profile at the B=8 serving point (round-4
#    roofline evidence: docs/PERF.md).
run profile_vocoder_b8 python scripts/profile_vocoder.py \
    --seconds 12 --batch 8 --dtype bf16

# 7. Serving knee A/B: fixed max_batch=8 vs adaptive growth to 64,
#    one process (the jit cache is shared, so the floor is paid once).
#    The sweep must extend well past the fixed config's ~16-17 req/s
#    ceiling or the adaptive knee can't show (VERDICT r4: target >=2x).
T=3600 run serve_ab python scripts/bench_serve.py \
    --offered_qps 8,16,32,48,64 --requests 150 --pcm16 \
    --ab_max_batch_limit 64

# 8. Native serving host on chip (env-gated pjrt_runner tests: artifact
#    execute + full text→WAV request loop).
run tests_pjrt env IRIS_TEST_PLATFORM=native python -m pytest \
    tests/test_pjrt_runner.py -q

echo "done — see $OUT/" | tee -a "$OUT/log.txt"
