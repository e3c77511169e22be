"""HTTP TTS serving daemon (dynamic batching over one TPU process).

Loads AOT StableHLO artifacts (scripts/export_serving.py output — the
fast-boot production path: no Python model tracing, just backend-compiling
pre-lowered executables), a pipeline export (TTSPipeline.save /
scripts/import_keras_checkpoint.py output), or random weights for smoke
testing, and serves:

    POST /synthesize         {"text": "..."}  → audio/wav
    POST /synthesize_stream  {"text": "..."}  → chunked PCM16LE
    GET  /healthz, /stats

Usage:
    python scripts/serve.py --aot outputs/aot --port 8080        # fast boot
    python scripts/serve.py --pipeline outputs/exported --port 8080
    python scripts/serve.py --random_weights --port 8080         # smoke mode
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from iris_tts_tpu.models.pipeline import TTSPipeline
from iris_tts_tpu.serve import serve_forever
from scripts.common import resolve_config, setup_logging

logger = logging.getLogger(__name__)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--aot", type=Path,
                        help="AOT artifact directory "
                        "(scripts/export_serving.py output); boots in "
                        "seconds — no model tracing or Python-side compile")
    parser.add_argument("--pipeline", type=Path,
                        help="pipeline export directory (TTSPipeline.save)")
    parser.add_argument("--random_weights", action="store_true",
                        help="serve an untrained pipeline (smoke testing)")
    parser.add_argument("--config", type=str, default=None,
                        help="IrisConfig JSON for --random_weights mode")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--max_batch", type=int, default=8,
                        help="dispatch cap under light load")
    parser.add_argument("--max_batch_limit", type=int, default=None,
                        help="adaptive growth ceiling: sustained queue "
                        "depth doubles the effective batch from "
                        "--max_batch toward this (bulk throughput at "
                        "B=64-128 is ~2x the B=8 point). Opt-in: every "
                        "extra bucket is one more warmup compile — "
                        "minutes each on tunneled backends (default: no "
                        "growth)")
    parser.add_argument("--max_wait_ms", type=float, default=5.0)
    parser.add_argument("--request_timeout_s", type=float, default=600.0)
    parser.add_argument("--max_queue", type=int, default=256,
                        help="queue-depth admission limit: requests past"
                        " it get HTTP 503 + Retry-After (backpressure)")
    parser.add_argument("--mesh", action="store_true",
                        help="shard request batches data-parallel over all "
                        "visible devices (TTSPipeline.use_mesh)")
    parser.add_argument("--float_transfer", action="store_true",
                        help="fetch float32 audio instead of device-side "
                        "PCM16 (PCM16 halves the device→host bytes)")
    parser.add_argument("--full_warmup", action="store_true",
                        help="AOT path: compile every exported bucket "
                        "before opening (default: smallest bucket only, "
                        "rest in the background)")
    args = parser.parse_args()
    setup_logging()

    import time

    t0 = time.monotonic()
    if args.aot:
        from iris_tts_tpu.serve import AotPipeline

        pipe = AotPipeline(args.aot)
        if args.mesh:
            parser.error("--mesh applies to live pipelines, not --aot "
                         "(export per-shape artifacts instead)")
        if args.max_batch > max(pipe.batch_buckets):
            logger.info(
                "clamping max_batch %d → %d (largest exported batch bucket)",
                args.max_batch, max(pipe.batch_buckets),
            )
            args.max_batch = max(pipe.batch_buckets)
        if args.max_batch_limit and (
                args.max_batch_limit > max(pipe.batch_buckets)):
            args.max_batch_limit = max(pipe.batch_buckets)
        # Backend-compile the pre-lowered executables before traffic.
        # Progressive (default): the smallest bucket compiles synchronously
        # and the server opens; the rest compile on a background thread.
        logger.info("AOT warmup (backend compile of %d executables, "
                    "%s)...", len(pipe._fns),
                    "all up front" if args.full_warmup else "progressive")
        pipe.warmup(block=args.full_warmup)
        logger.info("ready in %.1fs from pipeline load (AOT path)",
                    time.monotonic() - t0)
    elif args.pipeline or args.random_weights:
        pipe = (
            TTSPipeline.load(args.pipeline) if args.pipeline
            else TTSPipeline.initialize(resolve_config(args))
        )
        if args.mesh:
            pipe.use_mesh()

        # Compile EVERY batch bucket before accepting traffic: on tunneled
        # backends the first compile of a process can take minutes, so live
        # requests must never be the ones paying it.
        logger.info("warmup compile (all batch buckets + fused path)...")
        pcm16 = not args.float_transfer
        # Fused single-utterance executables: the batcher's fast path for
        # seeded/streaming/light-traffic requests. Warm EVERY reachable
        # (phoneme-bucket, frame-bucket) pair, not just the one a short
        # probe sentence lands in — the first long live request must not
        # be the one paying a compile either.
        n_fused = pipe.warmup_fused(pcm16=pcm16)
        logger.info("fused path: %d bucket-pair executables compiled",
                    n_fused)
        # Two-stage batched executables at every (batch, phoneme, frame)
        # bucket combination traffic can reach — stage B is keyed on the
        # phoneme bucket too (the encoder output rides into it), so text
        # probes would leave most combinations cold.
        # ... up to the adaptive growth LIMIT: the first grown dispatch
        # must not pay a live compile either.
        top = max(args.max_batch, args.max_batch_limit or 0)
        batch_buckets, b = [], 1
        while b < top:
            batch_buckets.append(b)
            b *= 2
        batch_buckets.append(top)
        n_batched = pipe.warmup_batched(batch_buckets, pcm16=pcm16)
        logger.info("batched path: %d executables compiled", n_batched)
        logger.info("warmup done in %.1fs (live-jit path)",
                    time.monotonic() - t0)
    else:
        parser.error("need --aot DIR, --pipeline DIR, or --random_weights")
    serve_forever(pipe, host=args.host, port=args.port,
                  max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
                  request_timeout_s=args.request_timeout_s,
                  pcm16_transfer=not args.float_transfer,
                  max_queue=args.max_queue,
                  max_batch_limit=args.max_batch_limit)


if __name__ == "__main__":
    main()
