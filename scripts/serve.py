"""HTTP TTS serving daemon (dynamic batching over one TPU process).

Loads a pipeline export (TTSPipeline.save / scripts/import_keras_checkpoint.py
output) — or random weights for smoke testing — and serves:

    POST /synthesize  {"text": "..."}  → audio/wav
    GET  /healthz, /stats

Usage:
    python scripts/serve.py --pipeline outputs/exported --port 8080
    python scripts/serve.py --random_weights --port 8080   # smoke mode
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
    parser.add_argument("--pipeline", type=Path,
                        help="pipeline export directory (TTSPipeline.save)")
    parser.add_argument("--random_weights", action="store_true",
                        help="serve an untrained pipeline (smoke testing)")
    parser.add_argument("--config", type=str, default=None,
                        help="IrisConfig JSON for --random_weights mode")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--max_wait_ms", type=float, default=5.0)
    parser.add_argument("--request_timeout_s", type=float, default=600.0)
    parser.add_argument("--mesh", action="store_true",
                        help="shard request batches data-parallel over all "
                        "visible devices (TTSPipeline.use_mesh)")
    args = parser.parse_args()
    setup_logging()

    if args.pipeline:
        pipe = TTSPipeline.load(args.pipeline)
    elif args.random_weights:
        pipe = TTSPipeline.initialize(resolve_config(args))
    else:
        parser.error("need --pipeline DIR or --random_weights")

    if args.mesh:
        pipe.use_mesh()

    # Compile EVERY batch bucket before accepting traffic: on tunneled
    # backends the first compile of a process can take minutes, so live
    # requests must never be the ones paying it.
    logger.info("warmup compile (all batch buckets)...")
    b = 1
    while b < args.max_batch:
        pipe.synthesize(["warm up the jit cache."] * b, fused=False, seed=0)
        b *= 2
    pipe.synthesize(["warm up the jit cache."] * args.max_batch,
                    fused=False, seed=0)
    logger.info("warmup done")
    serve_forever(pipe, host=args.host, port=args.port,
                  max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
                  request_timeout_s=args.request_timeout_s)


if __name__ == "__main__":
    main()
