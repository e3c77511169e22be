"""Export a pipeline as AOT StableHLO serving artifacts.

Serializes the fused synthesis executable per (batch, phoneme-bucket)
shape with parameters baked in (jax.export), plus the vocab and a
manifest — a deployable directory that any PJRT runtime can serve without
this repo's model code. See iris_tts_tpu/serve/export.py.

Usage:
    python scripts/export_serving.py --pipeline outputs/exported \
        --output outputs/aot --batch_sizes 1 8 --phoneme_buckets 64 256
    # cross-lower for TPU from a CPU host:
    python scripts/export_serving.py ... --platforms tpu
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from iris_tts_tpu.models.pipeline import TTSPipeline
from iris_tts_tpu.serve.export import export_pipeline
from scripts.common import resolve_config, setup_logging

logger = logging.getLogger(__name__)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pipeline", type=Path,
                        help="pipeline export dir (TTSPipeline.save)")
    parser.add_argument("--random_weights", action="store_true")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--batch_sizes", type=int, nargs="+", default=[1, 8])
    parser.add_argument("--phoneme_buckets", type=int, nargs="+",
                        default=None)
    parser.add_argument("--platforms", nargs="+", default=None,
                        help="lowering platforms, e.g. 'tpu' to cross-lower "
                        "from a CPU host")
    parser.add_argument("--vocode_chunk_frames", type=int, default=None,
                        help="also export a streaming-vocoder window "
                        "executable with this chunk size (AotPipeline."
                        "vocode_streaming: long mels -> audio in O(chunk) "
                        "memory, no Python model code)")
    parser.add_argument("--vocode_context_frames", type=int, default=None,
                        help="context per side for the vocoder window "
                        "(default: the generator's receptive-field radius)")
    args = parser.parse_args()
    setup_logging()

    if args.platforms:
        # Cross-lowering is pure tracing + StableHLO serialization for the
        # NAMED platforms — the host backend is irrelevant. Pin the host to
        # CPU before any device use so an environment that pre-selects a
        # hardware plugin (site customization) doesn't drag export through
        # the remote compile service (measured: 409s -> seconds).
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
            logger.info("cross-lowering for %s: host pinned to CPU",
                        args.platforms)
        except Exception:  # noqa: BLE001 — backend already initialized
            pass

    if args.pipeline:
        pipe = TTSPipeline.load(args.pipeline)
    elif args.random_weights:
        pipe = TTSPipeline.initialize(resolve_config(args))
    else:
        parser.error("need --pipeline DIR or --random_weights")

    out = export_pipeline(
        pipe, args.output,
        batch_sizes=args.batch_sizes,
        phoneme_buckets=args.phoneme_buckets,
        platforms=args.platforms,
        vocode_chunk_frames=args.vocode_chunk_frames,
        vocode_context_frames=args.vocode_context_frames,
    )
    logger.info("wrote serving artifacts to %s", out)


if __name__ == "__main__":
    main()
