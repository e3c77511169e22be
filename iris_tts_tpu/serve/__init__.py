"""Production serving layer: dynamic batching + HTTP frontend.

New functionality beyond the reference (whose only inference entry is the
one-shot scripts/synthesize.py CLI, reference scripts/synthesize.py:64-220).
"""

from iris_tts_tpu.serve.batcher import (
    BatchItem,
    DynamicBatcher,
    ServerOverloadedError,
)
from iris_tts_tpu.serve.export import (
    AotPipeline,
    ExportedSynthesizer,
    export_pipeline,
)
from iris_tts_tpu.serve.server import TTSServer, serve_forever

__all__ = [
    "AotPipeline",
    "BatchItem",
    "DynamicBatcher",
    "ServerOverloadedError",
    "ExportedSynthesizer",
    "TTSServer",
    "export_pipeline",
    "serve_forever",
]
