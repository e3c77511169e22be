"""Mesh / sharding layer: data- and model-parallel execution over TPU."""

from iris_tts_tpu.parallel.mesh import (
    build_mesh,
    data_sharding,
    initialize_multihost,
    replicate_params,
    replicated,
    shard_batch,
)
from iris_tts_tpu.parallel.pp import PipelineParallelSynthesizer

__all__ = [
    "PipelineParallelSynthesizer",
    "build_mesh",
    "data_sharding",
    "initialize_multihost",
    "replicate_params",
    "replicated",
    "shard_batch",
]
