"""Mesh / sharding layer: data- and model-parallel execution over TPU."""

from iris_tts_tpu.parallel.mesh import (
    build_mesh,
    data_sharding,
    initialize_multihost,
    replicate_params,
    replicated,
    shard_batch,
)

__all__ = [
    "build_mesh",
    "data_sharding",
    "initialize_multihost",
    "replicate_params",
    "replicated",
    "shard_batch",
]
