"""Device mesh construction and process bootstrap.

The reference has **no** parallelism or distributed backend of any kind
(SURVEY.md §2.4 — verified single-process Keras loops). This module is new
TPU-native functionality: a 2-D ``(data, model)`` mesh over whatever devices
exist (1 real chip, a v5e slice, or virtual CPU devices in tests), with
process bootstrap for multi-host pods. Collectives are whatever XLA inserts
for the shardings — psum/all-gather over ICI within a slice, DCN across
slices — never hand-rolled transports.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from iris_tts_tpu.config import MeshConfig


def build_mesh(
    cfg: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh.

    ``cfg.data_parallel == 0`` means "all devices divided by model_parallel".
    Works identically on 1 real TPU, a pod slice, or N virtual CPU devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel or (n // mp)
    if dp * mp != n:
        raise ValueError(
            f"mesh {dp}x{mp} does not cover {n} devices; adjust "
            f"data_parallel/model_parallel"
        )
    dev_array = np.asarray(devices).reshape(dp, mp)
    return Mesh(dev_array, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the
    rest."""
    return NamedSharding(mesh, PartitionSpec(cfg.data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(batch, mesh: Mesh, cfg: MeshConfig = MeshConfig()):
    """Place every array in a pytree with its batch dim sharded over
    ``data``. Batch size must be divisible by the data-axis size."""
    sharding = data_sharding(mesh, cfg)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the whole mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap: one call per host before any other JAX use.

    Thin wrapper over ``jax.distributed.initialize`` (GSPMD handles the
    rest — SURVEY.md §2.4 "Multi-host launcher"). No-ops on a single
    process with no coordinator configured.
    """
    if coordinator_address is None and num_processes is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
