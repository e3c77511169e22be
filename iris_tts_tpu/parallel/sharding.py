"""Parameter sharding rules (tensor-parallel hooks).

The models here are small enough that data parallelism alone reaches parity
(SURVEY.md §2.4 notes TP "not required for parity; leave mesh-axis hooks").
These rules are those hooks: wide channel dimensions (transformer FFN,
HiFiGAN/VAE conv channels) shard over the ``model`` axis when the mesh has
one; everything else replicates. XLA/GSPMD inserts the matching collectives.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from iris_tts_tpu.config import MeshConfig


def tp_param_sharding(
    params: Any,
    mesh: Mesh,
    cfg: MeshConfig = MeshConfig(),
    min_dim: int = 8,
) -> Any:
    """Place a parameter pytree on ``mesh``: shard the trailing (output-
    channel) dim over the model axis where it divides evenly and is wide
    enough; replicate the rest.

    With ``model_parallel == 1`` this degrades to full replication, so the
    same code path serves single-chip and TP runs.
    """
    model_size = mesh.shape[cfg.model_axis]

    def place(x):
        if (
            model_size > 1
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[-1] >= min_dim
            and x.shape[-1] % model_size == 0
        ):
            spec = PartitionSpec(
                *([None] * (x.ndim - 1)), cfg.model_axis
            )
        else:
            spec = PartitionSpec()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def batch_sharding_tree(batch: Any, mesh: Mesh, cfg: MeshConfig = MeshConfig()):
    """Shard every array's leading (batch) dim over the data axis.

    Alias of :func:`iris_tts_tpu.parallel.mesh.shard_batch` (kept for the
    existing callers; one implementation so fixes cannot diverge)."""
    from iris_tts_tpu.parallel.mesh import shard_batch

    return shard_batch(batch, mesh, cfg)
