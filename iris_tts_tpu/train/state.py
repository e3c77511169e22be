"""Train state: params + optimizer + RNG + step in one checkpointable pytree.

The reference checkpoints weights only — optimizer state and RNG are lost on
resume (/root/reference/scripts/train_vae.py:241-256; SURVEY.md §5
"Checkpoint / resume"). Here the full state is a single flax struct that
Orbax checkpoints atomically, so resume is bit-exact.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    """Generic train state for any stage (encoder+duration / VAE / PostNet /
    GAN generator or discriminator)."""

    step: jnp.ndarray  # scalar int32
    params: Any  # trainable parameter pytree
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Completed-epoch counter, advanced by the training loop; resume reads
    # it directly instead of guessing from step // steps_per_epoch.
    epoch: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )
    # Non-trained collections (e.g. PostNet batch_stats); None-safe pytree.
    batch_stats: Any = None
    # Frozen companion params (e.g. pretrained encoder during VAE training,
    # reference train_vae.py:188-208). Not touched by the optimizer.
    frozen: Any = None
    # Exponential moving average of params (ema ← d·ema + (1−d)·params after
    # every update). None = disabled. Standard for GAN vocoder fine-tuning:
    # the averaged generator is what ships, the raw one keeps training.
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(
        cls,
        params: Any,
        tx: optax.GradientTransformation,
        rng: jax.Array,
        batch_stats: Any = None,
        frozen: Any = None,
        ema_decay: Optional[float] = None,
    ) -> "TrainState":
        """``ema_decay`` (e.g. 0.999) enables EMA tracking, seeded with a
        copy of ``params``. Checkpoints carry the average (it is part of the
        state pytree), so resume keeps it bit-exact like everything else."""
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng,
            batch_stats=batch_stats,
            frozen=frozen,
            # A REAL copy, not a reference: params and ema_params must not
            # alias device buffers, or a donating train step would donate
            # the same buffer twice (PJRT Execute() rejects that).
            ema_params=(
                jax.tree.map(jnp.copy, params) if ema_decay else None
            ),
            ema_decay=float(ema_decay or 0.0),
            tx=tx,
        )

    def apply_gradients(self, grads: Any, **changes) -> "TrainState":
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        new_rng, _ = jax.random.split(self.rng)
        if self.ema_params is not None and "ema_params" not in changes:
            d = self.ema_decay
            changes["ema_params"] = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p,
                self.ema_params,
                new_params,
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            rng=new_rng,
            **changes,
        )

    @property
    def serving_params(self) -> Any:
        """What inference should load: the EMA average when tracked, the raw
        params otherwise."""
        return self.ema_params if self.ema_params is not None else self.params


def adam_clipped(
    learning_rate: float | Callable[[int], float],
    clip_norm: Optional[float] = 1.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam with global-norm clipping — the reference's optimizer everywhere
    (clipnorm=1.0 at train_vae.py:259)."""
    chain = []
    if clip_norm:
        chain.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        chain.append(optax.adamw(learning_rate, weight_decay=weight_decay))
    else:
        chain.append(optax.adam(learning_rate))
    return optax.chain(*chain)
