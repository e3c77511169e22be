"""Learning-rate schedules.

The reference hand-computes warmup+cosine per *epoch* and assigns it into the
optimizer each epoch (/root/reference/scripts/train_encoder.py:162-195), plus
cosine/exponential variants with a custom warmup wrapper in
train_postnet.py:250-269. Here they are per-step optax schedules (smooth, and
compatible with jitted train steps).
"""

from __future__ import annotations

import optax


def warmup_cosine(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    final_scale: float = 0.01,
) -> optax.Schedule:
    """Linear warmup from ~0 → base_lr, then cosine decay to
    ``final_scale * base_lr`` (the reference's shape,
    train_encoder.py:162-171)."""
    warmup_steps = max(1, warmup_steps)
    decay_steps = max(1, total_steps - warmup_steps)
    return optax.warmup_cosine_decay_schedule(
        init_value=base_lr / warmup_steps,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=warmup_steps + decay_steps,
        end_value=base_lr * final_scale,
    )


def warmup_exponential(
    base_lr: float,
    warmup_steps: int,
    decay_rate: float = 0.96,
    steps_per_decay: int = 1000,
) -> optax.Schedule:
    """Linear warmup then exponential decay (train_postnet.py:250-269)."""
    warmup_steps = max(1, warmup_steps)
    warmup = optax.linear_schedule(
        init_value=base_lr / warmup_steps,
        end_value=base_lr,
        transition_steps=warmup_steps,
    )
    decay = optax.exponential_decay(
        init_value=base_lr,
        transition_steps=steps_per_decay,
        decay_rate=decay_rate,
    )
    return optax.join_schedules([warmup, decay], [warmup_steps])


def kl_weight_schedule(
    epoch: int,
    start: float = 0.001,
    end: float = 0.01,
    anneal_epochs: int = 20,
) -> float:
    """Linear KL annealing by epoch (reference: train_vae.py:232-239)."""
    if anneal_epochs <= 0:
        return end
    frac = min(1.0, max(0.0, epoch / anneal_epochs))
    return start + (end - start) * frac
