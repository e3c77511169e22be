"""Jitted train steps for every training stage.

One generic pattern (SURVEY.md §7 step 6) replaces the reference's three
divergent Keras trainer classes (scripts/train_encoder.py:34-52,
train_vae.py:63-106, train_postnet.py:53-76): a pure
``(TrainState, batch) → (TrainState, metrics)`` function per stage, built by
a factory that closes over the model modules. Everything runs on device —
including length regulation, which the reference bounced through numpy every
step (train_vae.py:407; SURVEY.md §3.3).

Batches are dicts of arrays with **static bucket shapes**:

* duration stage: ``phoneme_ids [B,P] int32, durations [B,P] f32,
  phoneme_mask [B,P] f32``
* vae stage: adds ``mel [B,T,n_mels] f32`` (time-major),
  with T a multiple of the VAE down factor
* postnet stage: same as vae stage
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from iris_tts_tpu.config import IrisConfig
from iris_tts_tpu.models.encoder import DurationPredictor, PhonemeEncoder
from iris_tts_tpu.models.postnet import PostNet
from iris_tts_tpu.models.vae import TextConditionedVAE
from iris_tts_tpu.ops.length import length_regulate
from iris_tts_tpu.ops.losses import (
    duration_huber_loss,
    masked_l1_loss,
    vae_loss,
)
from iris_tts_tpu.train.state import TrainState

Batch = Dict[str, jnp.ndarray]
StepFn = Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, Any]]]


# ---------------------------------------------------------------------------
# Gradient accumulation
# ---------------------------------------------------------------------------


def split_microbatches(batch: Batch, accum_steps: int) -> Batch:
    """Reshape a ``[accum·B, ...]`` host batch into the ``[accum, B, ...]``
    layout the accumulating step functions scan over."""
    def split(x):
        if x.shape[0] % accum_steps:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by "
                f"accum_steps={accum_steps}"
            )
        return x.reshape(accum_steps, x.shape[0] // accum_steps, *x.shape[1:])

    return jax.tree.map(split, batch)


def _accumulated_grads(loss_grad, params, batch, accum_steps: int):
    """Scan ``loss_grad(params, microbatch, i) → (metrics, grads)`` over the
    leading microbatch axis, averaging both. One live microbatch of
    activations at a time: the effective batch ``accum·B`` trains in the
    device memory of ``B`` (each per-microbatch masked mean gets equal
    weight, the standard accumulation convention)."""
    micro0 = jax.tree.map(lambda x: x[0], batch)
    m_struct = jax.eval_shape(
        lambda p, mb: loss_grad(p, mb, 0)[0], params, micro0
    )
    zeros = (
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), m_struct),
        jax.tree.map(jnp.zeros_like, params),
    )

    def body(carry, xs):
        i, mb = xs
        m, g = loss_grad(params, mb, i)
        return (
            jax.tree.map(jnp.add, carry[0], m),
            jax.tree.map(jnp.add, carry[1], g),
        ), None

    (m_sum, g_sum), _ = jax.lax.scan(
        body, zeros, (jnp.arange(accum_steps), batch)
    )
    inv = 1.0 / accum_steps
    return (
        jax.tree.map(lambda x: x * inv, m_sum),
        jax.tree.map(lambda x: x * inv, g_sum),
    )


# ---------------------------------------------------------------------------
# Stage 1: encoder + duration head (reference: scripts/train_encoder.py)
# ---------------------------------------------------------------------------


def make_duration_train_step(
    cfg: IrisConfig, accum_steps: int = 1, compute_dtype=None
) -> StepFn:
    """``accum_steps > 1``: the step takes batches shaped ``[accum, B, ...]``
    (see :func:`split_microbatches`) and accumulates gradients over the
    microbatches before the single optimizer update.

    ``compute_dtype=jnp.bfloat16`` enables mixed-precision training: the
    flax modules compute in bf16 while params, gradients, the optimizer
    update and the loss reductions stay f32 (bf16's f32-matched exponent
    range needs no loss scaling on TPU — the standard recipe). Roughly
    halves activation HBM traffic on the hot wall (docs/PERF.md).
    """
    dt = compute_dtype or jnp.float32
    encoder = PhonemeEncoder(config=cfg.encoder, dtype=dt)
    head = DurationPredictor(config=cfg.duration, dtype=dt)
    delta = cfg.train.duration_huber_delta

    def loss_fn(params, batch, dropout_rng):
        # Distinct streams: flax folds rngs by module path only, so sharing
        # one key would give the encoder and the head bitwise-identical
        # dropout masks (their root Dropout paths coincide).
        enc_rng, head_rng = jax.random.split(dropout_rng)
        enc = encoder.apply(
            {"params": params["encoder"]},
            batch["phoneme_ids"],
            padding_mask=batch["phoneme_mask"],
            deterministic=False,
            rngs={"dropout": enc_rng},
        )
        pred = head.apply(
            {"params": params["duration"]},
            enc,
            deterministic=False,
            rngs={"dropout": head_rng},
        )
        loss = duration_huber_loss(
            pred, batch["durations"], batch["phoneme_mask"], delta=delta
        )
        return loss, {"duration_loss": loss}

    def step(state: TrainState, batch: Batch):
        dropout_rng = jax.random.fold_in(state.rng, state.step)
        if accum_steps == 1:
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch, dropout_rng)
            return state.apply_gradients(grads), metrics

        def loss_grad(params, mb, i):
            (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb, jax.random.fold_in(dropout_rng, i)
            )
            return m, g

        metrics, grads = _accumulated_grads(
            loss_grad, state.params, batch, accum_steps
        )
        return state.apply_gradients(grads), metrics

    return step


def make_duration_eval_step(cfg: IrisConfig):
    encoder = PhonemeEncoder(config=cfg.encoder)
    head = DurationPredictor(config=cfg.duration)
    delta = cfg.train.duration_huber_delta

    def step(params, batch: Batch):
        enc = encoder.apply(
            {"params": params["encoder"]},
            batch["phoneme_ids"],
            padding_mask=batch["phoneme_mask"],
        )
        pred = head.apply({"params": params["duration"]}, enc)
        loss = duration_huber_loss(
            pred, batch["durations"], batch["phoneme_mask"], delta=delta
        )
        # Linear-space MAE for the quality rubric
        # (reference: scripts/test_trained_encoder.py:239-263).
        lin = jnp.exp(pred) - 1.0
        mask = batch["phoneme_mask"]
        mae = jnp.sum(jnp.abs(lin - batch["durations"]) * mask) / (
            jnp.sum(mask) + 1e-8
        )
        return {"duration_loss": loss, "duration_mae_frames": mae}

    return step


# ---------------------------------------------------------------------------
# Stage 2: VAE with frozen encoder (reference: scripts/train_vae.py)
# ---------------------------------------------------------------------------


def _frame_condition(encoder, frozen, batch):
    """Device-side frame conditioning: frozen encoder + length regulation
    (replaces the reference's per-step numpy searchsorted bounce,
    train_vae.py:31-61,407)."""
    enc = encoder.apply(
        {"params": frozen["encoder"]},
        batch["phoneme_ids"],
        padding_mask=batch["phoneme_mask"],
    )
    total_frames = batch["mel"].shape[1]
    durations = batch["durations"].astype(jnp.int32) * batch[
        "phoneme_mask"
    ].astype(jnp.int32)
    cond, frame_mask = length_regulate(enc, durations, total_frames)
    return cond, frame_mask


def make_vae_train_step(
    cfg: IrisConfig, accum_steps: int = 1, compute_dtype=None,
    remat: bool = False,
) -> StepFn:
    """``accum_steps > 1``: batches arrive ``[accum, B, ...]`` and gradients
    accumulate across microbatches (one optimizer update, one live
    microbatch of WaveNet activations at a time — the VAE stage is the
    memory-heavy one, so this is where large effective batches need it).

    ``compute_dtype=jnp.bfloat16``: mixed-precision compute, f32
    params/grads/loss (see :func:`make_duration_train_step`).

    ``remat=True`` rematerializes the WaveNet blocks' activations in the
    backward pass (jax.checkpoint) — the VAE stage is the memory-heavy
    one, and remat trades one extra block forward for ~num_blocks× less
    activation HBM, buying bigger batches / longer mels per chip.
    Forward losses are bit-identical (same rng threading); gradients
    agree up to float reassociation (~1e-10, pinned under SGD in tests).
    """
    dt = compute_dtype or jnp.float32
    encoder = PhonemeEncoder(config=cfg.encoder, dtype=dt)
    vae = TextConditionedVAE(config=cfg.vae, dtype=dt, remat=remat)
    down_factor = cfg.vae.down_factor

    flow_prior = cfg.vae.flow_prior

    def loss_fn(params, frozen, batch, rng, kl_weight):
        cond, frame_mask = _frame_condition(encoder, frozen, batch)
        sample_rng, dropout_rng = jax.random.split(rng)
        out = vae.apply(
            {"params": params},
            batch["mel"],
            cond,
            deterministic=False,
            return_u=flow_prior,
            rngs={"sample": sample_rng, "dropout": dropout_rng},
        )
        recon, (mean, logvar) = out[0], out[1]
        u = out[3] if flow_prior else None
        total, metrics = vae_loss(
            batch["mel"], recon, mean, logvar, frame_mask,
            down_factor, kl_weight, u=u,
        )
        return total, metrics

    def step(state: TrainState, batch: Batch, kl_weight: jnp.ndarray):
        rng = jax.random.fold_in(state.rng, state.step)
        if accum_steps == 1:
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.frozen, batch, rng, kl_weight)
            return state.apply_gradients(grads), metrics

        def loss_grad(params, mb, i):
            (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, state.frozen, mb,
                jax.random.fold_in(rng, i), kl_weight,
            )
            return m, g

        metrics, grads = _accumulated_grads(
            loss_grad, state.params, batch, accum_steps
        )
        return state.apply_gradients(grads), metrics

    return step


def make_vae_recon_step(cfg: IrisConfig):
    """Deterministic VAE reconstruction (posterior mean) for quality
    evaluation: (params, frozen, batch) → (recon [B,T,n_mels], frame_mask).
    Feeds host-side MCD/LSD scoring (utils.metrics.quality_report) in
    scripts/validate_vae_checkpoint.py."""
    encoder = PhonemeEncoder(config=cfg.encoder)
    vae = TextConditionedVAE(config=cfg.vae)

    def step(params, frozen, batch: Batch):
        cond, frame_mask = _frame_condition(encoder, frozen, batch)
        recon, _, _ = vae.apply({"params": params}, batch["mel"], cond)
        return recon, frame_mask

    return step


def make_vae_eval_step(cfg: IrisConfig):
    encoder = PhonemeEncoder(config=cfg.encoder)
    vae = TextConditionedVAE(config=cfg.vae)
    down_factor = cfg.vae.down_factor

    flow_prior = cfg.vae.flow_prior

    def step(params, frozen, batch: Batch, kl_weight):
        cond, frame_mask = _frame_condition(encoder, frozen, batch)
        out = vae.apply(
            {"params": params}, batch["mel"], cond, return_u=flow_prior
        )
        recon, (mean, logvar) = out[0], out[1]
        # flow_prior: val KL against the FLOW prior (deterministic z=mean
        # sample), same objective the train step optimizes — scoring it
        # against N(0,I) would report a meaninglessly large number.
        u = out[3] if flow_prior else None
        _, metrics = vae_loss(
            batch["mel"], recon, mean, logvar, frame_mask,
            down_factor, kl_weight, u=u,
        )
        return metrics

    return step


# ---------------------------------------------------------------------------
# Stage 3: PostNet over frozen encoder+VAE (reference: scripts/train_postnet.py)
# ---------------------------------------------------------------------------


def make_postnet_train_step(cfg: IrisConfig, compute_dtype=None) -> StepFn:
    """``compute_dtype=jnp.bfloat16``: mixed-precision compute, f32
    params/grads/loss (see :func:`make_duration_train_step`)."""
    dt = compute_dtype or jnp.float32
    encoder = PhonemeEncoder(config=cfg.encoder, dtype=dt)
    vae = TextConditionedVAE(config=cfg.vae, dtype=dt)
    postnet = PostNet(config=cfg.postnet, dtype=dt)

    def loss_fn(params, batch_stats, frozen, batch, rng):
        cond, frame_mask = _frame_condition(encoder, frozen, batch)
        # Frozen VAE reconstruction (eval mode: z = posterior mean).
        recon, _, _ = vae.apply(
            {"params": frozen["vae"]}, batch["mel"], cond
        )
        recon = jax.lax.stop_gradient(recon)
        refined, updates = postnet.apply(
            {"params": params, "batch_stats": batch_stats},
            recon,
            deterministic=False,
            use_running_average=False,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        loss = masked_l1_loss(batch["mel"], refined, frame_mask)
        return loss, (updates["batch_stats"], {"postnet_l1": loss})

    def step(state: TrainState, batch: Batch):
        rng = jax.random.fold_in(state.rng, state.step)
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, state.frozen, batch, rng)
        return (
            state.apply_gradients(grads, batch_stats=new_stats),
            metrics,
        )

    return step
