"""HiFiGAN adversarial fine-tuning: generator + discriminator steps.

**New functionality** — the reference ships no GAN training
(SURVEY.md §2.1 "no GAN training loop/discriminators exist anywhere";
BASELINE.json config 5 requires it). Losses follow the HiFi-GAN paper
(arXiv:2010.05646): LSGAN adversarial + feature matching (λ_fm = 2) +
mel-spectrogram L1 (λ_mel = 45), computed with the framework's own
device-side mel extractor so the whole step is one jitted program.

Batches: ``{"mel": [B, T, n_mels], "audio": [B, T * hop]}`` with static
bucket shapes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from iris_tts_tpu.config import AudioConfig, IrisConfig
from iris_tts_tpu.models.discriminators import HiFiGANDiscriminators
from iris_tts_tpu.models.hifigan import HiFiGANGenerator
from iris_tts_tpu.ops.losses import (
    feature_matching_loss,
    lsgan_discriminator_loss,
    lsgan_generator_loss,
)
from iris_tts_tpu.ops.stft import log_mel_spectrogram
from iris_tts_tpu.train.state import TrainState

LAMBDA_FM = 2.0
LAMBDA_MEL = 45.0


def make_gan_steps(
    cfg: IrisConfig,
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11),
    num_scales: int = 3,
    disc_width: float = 1.0,
    accum_steps: int = 1,
    compute_dtype=None,
    remat: bool = False,
):
    """Returns (discriminator_step, generator_step).

    Each is ``(gen_state, disc_state, batch) → (new_state, metrics)`` for its
    own side; alternate them per batch as in the paper. ``periods`` /
    ``num_scales`` configure the MPD/MSD (defaults per arXiv:2010.05646).

    ``accum_steps > 1``: batches arrive ``[accum, B, ...]``
    (:func:`~iris_tts_tpu.train.steps.split_microbatches`) and each side
    accumulates averaged gradients over the microbatches before its single
    optimizer update — GAN fine-tuning holds generator + both discriminator
    towers live, so this is where memory pressure peaks.
    """
    from iris_tts_tpu.train.steps import _accumulated_grads

    dt = compute_dtype or jnp.float32
    gen = HiFiGANGenerator(config=cfg.hifigan, dtype=dt, remat=remat)
    disc = HiFiGANDiscriminators(
        periods=periods, num_scales=num_scales, width=disc_width, dtype=dt
    )
    audio_cfg: AudioConfig = cfg.audio

    def _generate(gen_params, mel):
        return gen.apply({"params": gen_params}, mel)

    # -- discriminator ------------------------------------------------------

    def disc_loss_fn(disc_params, gen_params, batch):
        fake = jax.lax.stop_gradient(_generate(gen_params, batch["mel"]))
        real_logits, _ = disc.apply({"params": disc_params}, batch["audio"])
        fake_logits, _ = disc.apply({"params": disc_params}, fake)
        loss = lsgan_discriminator_loss(real_logits, fake_logits)
        return loss, {"disc_loss": loss}

    def disc_step(
        gen_state: TrainState, disc_state: TrainState, batch
    ) -> Tuple[TrainState, Dict]:
        if accum_steps == 1:
            (_, metrics), grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(disc_state.params, gen_state.params, batch)
            return disc_state.apply_gradients(grads), metrics

        def loss_grad(params, mb, _i):
            (_, m), g = jax.value_and_grad(disc_loss_fn, has_aux=True)(
                params, gen_state.params, mb
            )
            return m, g

        metrics, grads = _accumulated_grads(
            loss_grad, disc_state.params, batch, accum_steps
        )
        return disc_state.apply_gradients(grads), metrics

    # -- generator ----------------------------------------------------------

    def gen_loss_fn(gen_params, disc_params, batch):
        fake = _generate(gen_params, batch["mel"])
        fake_logits, fake_feats = disc.apply({"params": disc_params}, fake)
        _, real_feats = disc.apply({"params": disc_params}, batch["audio"])

        adv = lsgan_generator_loss(fake_logits)
        fm = feature_matching_loss(real_feats, fake_feats)
        # impl="xla": gradients flow through the fake mel; the Pallas
        # feature kernel (IRIS_MEL_IMPL=pallas) is forward-only.
        fake_mel = log_mel_spectrogram(fake, audio_cfg, impl="xla")
        real_mel = log_mel_spectrogram(batch["audio"], audio_cfg, impl="xla")
        mel_l1 = jnp.mean(jnp.abs(fake_mel - real_mel))

        total = adv + LAMBDA_FM * fm + LAMBDA_MEL * mel_l1
        return total, {
            "gen_adv": adv,
            "gen_fm": fm,
            "gen_mel_l1": mel_l1,
            "gen_total": total,
        }

    def gen_step(
        gen_state: TrainState, disc_state: TrainState, batch
    ) -> Tuple[TrainState, Dict]:
        if accum_steps == 1:
            (_, metrics), grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True
            )(gen_state.params, disc_state.params, batch)
            return gen_state.apply_gradients(grads), metrics

        def loss_grad(params, mb, _i):
            (_, m), g = jax.value_and_grad(gen_loss_fn, has_aux=True)(
                params, disc_state.params, mb
            )
            return m, g

        metrics, grads = _accumulated_grads(
            loss_grad, gen_state.params, batch, accum_steps
        )
        return gen_state.apply_gradients(grads), metrics

    return disc_step, gen_step
