"""Masked training losses.

The exact masking/denominator conventions matter for training parity with the
reference (SURVEY.md §7 hard-part 4): each function documents the reference
definition it matches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def duration_huber_loss(
    pred_log_durations: jnp.ndarray,
    target_durations: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    delta: float = 10.0,
) -> jnp.ndarray:
    """Huber loss on durations in linear space.

    Matches /root/reference/src/iris/encoder.py:437-482: predictions are the
    duration head's softplus outputs interpreted as log(d+1), inverted with
    ``exp(p) - 1``; Huber with delta in frames; masked mean with +1e-8
    denominator guard.

    Args:
        pred_log_durations: [B, P] or [B, P, 1] head outputs.
        target_durations: [B, P] ground-truth frame counts (float).
        mask: optional [B, P] validity mask.
    """
    if pred_log_durations.ndim == target_durations.ndim + 1:
        pred_log_durations = pred_log_durations[..., 0]
    # All losses reduce in f32 regardless of the model's compute dtype:
    # a bf16 sum over thousands of elements loses mass (701 ones sum to
    # 700.0 — see pipeline.py's frame-count note), skewing both the
    # logged metric and the 1/sum(mask) gradient scale.
    pred_log_durations = pred_log_durations.astype(jnp.float32)
    target_durations = target_durations.astype(jnp.float32)
    pred = jnp.exp(pred_log_durations) - 1.0
    diff = pred - target_durations
    abs_diff = jnp.abs(diff)
    huber = jnp.where(
        abs_diff <= delta,
        0.5 * jnp.square(diff),
        delta * (abs_diff - 0.5 * delta),
    )
    if mask is not None:
        mask = mask.astype(huber.dtype)
        return jnp.sum(huber * mask) / (jnp.sum(mask) + 1e-8)
    return jnp.mean(huber)


def masked_l1_loss(
    target: jnp.ndarray,
    pred: jnp.ndarray,
    frame_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked mean-absolute-error over mel frames.

    Matches ``TextConditionedVAE.compute_recon_l1``
    (/root/reference/src/iris/vae.py:438-446): denominator is
    ``sum(mask) * n_mels + 1e-6``.

    Args:
        target/pred: [B, T, n_mels] (time-major layout).
        frame_mask: optional [B, T].
    """
    diff = jnp.abs(target.astype(jnp.float32) - pred.astype(jnp.float32))
    if frame_mask is not None:
        m = frame_mask.astype(diff.dtype)[..., None]  # [B, T, 1]
        n_mels = jnp.asarray(diff.shape[-1], diff.dtype)
        return jnp.sum(diff * m) / (jnp.sum(m) * n_mels + 1e-6)
    return jnp.mean(diff)


def kl_divergence(
    mean: jnp.ndarray,
    logvar: jnp.ndarray,
    latent_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """KL(N(mean, exp(logvar)) || N(0, I)), masked mean.

    Matches ``TextConditionedVAE.compute_kl``
    (/root/reference/src/iris/vae.py:424-436): per-element KL, masked by the
    latent-rate mask (the frame mask strided by the downsample factor in the
    trainer, train_vae.py:96-103), denominator ``sum(mask) + 1e-8``.

    Args:
        mean/logvar: [B, T', latent_dim].
        latent_mask: optional [B, T'].
    """
    mean = mean.astype(jnp.float32)      # f32 reductions (see above)
    logvar = logvar.astype(jnp.float32)
    kl = -0.5 * (1.0 + logvar - jnp.square(mean) - jnp.exp(logvar))
    if latent_mask is not None:
        m = latent_mask.astype(kl.dtype)[..., None]  # [B, T', 1]
        return jnp.sum(kl * m) / (jnp.sum(m) + 1e-8)
    return jnp.mean(kl)


def flow_prior_kl(
    mean: jnp.ndarray,
    logvar: jnp.ndarray,
    u: jnp.ndarray,
    latent_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Monte-Carlo KL(q(z|x) ‖ p_flow(z)) for the flow-prior VAE.

    The prior is N(0,I) pulled back through the volume-preserving flow
    (unit Jacobian), so with one posterior sample z and u = flow(z):
    KL ≈ −H(q) − log p(z) = −½Σ(1+logvar) + ½Σu²  (per masked position,
    constants cancel). Gradients flow into the flow params through u —
    this term IS the flow's maximum-likelihood prior training
    (PortaSpeech), and into the posterior through both terms.
    """
    logvar = logvar.astype(jnp.float32)
    u = u.astype(jnp.float32)
    kl = 0.5 * jnp.square(u) - 0.5 * (1.0 + logvar)
    del mean  # enters through u = flow(mean + std·eps)
    if latent_mask is not None:
        m = latent_mask.astype(kl.dtype)[..., None]
        return jnp.sum(kl * m) / (jnp.sum(m) + 1e-8)
    return jnp.mean(kl)


def vae_loss(
    target_mel: jnp.ndarray,
    recon_mel: jnp.ndarray,
    mean: jnp.ndarray,
    logvar: jnp.ndarray,
    frame_mask: jnp.ndarray,
    down_factor: int,
    kl_weight: jnp.ndarray,
    u: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Composite VAE loss = masked L1 + kl_weight * masked KL.

    Matches ``VAETrainer.compute_loss`` (/root/reference/scripts/
    train_vae.py:88-106) including the latent mask being the frame mask
    strided by the downsample factor. With ``u`` (the flow image of the
    sampled latent) the KL is taken against the FLOW prior instead of
    N(0,I) — the ``VAEConfig.flow_prior`` training objective.
    """
    recon = masked_l1_loss(target_mel, recon_mel, frame_mask)
    latent_mask = frame_mask[:, ::down_factor]
    if u is not None:
        kl = flow_prior_kl(mean, logvar, u, latent_mask)
    else:
        kl = kl_divergence(mean, logvar, latent_mask)
    total = recon + kl_weight * kl
    return total, {"recon_l1": recon, "kl": kl, "total": total}


# ---------------------------------------------------------------------------
# GAN losses (HiFiGAN fine-tune — new functionality; the reference only
# gestures at GAN training, demo_vocoder.py:139-142 / SURVEY.md §7 step 7)
# ---------------------------------------------------------------------------


def lsgan_discriminator_loss(real_outputs, fake_outputs) -> jnp.ndarray:
    """Least-squares GAN discriminator loss (HiFi-GAN paper, eq. 1).
    Reduces in f32 even for bf16 discriminator logits (see above)."""
    loss = 0.0
    for dr, df in zip(real_outputs, fake_outputs):
        dr = dr.astype(jnp.float32)
        df = df.astype(jnp.float32)
        loss += jnp.mean(jnp.square(dr - 1.0)) + jnp.mean(jnp.square(df))
    return loss


def lsgan_generator_loss(fake_outputs) -> jnp.ndarray:
    """Least-squares GAN generator adversarial loss (HiFi-GAN paper, eq. 2).
    Reduces in f32 even for bf16 discriminator logits (see above)."""
    loss = 0.0
    for df in fake_outputs:
        loss += jnp.mean(jnp.square(df.astype(jnp.float32) - 1.0))
    return loss


def feature_matching_loss(real_features, fake_features) -> jnp.ndarray:
    """L1 feature-matching loss over all discriminator feature maps.
    Reduces in f32 even for bf16 feature maps (see above)."""
    loss = 0.0
    for reals, fakes in zip(real_features, fake_features):
        for r, f in zip(reals, fakes):
            loss += jnp.mean(jnp.abs(
                r.astype(jnp.float32) - f.astype(jnp.float32)
            ))
    return loss
