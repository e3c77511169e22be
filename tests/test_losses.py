"""Tests for masked-loss denominator conventions (SURVEY.md §7 hard-part 4)."""

import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.ops import losses as Lo


def test_duration_huber_matches_reference_arithmetic():
    # Reference: encoder.py:437-482 — invert exp(p)-1, Huber delta=10,
    # masked mean with +1e-8 guard.
    pred_log = np.array([[0.5, 2.0, 0.0]], dtype=np.float32)
    target = np.array([[1.0, 50.0, 3.0]], dtype=np.float32)
    mask = np.array([[1.0, 1.0, 0.0]], dtype=np.float32)

    pred_lin = np.exp(pred_log) - 1.0
    diff = pred_lin - target
    delta = 10.0
    huber = np.where(
        np.abs(diff) <= delta,
        0.5 * diff**2,
        delta * (np.abs(diff) - 0.5 * delta),
    )
    want = (huber * mask).sum() / (mask.sum() + 1e-8)

    got = Lo.duration_huber_loss(
        jnp.asarray(pred_log), jnp.asarray(target), jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-6)


def test_duration_huber_accepts_trailing_dim():
    p = jnp.zeros((2, 3, 1))
    t = jnp.ones((2, 3))
    a = Lo.duration_huber_loss(p, t)
    b = Lo.duration_huber_loss(p[..., 0], t)
    np.testing.assert_allclose(float(a), float(b))


def test_masked_l1_denominator_convention():
    # Reference vae.py:438-446: sum(|d|*m) / (sum(m)*n_mels + 1e-6).
    rng = np.random.default_rng(0)
    target = rng.standard_normal((2, 4, 3)).astype(np.float32)
    pred = rng.standard_normal((2, 4, 3)).astype(np.float32)
    mask = np.array([[1, 1, 0, 0], [1, 1, 1, 0]], dtype=np.float32)

    diff = np.abs(target - pred) * mask[..., None]
    want = diff.sum() / (mask.sum() * 3 + 1e-6)
    got = Lo.masked_l1_loss(
        jnp.asarray(target), jnp.asarray(pred), jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-6)


def test_kl_zero_at_standard_normal():
    mean = jnp.zeros((2, 5, 4))
    logvar = jnp.zeros((2, 5, 4))
    assert float(Lo.kl_divergence(mean, logvar)) == 0.0


def test_kl_masked_matches_reference_arithmetic():
    rng = np.random.default_rng(1)
    mean = rng.standard_normal((1, 4, 2)).astype(np.float32)
    logvar = rng.standard_normal((1, 4, 2)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0]], dtype=np.float32)
    kl = -0.5 * (1 + logvar - mean**2 - np.exp(logvar))
    want = (kl * mask[..., None]).sum() / (mask.sum() + 1e-8)
    got = Lo.kl_divergence(
        jnp.asarray(mean), jnp.asarray(logvar), jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_vae_loss_strided_latent_mask():
    # Reference train_vae.py:96-103: latent mask = frame mask [:, ::factor].
    rng = np.random.default_rng(2)
    B, T, M, F = 2, 8, 3, 4
    target = rng.standard_normal((B, T, M)).astype(np.float32)
    recon = rng.standard_normal((B, T, M)).astype(np.float32)
    mean = rng.standard_normal((B, T // F, 2)).astype(np.float32)
    logvar = rng.standard_normal((B, T // F, 2)).astype(np.float32)
    fmask = np.ones((B, T), dtype=np.float32)
    fmask[0, 5:] = 0.0

    total, metrics = Lo.vae_loss(
        jnp.asarray(target),
        jnp.asarray(recon),
        jnp.asarray(mean),
        jnp.asarray(logvar),
        jnp.asarray(fmask),
        down_factor=F,
        kl_weight=jnp.asarray(0.01),
    )
    want_recon = float(
        Lo.masked_l1_loss(
            jnp.asarray(target), jnp.asarray(recon), jnp.asarray(fmask)
        )
    )
    want_kl = float(
        Lo.kl_divergence(
            jnp.asarray(mean), jnp.asarray(logvar), jnp.asarray(fmask[:, ::F])
        )
    )
    np.testing.assert_allclose(float(metrics["recon_l1"]), want_recon, rtol=1e-6)
    np.testing.assert_allclose(float(metrics["kl"]), want_kl, rtol=1e-6)
    np.testing.assert_allclose(
        float(total), want_recon + 0.01 * want_kl, rtol=1e-6
    )


def test_gan_losses_basic():
    real = [jnp.ones((2, 5)), jnp.ones((2, 3))]
    fake = [jnp.zeros((2, 5)), jnp.zeros((2, 3))]
    assert float(Lo.lsgan_discriminator_loss(real, fake)) == 0.0
    assert float(Lo.lsgan_generator_loss(fake)) == 2.0
    feats_r = [[jnp.ones((2, 4))], [jnp.zeros((2, 4))]]
    feats_f = [[jnp.zeros((2, 4))], [jnp.zeros((2, 4))]]
    assert float(Lo.feature_matching_loss(feats_r, feats_f)) == 1.0


def test_losses_reduce_in_f32_for_bf16_inputs():
    """bf16 model outputs must not reduce in bf16: a bf16 sum over
    thousands of elements loses mass (701 ones sum to 700.0), skewing
    metrics and the 1/sum(mask) gradient scale."""
    import jax.numpy as jnp

    from iris_tts_tpu.ops.losses import (
        feature_matching_loss,
        kl_divergence,
        lsgan_discriminator_loss,
        lsgan_generator_loss,
        masked_l1_loss,
    )

    n = 4097  # past bf16's integer-exact range
    mean = jnp.ones((1, n, 2), jnp.bfloat16) * 0.5
    logvar = jnp.zeros((1, n, 2), jnp.bfloat16)
    mask = jnp.ones((1, n), jnp.bfloat16)
    kl = kl_divergence(mean, logvar, mask)
    assert kl.dtype == jnp.float32
    # 0.125 per element, summed over latent_dim=2 per masked position
    # (denominator counts positions, reference convention) → 0.25
    assert abs(float(kl) - 0.25) < 1e-5

    t = jnp.ones((1, n, 4), jnp.bfloat16)
    p = jnp.zeros((1, n, 4), jnp.bfloat16)
    l1 = masked_l1_loss(t, p, jnp.ones((1, n), jnp.bfloat16))
    assert l1.dtype == jnp.float32 and abs(float(l1) - 1.0) < 1e-3

    logits = [jnp.full((2, n), 0.5, jnp.bfloat16)]
    d = lsgan_discriminator_loss(logits, logits)
    g = lsgan_generator_loss(logits)
    assert d.dtype == jnp.float32 and abs(float(d) - 0.5) < 1e-5
    assert g.dtype == jnp.float32 and abs(float(g) - 0.25) < 1e-5
    fm = feature_matching_loss([[t]], [[p]])
    assert fm.dtype == jnp.float32 and abs(float(fm) - 1.0) < 1e-3
