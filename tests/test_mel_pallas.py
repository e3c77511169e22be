"""Fused Pallas mel kernel vs the XLA reference path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from iris_tts_tpu.config import AudioConfig
from iris_tts_tpu.ops.mel_pallas import log_mel_spectrogram_pallas
from iris_tts_tpu.ops.stft import log_mel_spectrogram


@pytest.fixture
def audio(rng):
    t = np.arange(22050) / 22050.0
    return (
        0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(22050)
    ).astype(np.float32)


def test_pallas_mel_matches_xla_path(audio):
    cfg = AudioConfig()
    want = np.asarray(log_mel_spectrogram(jnp.asarray(audio), cfg))
    got = np.asarray(
        log_mel_spectrogram_pallas(jnp.asarray(audio), cfg, interpret=True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_pallas_mel_short_audio(audio):
    cfg = AudioConfig()
    short = jnp.asarray(audio[:4000])  # < one grid block of frames
    want = np.asarray(log_mel_spectrogram(short, cfg))
    got = np.asarray(log_mel_spectrogram_pallas(short, cfg, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_pallas_mel_batched(audio):
    """[B, N] input vmaps through the kernel and matches the XLA path."""
    cfg = AudioConfig()
    batch = jnp.stack([jnp.asarray(audio[:8000]),
                       jnp.asarray(audio[8000:16000])])
    want = np.asarray(log_mel_spectrogram(batch, cfg))
    got = np.asarray(log_mel_spectrogram_pallas(batch, cfg, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_log_mel_impl_routing(audio, monkeypatch):
    """impl="pallas" / IRIS_MEL_IMPL=pallas route through the fused kernel
    (interpret mode on CPU) and stay within tolerance of the XLA path."""
    cfg = AudioConfig()
    a = jnp.asarray(audio[:8000])
    want = np.asarray(log_mel_spectrogram(a, cfg))
    got = np.asarray(log_mel_spectrogram(a, cfg, impl="pallas"))
    np.testing.assert_allclose(got, want, atol=2e-3)
    monkeypatch.setenv("IRIS_MEL_IMPL", "pallas")
    got_env = np.asarray(log_mel_spectrogram(a, cfg))
    np.testing.assert_allclose(got_env, want, atol=2e-3)
