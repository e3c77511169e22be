"""Golden tests for the mel/STFT feature contract (SURVEY.md §2.5).

The JAX paths are validated against (a) an independent straight-line numpy
re-derivation of the documented algorithm and (b) torch.stft as a second
independent STFT implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_tts_tpu.config import AudioConfig
from iris_tts_tpu.ops import stft as stft_mod


def _numpy_reference_logmel(audio: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Slow, obviously-correct loop implementation of the feature contract:
    center-padded Hann STFT magnitude -> Slaney mel -> log(clip(., 1e-5)).
    Mirrors /root/reference/src/iris/data.py:25-67 semantics."""
    pad = cfg.n_fft // 2
    padded = np.pad(audio, (pad, pad), mode=cfg.pad_mode)
    win = stft_mod.hann_window(cfg.win_length, np.float64)
    num_frames = 1 + len(audio) // cfg.hop_length
    mags = np.zeros((num_frames, cfg.n_freqs))
    for t in range(num_frames):
        frame = padded[t * cfg.hop_length : t * cfg.hop_length + cfg.n_fft]
        mags[t] = np.abs(np.fft.rfft(frame * win, n=cfg.n_fft))
    fb = stft_mod.mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax
    ).astype(np.float64)
    mel = mags @ fb
    return np.log(np.clip(mel, cfg.log_clip_min, None))


@pytest.fixture
def audio(rng):
    # ~0.5 s of band-limited noise + tone, deterministic.
    n = 11264
    t = np.arange(n) / 22050.0
    sig = 0.4 * np.sin(2 * np.pi * 440.0 * t) + 0.1 * rng.standard_normal(n)
    return sig.astype(np.float32)


def test_frame_count_contract(audio):
    cfg = AudioConfig()
    mel = stft_mod.log_mel_spectrogram(jnp.asarray(audio), cfg)
    assert mel.shape == (1 + len(audio) // cfg.hop_length, cfg.n_mels)


def test_logmel_matches_numpy_reference(audio):
    cfg = AudioConfig()
    got = np.asarray(stft_mod.log_mel_spectrogram(jnp.asarray(audio), cfg))
    want = _numpy_reference_logmel(audio.astype(np.float64), cfg)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


def test_fft_and_matmul_paths_agree(audio):
    cfg = AudioConfig()
    a = jnp.asarray(audio)
    m_fft = stft_mod.stft_magnitude(
        a, cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.pad_mode
    )
    m_mm = stft_mod.stft_magnitude_matmul(
        a, cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.pad_mode
    )
    np.testing.assert_allclose(np.asarray(m_fft), np.asarray(m_mm), atol=2e-3)


def test_stft_matches_torch(audio):
    torch = pytest.importorskip("torch")
    cfg = AudioConfig()
    got = np.asarray(
        stft_mod.stft_magnitude(
            jnp.asarray(audio),
            cfg.n_fft,
            cfg.hop_length,
            cfg.win_length,
            "reflect",
        )
    )
    want = (
        torch.stft(
            torch.from_numpy(audio),
            n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            win_length=cfg.win_length,
            window=torch.hann_window(cfg.win_length, periodic=True),
            center=True,
            pad_mode="reflect",
            return_complex=True,
        )
        .abs()
        .numpy()
        .T  # torch returns [freq, time]
    )
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_mel_filterbank_properties():
    fb = stft_mod.mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (513, 80)
    assert np.all(fb >= 0)
    # Each filter is nonempty and band-limited below fmax.
    assert np.all(fb.sum(axis=0) > 0)
    freqs = np.linspace(0, 22050 / 2, 513)
    active = fb.sum(axis=1) > 0
    assert freqs[active].max() <= 8000.0 + 1e-6
    # Slaney mel scale anchors: linear below 1 kHz.
    np.testing.assert_allclose(
        stft_mod._hz_to_mel_slaney(np.array([500.0]))[0], 7.5, atol=1e-9
    )
    np.testing.assert_allclose(
        stft_mod._mel_to_hz_slaney(np.array([15.0]))[0], 1000.0, atol=1e-6
    )


def test_batched_and_jit(audio):
    cfg = AudioConfig()
    batch = jnp.stack([jnp.asarray(audio), 0.5 * jnp.asarray(audio)])
    fn = jax.jit(lambda a: stft_mod.log_mel_spectrogram(a, cfg))
    out = fn(batch)
    assert out.shape == (2, 1 + len(audio) // cfg.hop_length, cfg.n_mels)
    single = stft_mod.log_mel_spectrogram(jnp.asarray(audio), cfg)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(single), atol=1e-5
    )


def test_layout_roundtrip(audio):
    cfg = AudioConfig()
    mel = stft_mod.log_mel_spectrogram(jnp.asarray(audio)[None], cfg)
    ref = stft_mod.to_reference_layout(mel)
    assert ref.shape == (1, cfg.n_mels, mel.shape[1])
    back = stft_mod.from_reference_layout(ref)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(mel))
