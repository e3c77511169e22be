"""WAV IO round-trip tests."""

import numpy as np
import pytest

from iris_tts_tpu.data import audio_io


@pytest.mark.parametrize("subtype,atol", [("pcm16", 1e-4), ("float32", 1e-7)])
def test_wav_roundtrip_mono(tmp_path, rng, subtype, atol):
    samples = (0.8 * rng.standard_normal(2048)).clip(-1, 1).astype(np.float32)
    path = tmp_path / "test.wav"
    audio_io.write_wav(path, samples, 22050, subtype=subtype)
    loaded, sr = audio_io.read_wav(path)
    assert sr == 22050
    np.testing.assert_allclose(loaded, samples, atol=atol)


def test_wav_roundtrip_stereo_to_mono(tmp_path, rng):
    samples = (0.5 * rng.standard_normal((1024, 2))).astype(np.float32)
    path = tmp_path / "st.wav"
    audio_io.write_wav(path, samples, 16000, subtype="float32")
    loaded, sr = audio_io.read_wav(path)
    assert loaded.shape == (1024, 2)
    mono = audio_io.to_mono(loaded)
    np.testing.assert_allclose(mono, samples.mean(axis=1), atol=1e-6)


def test_load_audio_resamples(tmp_path):
    t = np.arange(16000) / 16000.0
    sig = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    path = tmp_path / "tone.wav"
    audio_io.write_wav(path, sig, 16000, subtype="float32")
    out = audio_io.load_audio(path, sample_rate=22050)
    assert abs(len(out) - 22050) <= 2
    # Dominant frequency is preserved through resampling.
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    freqs = np.fft.rfftfreq(len(out), 1 / 22050.0)
    assert abs(freqs[spec.argmax()] - 440.0) < 5.0


def test_read_rejects_non_wav(tmp_path):
    p = tmp_path / "x.wav"
    p.write_bytes(b"not a wav file at all")
    with pytest.raises(ValueError):
        audio_io.read_wav(p)
