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


def test_join_wave_chunks_preserves_dtype():
    """The silence gap inherits the chunks' dtype — int16 PCM16 chunks must
    never be promoted to float (review finding: the float32 gap pushed
    int16-scale samples through the [-1,1] clip, emitting square waves)."""
    import numpy as np

    from iris_tts_tpu.data import join_wave_chunks

    i16 = [np.full(100, 20000, np.int16), np.full(50, -15000, np.int16)]
    out = join_wave_chunks(i16, gap_ms=10.0, sample_rate=22050)
    assert out.dtype == np.int16
    gap = int(round(0.010 * 22050))
    assert out.shape == (150 + gap,)
    assert out[:100].max() == 20000 and out[-50:].min() == -15000
    assert (out[100:100 + gap] == 0).all()

    f32 = [np.ones(10, np.float32), np.ones(10, np.float32)]
    assert join_wave_chunks(f32, 10.0, 22050).dtype == np.float32
    # single chunk: passthrough
    assert join_wave_chunks([i16[0]], 10.0, 22050) is i16[0]
