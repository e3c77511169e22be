"""Native C++ WAV codec tests (auto-builds with g++; cross-checked against
the pure-Python implementation)."""

import numpy as np
import pytest

from iris_tts_tpu.data import audio_io
from iris_tts_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    if not native.native_available():
        pytest.skip("no native toolchain available")
    return native.get_lib()


def test_native_read_matches_python(tmp_path, rng, lib):
    samples = (0.7 * rng.standard_normal(4096)).clip(-1, 1).astype(np.float32)
    p = tmp_path / "a.wav"
    audio_io.write_wav(p, samples, 22050, subtype="float32")
    got, sr = native.read_wav_mono(p)
    assert sr == 22050
    np.testing.assert_allclose(got, samples, atol=1e-7)


def test_native_read_pcm16_and_24(tmp_path, rng, lib):
    samples = (0.5 * rng.standard_normal(1000)).astype(np.float32)
    p16 = tmp_path / "p16.wav"
    audio_io.write_wav(p16, samples, 16000, subtype="pcm16")
    got, sr = native.read_wav_mono(p16)
    want, _ = audio_io.read_wav(p16)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert sr == 16000


def test_native_stereo_downmix(tmp_path, rng, lib):
    st = (0.4 * rng.standard_normal((512, 2))).astype(np.float32)
    p = tmp_path / "st.wav"
    audio_io.write_wav(p, st, 22050, subtype="float32")
    got, _ = native.read_wav_mono(p)
    np.testing.assert_allclose(got, st.mean(axis=1), atol=1e-6)


def test_native_batch_read(tmp_path, rng, lib):
    paths = []
    refs = []
    for i in range(6):
        n = 500 + 100 * i
        s = (0.3 * rng.standard_normal(n)).astype(np.float32)
        p = tmp_path / f"b{i}.wav"
        audio_io.write_wav(p, s, 22050, subtype="float32")
        paths.append(p)
        refs.append(s)
    audio, lengths, rates = native.read_wav_batch(paths, max_samples=800,
                                                  num_threads=3)
    assert audio.shape == (6, 800)
    for i, s in enumerate(refs):
        take = min(len(s), 800)
        assert lengths[i] == take
        assert rates[i] == 22050
        np.testing.assert_allclose(audio[i, :take], s[:take], atol=1e-7)
        np.testing.assert_allclose(audio[i, take:], 0.0)


def test_native_batch_read_resamples_mixed_rates(tmp_path, rng, lib):
    """A mixed-rate corpus with expected_sample_rate set must come back
    uniformly at that rate (ADVICE r1: silent wrong-timebase features)."""
    t = np.arange(44100) / 44100.0
    hi = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)  # 1 s @ 44.1k
    lo = (0.5 * np.sin(2 * np.pi * 220 * t[::2])).astype(np.float32)[:11025]
    p_hi, p_lo = tmp_path / "hi.wav", tmp_path / "lo.wav"
    audio_io.write_wav(p_hi, hi, 44100, subtype="float32")
    audio_io.write_wav(p_lo, lo, 22050, subtype="float32")
    audio, lengths, rates = native.read_wav_batch(
        [p_hi, p_lo], max_samples=46000, expected_sample_rate=22050
    )
    assert list(rates) == [22050, 22050]
    assert audio.shape == (2, 46000)
    # 1 s at 44.1k resampled to 22.05k → ~22050 samples.
    assert abs(int(lengths[0]) - 22050) <= 2
    assert int(lengths[1]) == 11025  # already at rate: untouched
    # Resampled sine keeps its amplitude and zero padding stays zero.
    seg = audio[0, 1000 : int(lengths[0]) - 1000]
    assert 0.45 < np.abs(seg).max() < 0.55
    np.testing.assert_allclose(audio[0, int(lengths[0]) :], 0.0)


def test_native_batch_read_with_missing_file(tmp_path, rng, lib):
    s = (0.3 * rng.standard_normal(256)).astype(np.float32)
    good = tmp_path / "good.wav"
    audio_io.write_wav(good, s, 22050, subtype="float32")
    audio, lengths, rates = native.read_wav_batch(
        [good, tmp_path / "missing.wav"], max_samples=300
    )
    assert lengths[0] == 256 and lengths[1] == 0
    np.testing.assert_allclose(audio[1], 0.0)


def test_native_write_roundtrip(tmp_path, rng, lib):
    s = (0.6 * rng.standard_normal(2048)).clip(-1, 1).astype(np.float32)
    p = tmp_path / "w.wav"
    native.write_wav_pcm16(p, s, 22050)
    got, sr = audio_io.read_wav(p)
    assert sr == 22050
    np.testing.assert_allclose(got, s, atol=1e-4)


def test_python_fallback_paths(tmp_path, rng, monkeypatch):
    """With the native lib forced off, the same API works via Python."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    s = (0.5 * rng.standard_normal(512)).clip(-1, 1).astype(np.float32)
    p = tmp_path / "f.wav"
    native.write_wav_pcm16(p, s, 22050)
    got, sr = native.read_wav_mono(p)
    assert sr == 22050
    np.testing.assert_allclose(got, s, atol=1e-4)
    audio, lengths, rates = native.read_wav_batch([p], max_samples=600)
    assert lengths[0] == 512
