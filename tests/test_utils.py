"""Metrics / profiling utility tests + Griffin-Lim sanity."""

import csv

import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.utils import (
    MetricsWriter,
    RunningMean,
    StepTimer,
    SynthesisMeter,
    grad_norm,
    tree_finite,
)


def test_metrics_writer(tmp_path):
    p = tmp_path / "m.csv"
    w = MetricsWriter(p)
    w.write(1, {"loss": 0.5})
    w.write(2, {"loss": 0.25, "lr": 1e-4})
    w.close()
    rows = list(csv.reader(open(p)))
    assert rows[0] == ["step", "name", "value", "wall_time"]
    assert len(rows) == 4
    # append mode keeps history
    w2 = MetricsWriter(p)
    w2.write(3, {"loss": 0.1})
    w2.close()
    assert len(list(csv.reader(open(p)))) == 5


def test_running_mean():
    rm = RunningMean()
    rm.update({"a": 1.0})
    rm.update({"a": 3.0, "b": 10.0})
    assert rm.means() == {"a": 2.0, "b": 10.0}
    rm.reset()
    assert rm.means() == {}


def test_synthesis_meter():
    m = SynthesisMeter(sample_rate=22050, hop_length=256)
    for _ in range(4):
        m.start()
        m.stop(22050)  # 1s of audio each
    s = m.summary()
    assert s["audio_seconds"] == 4.0
    assert s["rtf"] > 0
    assert s["p50_latency_s"] <= s["p90_latency_s"] or len(m.latencies) < 3


def test_step_timer_discards_warmup():
    t = StepTimer(warmup=1)
    import time

    with t:
        time.sleep(0.05)  # "compile" step — discarded
    with t:
        pass
    assert t.mean_s < 0.05


def test_tree_finite_and_grad_norm():
    good = {"a": jnp.ones((2, 2)), "b": jnp.zeros(3)}
    bad = {"a": jnp.array([jnp.nan, 1.0])}
    assert tree_finite(good)
    assert not tree_finite(bad)
    assert abs(grad_norm(good) - 2.0) < 1e-6  # sqrt(4*1)


def test_griffin_lim_recovers_tone():
    """Phase recovery on a pure tone: reconstructed audio must carry the
    same dominant frequency."""
    from iris_tts_tpu.config import AudioConfig
    from iris_tts_tpu.ops.griffin_lim import griffin_lim
    from iris_tts_tpu.ops.stft import stft_magnitude

    cfg = AudioConfig()
    t = np.arange(11264) / cfg.sample_rate
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    mag = stft_magnitude(
        jnp.asarray(tone), cfg.n_fft, cfg.hop_length, cfg.win_length,
        cfg.pad_mode,
    )
    audio = np.asarray(griffin_lim(mag, cfg, n_iter=12, seed=0))
    assert np.isfinite(audio).all()
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    freqs = np.fft.rfftfreq(len(audio), 1 / cfg.sample_rate)
    assert abs(freqs[spec.argmax()] - 440.0) < 10.0


def test_griffin_lim_roundtrip_quality():
    """Quantified round trip (VERDICT r1 item 8): waveform → log-mel →
    NNLS inversion → Griffin-Lim → waveform. Measured spectral convergence
    ~0.22 with the PGD-NNLS default (clipped-pinv stand-in: ~0.42; pure
    phase-recovery floor at 60 iterations: ~0.20); bounds carry margin."""
    from iris_tts_tpu.config import AudioConfig
    from iris_tts_tpu.ops.griffin_lim import griffin_lim, mel_to_linear
    from iris_tts_tpu.ops.stft import log_mel_spectrogram, stft_magnitude_matmul

    cfg = AudioConfig()
    t = np.arange(cfg.sample_rate) / cfg.sample_rate
    wave = (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.25 * np.sin(2 * np.pi * 660 * t)
        + 0.1 * np.sin(2 * np.pi * 1320 * t)
    ).astype(np.float32)

    def spectral_convergence(audio_hat):
        S = stft_magnitude_matmul(
            jnp.asarray(wave), cfg.n_fft, cfg.hop_length, cfg.win_length,
            cfg.pad_mode,
        )
        Sh = stft_magnitude_matmul(
            jnp.asarray(audio_hat), cfg.n_fft, cfg.hop_length,
            cfg.win_length, cfg.pad_mode,
        )
        n = min(S.shape[0], Sh.shape[0])
        return float(
            jnp.linalg.norm(S[:n] - Sh[:n]) / jnp.linalg.norm(S[:n])
        )

    mel = log_mel_spectrogram(jnp.asarray(wave), cfg)
    audio_nnls = np.asarray(
        griffin_lim(mel_to_linear(mel, cfg), cfg, n_iter=60)
    )
    sc_nnls = spectral_convergence(audio_nnls)
    assert sc_nnls < 0.30

    # Mel-domain round trip tightens further (the inversion error mostly
    # lives in the fine linear-frequency structure the mel basis discards).
    mel_hat = log_mel_spectrogram(jnp.asarray(audio_nnls), cfg)
    n = min(mel.shape[0], mel_hat.shape[0])
    assert float(jnp.mean(jnp.abs(mel[:n] - mel_hat[:n]))) < 0.8
    assert np.mean(
        np.argmax(np.asarray(mel[:n]), -1)
        == np.argmax(np.asarray(mel_hat[:n]), -1)
    ) > 0.9

    # The NNLS default must beat the clipped-pinv stand-in it replaced.
    audio_pinv = np.asarray(
        griffin_lim(mel_to_linear(mel, cfg, method="pinv"), cfg, n_iter=60)
    )
    assert sc_nnls < spectral_convergence(audio_pinv) - 0.05


def test_mel_to_linear_shape():
    from iris_tts_tpu.config import AudioConfig
    from iris_tts_tpu.ops.griffin_lim import mel_to_linear

    cfg = AudioConfig()
    out = mel_to_linear(jnp.zeros((7, cfg.n_mels)), cfg)
    assert out.shape == (7, cfg.n_freqs)
    assert float(jnp.min(out)) >= 0.0


# ---------------------------------------------------------------------------
# Audio-quality metrics (MCD / LSD)
# ---------------------------------------------------------------------------


def _synthetic_log_mel(t=60, m=80, seed=0, shift=0.0, noise=0.0):
    """A smooth spectral-envelope-like log-mel with optional bin-shift
    (spectral distortion) and additive noise."""
    rng = np.random.default_rng(seed)
    bins = np.arange(m)
    envelope = np.stack([
        np.sin(2 * np.pi * (bins / m + shift) * (1 + (i % 5))) for i in range(t)
    ])
    return envelope + noise * rng.standard_normal((t, m))


def test_mcd_identity_and_monotonicity():
    from iris_tts_tpu.utils import mel_cepstral_distortion

    a = _synthetic_log_mel()
    assert mel_cepstral_distortion(a, a) == 0.0
    small = mel_cepstral_distortion(a, a + 0.05)
    # c0 is dropped: a constant (loudness) offset costs nothing, a
    # spectral-shape change costs more than a small perturbation.
    assert mel_cepstral_distortion(a, a + 1.0) < 1e-9
    shifted = mel_cepstral_distortion(a, _synthetic_log_mel(shift=0.2))
    assert 0 < small < shifted


def test_mcd_scale_is_decibels():
    from iris_tts_tpu.utils import mel_cepstral_distortion

    # A known cepstral-domain gap: b = a + delta applied to one cosine
    # component. MCD = (10/ln10)*sqrt(2)*||delta_cep||.
    t, m = 8, 80
    a = np.zeros((t, m))
    k1 = np.sqrt(2.0 / m) * np.cos(np.pi * (np.arange(m) + 0.5) / m)
    b = a + k1[None, :]  # adds exactly 1.0 to cepstral coefficient c1
    got = mel_cepstral_distortion(a, b, n_coeffs=13)
    expected = (10.0 / np.log(10.0)) * np.sqrt(2.0) * 1.0
    assert abs(got - expected) < 1e-9


def test_lsd_known_value_and_dtw_alignment():
    from iris_tts_tpu.utils import log_spectral_distance

    a = _synthetic_log_mel(t=40)
    # Uniform natural-log offset of ln(10)/20 is exactly 1 dB everywhere.
    b = a + np.log(10.0) / 20.0
    assert abs(log_spectral_distance(a, b) - 1.0) < 1e-9
    # Time-stretched copy: trim-alignment sees a big gap, DTW re-aligns it.
    stretched = np.repeat(a, 2, axis=0)
    lsd_trim = log_spectral_distance(a, stretched, align="trim")
    lsd_dtw = log_spectral_distance(a, stretched, align="dtw")
    assert lsd_dtw < 1e-9 < lsd_trim


def test_quality_report_discriminates():
    from iris_tts_tpu.utils import quality_report

    gt = _synthetic_log_mel(seed=1)
    near = quality_report(gt + 0.02, gt)
    far = quality_report(_synthetic_log_mel(seed=2, shift=0.3), gt)
    assert set(near) == {"mcd_db", "lsd_db", "mel_l1"}
    assert near["mcd_db"] < far["mcd_db"]
    assert near["lsd_db"] < far["lsd_db"]
