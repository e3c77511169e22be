"""STFT / mel-spectrogram feature extraction, TPU-native.

Replaces the reference's host-side librosa feature path
(/root/reference/src/iris/data.py:25-67) with jit-compiled JAX:

* magnitude spectrogram (power = 1.0),
* Slaney-scale mel filterbank (librosa-compatible: slaney norm, htk=False),
* ``log(clip(mel, 1e-5))`` — the system-wide mel convention the pretrained
  HiFiGAN expects (reference HIFIGAN_SETUP.md:122-128).

Two device paths are provided:

1. ``stft_magnitude`` — frame + window + ``jnp.fft.rfft`` (XLA FFT).
2. ``stft_magnitude_matmul`` — frame + fused (window ∘ DFT-matrix) matmul.
   On TPU the DFT-as-matmul runs on the MXU; for n_fft=1024 the extra FLOPs
   are negligible at audio rates and the whole mel pipeline collapses into
   two back-to-back matmuls that XLA fuses with the log/clip epilogue.

Everything here is shape-static and differentiable, so the same code serves
feature extraction, GAN mel losses, and tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.config import AudioConfig

# ---------------------------------------------------------------------------
# Windows and mel filterbank (host-side numpy, cached; constants under jit)
# ---------------------------------------------------------------------------


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches scipy ``get_window('hann', N)`` with
    ``fftbins=True``, which is what librosa uses)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


@functools.lru_cache(maxsize=None)
def padded_window(n_fft: int, win_length: int,
                  dtype_name: str = "float32") -> np.ndarray:
    """The analysis window centered in an n_fft frame — the single source of
    the window-placement contract shared by the FFT path, the matmul-DFT
    path, and Griffin-Lim's ISTFT."""
    win = np.zeros(n_fft, dtype=np.dtype(dtype_name))
    offset = (n_fft - win_length) // 2
    win[offset : offset + win_length] = hann_window(
        win_length, np.dtype(dtype_name)
    )
    return win


def _hz_to_mel_slaney(freqs: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    freqs = np.asarray(freqs, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freqs / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freqs >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freqs, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int = 22050,
    n_fft: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = 8000.0,
) -> np.ndarray:
    """Triangular Slaney-normalised mel filterbank, shape [n_freqs, n_mels].

    Matrix is laid out for right-multiplication: ``mel = |S| @ fb`` with
    ``|S|`` of shape [..., n_freqs] — the MXU-friendly orientation.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)

    mel_pts = np.linspace(
        _hz_to_mel_slaney(np.array([fmin]))[0],
        _hz_to_mel_slaney(np.array([fmax]))[0],
        n_mels + 2,
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style area normalisation.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]

    return weights.T.astype(np.float32)  # [n_freqs, n_mels]


@functools.lru_cache(maxsize=None)
def _dft_matrices(n_fft: int, win_length: int, dtype_name: str = "float32"):
    """Real/imag DFT matrices with the analysis window folded in.

    Returns (real, imag) of shape [n_fft, n_freqs] such that for a frame f of
    length n_fft (window NOT yet applied):
        re = f @ real, im = f @ imag  ==  rfft(window * f)
    """
    dtype = np.dtype(dtype_name)
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    win = padded_window(n_fft, win_length, "float64")
    real = (np.cos(ang) * win[:, None]).astype(dtype)
    imag = (np.sin(ang) * win[:, None]).astype(dtype)
    return real, imag


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------


def frame_signal(
    audio: jnp.ndarray, n_fft: int, hop_length: int, pad_mode: str = "constant"
) -> jnp.ndarray:
    """Center-pad and slice ``audio`` [..., N] into frames [..., T, n_fft].

    Matches librosa centering: pad n_fft//2 on both sides, then T = 1 + N//hop
    frames. Static shapes throughout — safe under jit.
    """
    pad = n_fft // 2
    n = audio.shape[-1]
    padded = jnp.pad(
        audio,
        [(0, 0)] * (audio.ndim - 1) + [(pad, pad)],
        mode=pad_mode,
    )
    num_frames = 1 + n // hop_length
    # Gather frames with a static index grid: [T, n_fft].
    idx = (
        np.arange(num_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    )
    return padded[..., idx]


# ---------------------------------------------------------------------------
# STFT magnitude (two device paths)
# ---------------------------------------------------------------------------


def stft_magnitude(
    audio: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """|STFT| via XLA rfft. audio [..., N] → [..., T, n_freqs]."""
    frames = frame_signal(audio, n_fft, hop_length, pad_mode)
    win = padded_window(n_fft, win_length)
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)
    return _grad_safe_magnitude(spec.real, spec.imag).astype(audio.dtype)


def _grad_safe_magnitude(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """sqrt(re² + im²) with a tiny floor under the root.

    d(sqrt(x))/dx → ∞ at x = 0, so an exactly-silent bin (zero-padded audio,
    DC of a zero frame) turns the GAN's mel-L1 gradient into NaN. The 1e-12
    floor bounds |∂mag| while shifting magnitudes by ≤1e-6 — an order below
    the 1e-5 log-clip of the feature contract (reference data.py:65)."""
    return jnp.sqrt(re * re + im * im + 1e-12)


def stft_magnitude_matmul(
    audio: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """|STFT| via windowed-DFT matmuls (MXU path). Same contract as
    :func:`stft_magnitude`."""
    frames = frame_signal(audio, n_fft, hop_length, pad_mode)
    real, imag = _dft_matrices(n_fft, win_length)
    # HIGHEST precision: on TPU the MXU would otherwise round f32 operands
    # to bf16, breaking the 1e-3 feature contract. The DFT matmul is a tiny
    # fraction of pipeline FLOPs, so full-precision passes are free.
    re = jnp.matmul(
        frames,
        real,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    im = jnp.matmul(
        frames,
        imag,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return _grad_safe_magnitude(re, im).astype(audio.dtype)


# ---------------------------------------------------------------------------
# Log-mel spectrogram (the system-wide feature contract)
# ---------------------------------------------------------------------------


def default_mel_impl() -> str:
    """Resolve the feature-extraction implementation from ``IRIS_MEL_IMPL``
    ("xla" default; "pallas" = the fused VMEM kernel, ops/mel_pallas.py —
    forward-only, TPU/interpret backends)."""
    import os

    return os.environ.get("IRIS_MEL_IMPL", "xla")


def log_mel_spectrogram(
    audio: jnp.ndarray,
    cfg: AudioConfig = AudioConfig(),
    use_matmul_dft: bool = True,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """audio [..., N] → log-mel [..., T, n_mels].

    Numerically equivalent to the reference feature pipeline
    (/root/reference/src/iris/data.py:25-67): magnitude STFT → Slaney mel →
    ``log(clip(., 1e-5))``. Output layout is time-major ([..., T, n_mels]);
    use :func:`to_reference_layout` for the reference's [n_mels, T].

    ``impl``: None → :func:`default_mel_impl` (env ``IRIS_MEL_IMPL``);
    "xla" (differentiable, portable); "pallas" (fused VMEM kernel, 1.35x
    batched on v5e, forward-only — callers that differentiate through the mel, e.g.
    the GAN mel loss, must pin ``impl="xla"``).
    """
    if impl is None:
        impl = default_mel_impl()
    if impl == "pallas":
        from iris_tts_tpu.ops.mel_pallas import log_mel_spectrogram_pallas

        return log_mel_spectrogram_pallas(
            audio, cfg, interpret=jax.default_backend() == "cpu"
        ).astype(audio.dtype)
    stft_fn = stft_magnitude_matmul if use_matmul_dft else stft_magnitude
    mag = stft_fn(
        audio,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        pad_mode=cfg.pad_mode,
    )
    fb = jnp.asarray(
        mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax
        )
    )
    mel = jnp.matmul(
        mag,
        fb,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.log(jnp.clip(mel, min=cfg.log_clip_min)).astype(audio.dtype)


def to_reference_layout(mel_tc: jnp.ndarray) -> jnp.ndarray:
    """[..., T, n_mels] → [..., n_mels, T] (reference module-boundary layout,
    SURVEY.md §2.5)."""
    return jnp.swapaxes(mel_tc, -1, -2)


def from_reference_layout(mel_ct: jnp.ndarray) -> jnp.ndarray:
    """[..., n_mels, T] → [..., T, n_mels]."""
    return jnp.swapaxes(mel_ct, -1, -2)


def normalize_mel(
    mel: jnp.ndarray,
    mean: Optional[jnp.ndarray] = None,
    std: Optional[jnp.ndarray] = None,
):
    """Standardise a mel spectrogram (reference: data.py:70-91)."""
    if mean is None:
        mean = jnp.mean(mel)
    if std is None:
        std = jnp.std(mel)
    return (mel - mean) / (std + 1e-8), mean, std
