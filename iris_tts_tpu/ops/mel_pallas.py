"""Fused log-mel Pallas kernel: window ∘ DFT ∘ |·| ∘ mel ∘ log in VMEM.

The XLA path (:mod:`iris_tts_tpu.ops.stft`) materialises the [T, 513]
magnitude spectrum in HBM between the DFT and mel matmuls. This kernel keeps
the whole per-block chain — windowed-DFT matmuls (MXU), magnitude (VPU), mel
matmul (MXU), log-clip (VPU) — resident in VMEM, eliminating two [T, 513]
HBM round trips per spectrogram.

STATUS: numerically verified in Pallas interpret mode (tests) and on real
v5e hardware (max-abs 8e-6 vs the XLA path). Measured speed
(scripts/bench_mel.py, 10 s audio): 1.35x batched (B=8), ~1.0x single —
the win comes from eliminating the [T, 513] HBM round trips, which only
dominate once the batch amortizes the fixed per-call overheads. Opt in via
``log_mel_spectrogram(..., impl="pallas")`` or ``IRIS_MEL_IMPL=pallas``;
the XLA path stays the default because it is differentiable (the GAN mel
loss needs gradients) and portable to CPU test platforms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iris_tts_tpu.config import AudioConfig
from iris_tts_tpu.ops.stft import _dft_matrices, frame_signal, mel_filterbank

_BLK_T = 128  # frames per grid step (sublane-aligned)
_LANE = 128


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _padded_constants(sample_rate: int, n_fft: int, win_length: int,
                      n_mels: int, fmin: float, fmax: float):
    """Lane-padded (DFT_re, DFT_im, mel_fb) constants for the kernel."""
    real, imag = _dft_matrices(n_fft, win_length)
    n_freqs = real.shape[1]
    f_pad = _round_up(n_freqs, _LANE)
    m_pad = _round_up(n_mels, _LANE)
    re = np.zeros((n_fft, f_pad), np.float32)
    im = np.zeros((n_fft, f_pad), np.float32)
    re[:, :n_freqs] = real
    im[:, :n_freqs] = imag
    fb = np.zeros((f_pad, m_pad), np.float32)
    fb[:n_freqs, :n_mels] = mel_filterbank(
        sample_rate, n_fft, n_mels, fmin, fmax
    )
    return re, im, fb


def _mel_kernel(log_clip_min: float, frames_ref, re_ref, im_ref, fb_ref,
                out_ref):
    # precision=HIGHEST: f32 MXU matmuls default to a single bf16 pass,
    # which costs ~1e-1 max-abs in the log-mel output; the 3-pass (bf16x3)
    # mode matches the XLA feature path's HIGHEST-precision contract
    # (ops/stft.py log_mel_spectrogram) at a measured ~11% speed cost
    # (batched: 3.7 -> 4.2 ms, still 1.35x over XLA; max-abs 1.2e-1 -> 8e-6).
    hi = jax.lax.Precision.HIGHEST
    f = frames_ref[:]  # [BLK_T, n_fft]
    re = jnp.dot(f, re_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)
    im = jnp.dot(f, im_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, fb_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    out_ref[:] = jnp.log(jnp.maximum(mel, log_clip_min))


def log_mel_spectrogram_pallas(
    audio: jnp.ndarray,
    cfg: AudioConfig = AudioConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """audio [..., N] → log-mel [..., T, n_mels]; same contract as
    ``ops.stft.log_mel_spectrogram``. Forward-only (no VJP rule) — use the
    XLA path wherever gradients flow (train/gan.py mel loss)."""
    if audio.ndim > 1:
        # vmap folds the batch into a leading grid dimension of the same
        # kernel — no per-example dispatch.
        batch_shape = audio.shape[:-1]
        flat = audio.reshape((-1, audio.shape[-1]))
        out = jax.vmap(
            lambda a: log_mel_spectrogram_pallas(a, cfg, interpret)
        )(flat)
        return out.reshape(batch_shape + out.shape[1:])
    if audio.ndim != 1:
        raise ValueError("pallas mel kernel takes [..., N] waveforms")
    frames = frame_signal(
        audio.astype(jnp.float32), cfg.n_fft, cfg.hop_length, cfg.pad_mode
    )  # [T, n_fft] (window folded into the DFT matrices)
    t = frames.shape[0]
    t_pad = _round_up(t, _BLK_T)
    frames = jnp.pad(frames, ((0, t_pad - t), (0, 0)))

    re, im, fb = _padded_constants(
        cfg.sample_rate, cfg.n_fft, cfg.win_length, cfg.n_mels,
        cfg.fmin, cfg.fmax,
    )
    m_pad = fb.shape[1]

    out = pl.pallas_call(
        functools.partial(_mel_kernel, cfg.log_clip_min),
        grid=(t_pad // _BLK_T,),
        in_specs=[
            pl.BlockSpec(
                (_BLK_T, cfg.n_fft), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(re.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(im.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fb.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_BLK_T, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(frames, jnp.asarray(re), jnp.asarray(im), jnp.asarray(fb))

    return out[:t, : cfg.n_mels]
