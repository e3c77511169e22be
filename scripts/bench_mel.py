"""Honest XLA-vs-Pallas timing of log-mel feature extraction on the real
chip (drives the IRIS_MEL_IMPL default decision; VERDICT round-1 item 7).

Times ``ops.stft.log_mel_spectrogram`` (two back-to-back MXU matmuls with
an HBM-resident [T, 513] magnitude between them) against the fused VMEM
kernel ``ops.mel_pallas.log_mel_spectrogram_pallas`` on N seconds of audio,
single and batched, and checks numerics.

Usage: PYTHONPATH=. python scripts/bench_mel.py [--seconds 10] [--batch 8]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.config import AudioConfig
from iris_tts_tpu.ops.mel_pallas import log_mel_spectrogram_pallas
from iris_tts_tpu.ops.stft import log_mel_spectrogram
from scripts.common import avg_ms


def run_case(label, audio_arrays, cfg):
    f_xla = jax.jit(lambda a: log_mel_spectrogram(a, cfg, impl="xla"))
    f_pl = jax.jit(lambda a: log_mel_spectrogram_pallas(a, cfg))
    x = audio_arrays[0]
    y_xla = f_xla(x)
    try:
        y_pl = f_pl(x)
    except Exception as e:  # noqa: BLE001 — report and move on
        print(f"{label}: pallas FAILED: {type(e).__name__}: {str(e)[:120]}")
        return
    err = float(jnp.max(jnp.abs(y_pl - y_xla)))
    ms_xla = avg_ms(f_xla, audio_arrays)
    ms_pl = avg_ms(f_pl, audio_arrays)
    print(f"{label}: xla {ms_xla:8.2f} ms | pallas {ms_pl:8.2f} ms | "
          f"speedup {ms_xla / ms_pl:5.2f}x | maxabs {err:.2e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    cfg = AudioConfig()
    n = int(args.seconds * cfg.sample_rate)
    rng = np.random.default_rng(0)
    t = np.arange(n) / cfg.sample_rate
    singles = [
        jnp.asarray(
            (0.4 * np.sin(2 * np.pi * (200 + 100 * i) * t)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)
        )
        for i in range(4)
    ]
    run_case(f"single [{args.seconds:.0f}s]", singles, cfg)
    batches = [
        jnp.stack([jnp.roll(s, 17 * j) for j in range(args.batch)])
        for s in singles
    ]
    run_case(f"batch  [B={args.batch}, {args.seconds:.0f}s]", batches, cfg)


if __name__ == "__main__":
    main()
