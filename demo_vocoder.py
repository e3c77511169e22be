"""HiFiGAN vocoder demo: mel extraction → vocoding → wav.

Rebuild of /root/reference/demo_vocoder.py:28-120: extract a log-mel with
the framework's jitted feature path, run it through the JAX HiFiGAN
(pretrained converted checkpoint if given, otherwise random weights — the
reference ships random weights too, demo_vocoder.py:108-120), and write the
result.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.config import AudioConfig, HiFiGANConfig
from iris_tts_tpu.data.audio_io import load_audio, write_wav
from iris_tts_tpu.models.hifigan import create_vocoder
from iris_tts_tpu.ops.stft import log_mel_spectrogram, to_reference_layout


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input_wav", type=str, default=None,
                        help="source audio; defaults to a synthetic tone")
    parser.add_argument("--output_wav", type=str,
                        default="outputs/vocoder_demo.wav")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="torch generator.ckpt to convert and use")
    args = parser.parse_args()

    audio_cfg = AudioConfig()
    if args.input_wav:
        audio = load_audio(args.input_wav, audio_cfg.sample_rate)
    else:
        t = np.arange(audio_cfg.sample_rate) / audio_cfg.sample_rate
        audio = (
            0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.25 * np.sin(2 * np.pi * 440 * t)
        ).astype(np.float32)
        print("no --input_wav given; using a synthetic 220+440 Hz tone")

    mel = log_mel_spectrogram(jnp.asarray(audio), audio_cfg)
    print(f"mel: {mel.shape} range [{float(mel.min()):.2f}, "
          f"{float(mel.max()):.2f}]")

    if args.checkpoint:
        from iris_tts_tpu.convert.hifigan_torch import load_pretrained_hifigan

        vocoder = load_pretrained_hifigan(args.checkpoint)
        print(f"loaded pretrained vocoder from {args.checkpoint}")
    else:
        vocoder = create_vocoder(HiFiGANConfig())
        print("WARNING: random weights — output will be noise "
              "(train with scripts/train_hifigan.py or convert a "
              "pretrained checkpoint)")

    wav = np.asarray(vocoder(to_reference_layout(mel[None]))[0])
    out = Path(args.output_wav)
    out.parent.mkdir(parents=True, exist_ok=True)
    write_wav(out, wav, audio_cfg.sample_rate)
    print(f"wrote {out} ({len(wav) / audio_cfg.sample_rate:.2f} s)")


if __name__ == "__main__":
    main()
