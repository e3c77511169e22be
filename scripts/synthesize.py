"""Text → 22.05 kHz WAV: the main inference entry point.

TPU-native rebuild of /root/reference/scripts/synthesize.py:64-220 — but
the whole path runs as two jitted device stages inside
``TTSPipeline.synthesize`` (no host numpy length regulation, no framework
hops), with HiFiGAN (converted pretrained torch checkpoint) or the jitted
Griffin-Lim fallback as the vocoder.

Usage:
    python scripts/synthesize.py --text "Hello world." \
        --encoder_checkpoint outputs/encoder/checkpoints \
        --vae_checkpoint outputs/vae/checkpoints \
        --hifigan_checkpoint models/hifigan/generator.ckpt \
        --output_wav outputs/sample.wav
Random-weight smoke mode (no checkpoints): add --random_weights.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from iris_tts_tpu.config import IrisConfig, load_config
from iris_tts_tpu.data.audio_io import write_wav
from iris_tts_tpu.models.pipeline import TTSPipeline
from scripts.common import setup_logging

logger = logging.getLogger(__name__)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--text", type=str,
                        default="Hello world, this is a test.")
    parser.add_argument("--output_wav", type=str,
                        default="outputs/sample.wav")
    parser.add_argument("--artifact", type=str, default=None,
                        help="deployable pipeline directory "
                        "(TTSPipeline.save, e.g. release/pipeline_artifact)"
                        " — overrides the per-stage checkpoint flags")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--vocab_path", type=str, default=None,
                        help="phoneme_vocab.json (or reference .npy)")
    parser.add_argument("--lexicon_path", type=str, default=None,
                        help="CMUdict-format lexicon file")
    parser.add_argument("--encoder_checkpoint", type=str,
                        default="outputs/encoder/checkpoints")
    parser.add_argument("--vae_checkpoint", type=str,
                        default="outputs/vae/checkpoints")
    parser.add_argument("--postnet_checkpoint", type=str, default=None)
    parser.add_argument("--hifigan_checkpoint", type=str, default=None,
                        help="pretrained torch generator.ckpt")
    parser.add_argument("--hifigan_gan_checkpoint", type=str, default=None,
                        help="train_hifigan.py generator stage dir "
                        "(outputs/hifigan_gan/gen); deploys the EMA "
                        "average when the run tracked one")
    parser.add_argument("--use_griffin_lim", action="store_true",
                        help="Griffin-Lim fallback vocoder (60 iters)")
    parser.add_argument("--random_weights", action="store_true",
                        help="smoke-test mode without trained checkpoints")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=1337)
    parser.add_argument(
        "--dtype", choices=["f32", "bf16"], default="f32",
        help="compute dtype (bf16: ~1.3x faster steady-state, much slower "
        "first compile on tunneled backends)",
    )
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()
    setup_logging(args.verbose)
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    if args.artifact:
        pipe = TTSPipeline.load(
            args.artifact, lexicon_path=args.lexicon_path, dtype=dtype
        )
    elif args.random_weights:
        cfg = load_config(args.config) if args.config else IrisConfig()
        pipe = TTSPipeline.initialize(
            cfg, lexicon_path=args.lexicon_path, seed=args.seed, dtype=dtype
        )
    else:
        pipe = TTSPipeline.from_checkpoints(
            args.encoder_checkpoint,
            args.vae_checkpoint,
            postnet_checkpoint=args.postnet_checkpoint,
            hifigan_checkpoint=args.hifigan_checkpoint,
            hifigan_gan_checkpoint=args.hifigan_gan_checkpoint,
            config=load_config(args.config) if args.config else None,
            vocab_path=args.vocab_path,
            lexicon_path=args.lexicon_path,
            dtype=dtype,
        )

    if args.use_griffin_lim:
        # Griffin-Lim branch (reference: synthesize.py:174-194).
        import jax.numpy as jnp

        from iris_tts_tpu.ops.griffin_lim import griffin_lim_from_log_mel

        mel = pipe.synthesize_mel(
            args.text, seed=args.seed, temperature=args.temperature
        )
        audio = np.asarray(
            griffin_lim_from_log_mel(jnp.asarray(mel), n_iter=60)
        )
    else:
        audio = pipe.synthesize(
            args.text, seed=args.seed, temperature=args.temperature
        )

    sr = pipe.config.audio.sample_rate
    logger.info(
        "generated %s samples (%.2f s)", audio.shape, len(audio) / sr
    )
    out = Path(args.output_wav)
    out.parent.mkdir(parents=True, exist_ok=True)
    write_wav(out, audio, sr)
    logger.info("wrote %s", out)


if __name__ == "__main__":
    main()
