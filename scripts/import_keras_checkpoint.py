"""Import reference-trained Keras checkpoints into a deployable pipeline.

Converts any subset of the reference's per-stage ``.weights.h5`` artifacts
(reference training scripts: scripts/train_encoder.py:281-296,
train_vae.py:498-511, train_postnet.py:399-409, plus the trainable Keras
vocoder) into one exported ``TTSPipeline`` directory (params + config +
vocab) that `TTSPipeline.load` and `scripts/synthesize.py` consume.
Reads the reference's ``config_vae.json`` (train_vae.py:139-164) to match
the VAE architecture and its ``phoneme_vocab.npy`` (datasets.py:278-285)
for the vocabulary.

Usage:
    python scripts/import_keras_checkpoint.py --output outputs/imported \
        --encoder_weights ckpt/encoder_best.weights.h5 \
        --duration_weights ckpt/duration_best.weights.h5 \
        --vae_weights ckpt/vae_best.weights.h5 \
        --config_vae ckpt/config_vae.json \
        --postnet_weights ckpt/postnet_best.weights.h5 \
        --vocab phoneme_vocab.npy
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from iris_tts_tpu.config import IrisConfig, load_config
from iris_tts_tpu.convert.keras_h5 import load_keras_stage_weights
from iris_tts_tpu.models.pipeline import TTSPipeline
from iris_tts_tpu.text.phonemes import PhonemeVocab
from scripts.common import setup_logging

logger = logging.getLogger(__name__)


def _vae_config_from_reference(cfg: IrisConfig, path: Path) -> IrisConfig:
    """Fold the reference's config_vae.json fields into our config tree
    (field names per train_vae.py:139-164)."""
    ref = json.loads(path.read_text())
    vae = dataclasses.replace(
        cfg.vae,
        n_mels=ref.get("n_mels", cfg.vae.n_mels),
        cond_dim=ref.get("embed_dim", cfg.vae.cond_dim),
        model_channels=ref.get("model_channels", cfg.vae.model_channels),
        latent_dim=ref.get("latent_dim", cfg.vae.latent_dim),
        num_wavenet_blocks=ref.get("num_blocks", cfg.vae.num_wavenet_blocks),
        decoder_blocks=ref.get("decoder_blocks", cfg.vae.decoder_blocks),
        down_stages=ref.get("down_stages", cfg.vae.down_stages),
        flow_layers=ref.get("flow_layers", cfg.vae.flow_layers),
        flow_hidden=ref.get("flow_hidden", cfg.vae.flow_hidden),
    )
    enc = dataclasses.replace(
        cfg.encoder, embed_dim=ref.get("embed_dim", cfg.encoder.embed_dim)
    )
    return dataclasses.replace(cfg, vae=vae, encoder=enc)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", type=Path, required=True,
                        help="pipeline export directory")
    parser.add_argument("--encoder_weights", type=Path)
    parser.add_argument("--duration_weights", type=Path)
    parser.add_argument("--vae_weights", type=Path)
    parser.add_argument("--postnet_weights", type=Path)
    parser.add_argument("--vocoder_weights", type=Path,
                        help="Keras (trainable) vocoder .weights.h5; for "
                        "the torch/speechbrain checkpoint use "
                        "--hifigan_checkpoint on scripts/synthesize.py")
    parser.add_argument("--config", type=Path,
                        help="our config.json (default: production config)")
    parser.add_argument("--config_vae", type=Path,
                        help="reference config_vae.json to match the VAE "
                        "architecture")
    parser.add_argument("--vocab", type=Path,
                        help="reference phoneme_vocab.npy (or our "
                        "vocab.json)")
    args = parser.parse_args()
    setup_logging()

    cfg = load_config(args.config) if args.config else IrisConfig()
    if args.config_vae:
        cfg = _vae_config_from_reference(cfg, args.config_vae)

    vocab = PhonemeVocab.load(args.vocab) if args.vocab else None
    pipe = TTSPipeline.initialize(cfg, vocab=vocab)
    cfg = pipe.config  # vocab size may have been auto-adjusted

    converted = load_keras_stage_weights(
        cfg,
        encoder_path=args.encoder_weights,
        duration_path=args.duration_weights,
        vae_path=args.vae_weights,
        postnet_path=args.postnet_weights,
        vocoder_path=args.vocoder_weights,
    )
    if not converted:
        parser.error("no *_weights arguments given — nothing to import")
    for name, tree in converted.items():
        want = jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(lambda a: tuple(a.shape),
                                   pipe.params[name])
        )
        got = jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(lambda a: tuple(a.shape), tree)
        )
        bad = [
            f"  {jax.tree_util.keystr(kw)}: checkpoint {sg} != model {sw}"
            for (kw, sw), (kg, sg) in zip(want, got)
            if kw != kg or sw != sg
        ]
        if len(want) != len(got) or bad:
            raise SystemExit(
                f"{name}: converted shapes do not match the configured "
                f"model — check --config/--config_vae/--vocab\n"
                + "\n".join(bad[:20])
            )
        pipe.params[name] = jax.tree_util.tree_map(
            lambda a: jax.numpy.asarray(a), tree
        )
        logger.info("imported %s from keras checkpoint", name)
    missing = sorted(set(pipe.params) - set(converted))
    if missing:
        logger.warning("components left at random init: %s", missing)

    pipe.save(args.output)
    logger.info("exported pipeline to %s", args.output)


if __name__ == "__main__":
    main()
