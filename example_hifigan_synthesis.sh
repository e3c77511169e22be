#!/usr/bin/env bash
# End-to-end synthesis with the pretrained HiFiGAN vocoder
# (rebuild of /root/reference/example_hifigan_synthesis.sh).
#
# Prerequisites:
#   - trained stage checkpoints under outputs/ (see README "Training pipeline")
#   - the speechbrain tts-hifigan-ljspeech generator.ckpt, e.g. at
#     models/hifigan/generator.ckpt (it is converted to JAX on load)
set -euo pipefail

TEXT="${1:-Hello world, this is Iris running natively on TPU.}"
OUT="${2:-outputs/sample_hifigan.wav}"

python scripts/synthesize.py \
    --text "$TEXT" \
    --output_wav "$OUT" \
    --encoder_checkpoint outputs/encoder/checkpoints \
    --vae_checkpoint outputs/vae/checkpoints \
    --postnet_checkpoint outputs/postnet/checkpoints \
    --hifigan_checkpoint models/hifigan/generator.ckpt

echo "wrote $OUT"
