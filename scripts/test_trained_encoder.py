"""Evaluate a trained duration model: MAE/RMSE/correlation + verdicts.

TPU-native rebuild of /root/reference/scripts/test_trained_encoder.py:
239-302 including its tiered quality rubric (MAE < 5 frames = EXCELLENT,
< 10 good, < 20 fair, ≥ 20 poor; 1 frame = 11.6 ms).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.data.batching import BucketedBatcher
from iris_tts_tpu.data.ljspeech import LJSpeechDurationDataset
from iris_tts_tpu.models import DurationPredictor, PhonemeEncoder
from iris_tts_tpu.train.checkpoint import CheckpointManager
from scripts.common import add_common_args, resolve_config, setup_logging

logger = logging.getLogger(__name__)

VERDICTS = [(5, "EXCELLENT"), (10, "GOOD"), (20, "FAIR"), (1e9, "POOR")]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument(
        "--encoder_checkpoint", type=str,
        default="outputs/encoder/checkpoints",
    )
    parser.add_argument("--num_samples", type=int, default=100)
    args = parser.parse_args()
    setup_logging(args.verbose)
    cfg_file = Path(args.encoder_checkpoint) / "config.json"
    if cfg_file.exists():
        args.config = str(cfg_file)
    cfg = resolve_config(args)

    val_ds = LJSpeechDurationDataset(
        args.data_root, args.alignment_dir, split="val",
        cache_dir=args.cache_dir, audio=cfg.audio,
    )

    encoder = PhonemeEncoder(config=cfg.encoder)
    head = DurationPredictor(config=cfg.duration)
    mgr = CheckpointManager(Path(args.encoder_checkpoint))
    params = mgr.restore_best_params()
    mgr.close()

    @jax.jit
    def predict(params, ids, mask):
        enc = encoder.apply(
            {"params": params["encoder"]}, ids, padding_mask=mask
        )
        log_d = head.apply({"params": params["duration"]}, enc)
        return jnp.exp(log_d) - 1.0  # linear frames

    batcher = BucketedBatcher(val_ds, 16, with_mel=False, seed=0)
    maes, rmses, corrs = [], [], []
    n_seen = 0
    for batch in batcher.epoch(0):
        pred = np.asarray(
            predict(
                params,
                jnp.asarray(batch["phoneme_ids"]),
                jnp.asarray(batch["phoneme_mask"]),
            )
        )
        for b in range(pred.shape[0]):
            m = batch["phoneme_mask"][b] > 0
            if m.sum() < 2 or n_seen >= args.num_samples:
                continue
            p, t = pred[b][m], batch["durations"][b][m]
            maes.append(np.abs(p - t).mean())
            rmses.append(np.sqrt(((p - t) ** 2).mean()))
            if np.std(p) > 1e-6 and np.std(t) > 1e-6:
                corrs.append(np.corrcoef(p, t)[0, 1])
            n_seen += 1
        if n_seen >= args.num_samples:
            break

    if not maes:
        logger.error(
            "no evaluable validation samples (val split has %d utterances); "
            "train with a larger corpus or val_fraction", len(val_ds),
        )
        return
    mae = float(np.mean(maes))
    frame_ms = cfg.audio.hop_length / cfg.audio.sample_rate * 1000
    verdict = next(v for thresh, v in VERDICTS if mae < thresh)
    logger.info(
        "%d samples: MAE %.2f frames (%.1f ms), RMSE %.2f, corr %.3f → %s",
        n_seen, mae, mae * frame_ms, float(np.mean(rmses)),
        float(np.mean(corrs)) if corrs else float("nan"), verdict,
    )


if __name__ == "__main__":
    main()
