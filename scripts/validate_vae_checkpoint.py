"""Validate a trained VAE checkpoint: recon/KL metrics + generate smoke test.

TPU-native rebuild of /root/reference/scripts/validate_vae_checkpoint.py:
146-241 — masked recon L1, KL, and composite over N validation batches, then
a prior-sample generation check.
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
from iris_tts_tpu.data.ljspeech import LJSpeechVAEDataset
from iris_tts_tpu.models import TextConditionedVAE
from iris_tts_tpu.train import make_vae_eval_step, make_vae_recon_step
from iris_tts_tpu.utils.metrics import RunningMean, quality_report
from scripts.common import add_common_args, resolve_config, setup_logging
from scripts.train_postnet import load_frozen_vae
from scripts.train_vae import load_frozen_encoder

logger = logging.getLogger(__name__)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument(
        "--encoder_checkpoint", type=str,
        default="outputs/encoder/checkpoints",
    )
    parser.add_argument(
        "--vae_checkpoint", type=str, default="outputs/vae/checkpoints"
    )
    parser.add_argument("--num_batches", type=int, default=10)
    parser.add_argument("--kl_weight", type=float, default=0.01)
    args = parser.parse_args()
    setup_logging(args.verbose)
    vae_cfg_file = Path(args.vae_checkpoint) / "config.json"
    if vae_cfg_file.exists():
        args.config = str(vae_cfg_file)
    cfg = resolve_config(args)

    val_ds = LJSpeechVAEDataset(
        args.data_root, args.alignment_dir, split="val",
        cache_dir=args.cache_dir, audio=cfg.audio,
    )
    val_ds.precompute_mels()

    frozen_encoder = load_frozen_encoder(cfg, args.encoder_checkpoint)
    vae_params = load_frozen_vae(cfg, args.vae_checkpoint, frozen_encoder)

    eval_step = jax.jit(make_vae_eval_step(cfg))
    recon_step = jax.jit(make_vae_recon_step(cfg))
    batcher = BucketedBatcher(
        val_ds, cfg.train.batch_size, with_mel=True,
        down_factor=cfg.vae.down_factor, seed=0,
    )
    rm = RunningMean()
    n_batches = 0
    for batch in batcher.epoch(0):
        if n_batches >= args.num_batches:
            break
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        m = eval_step(
            vae_params, {"encoder": frozen_encoder}, batch,
            jnp.asarray(args.kl_weight),
        )
        rm.update({k: float(v) for k, v in m.items()})
        # Objective quality on the reconstruction (posterior mean): MCD +
        # LSD per utterance, trimmed to true frames. Replaces the
        # reference's loss-only validation (validate_vae_checkpoint.py:146-212).
        recon, frame_mask = recon_step(
            vae_params, {"encoder": frozen_encoder}, batch
        )
        recon, mask_np = np.asarray(recon), np.asarray(frame_mask)
        gt = np.asarray(batch["mel"])
        for i in range(recon.shape[0]):
            n = int((mask_np[i] > 0).sum())
            if n >= 4:
                rm.update(quality_report(recon[i, :n], gt[i, :n]))
        n_batches += 1
    means = rm.means()
    if not means:
        logger.error(
            "no validation batches (val split has %d utterances); use a "
            "larger corpus or val_fraction", len(val_ds),
        )
        return
    logger.info("validation over %d batches: %s", n_batches,
                {k: round(v, 5) for k, v in means.items()})

    # Quality rubric (reference: analyze_vae.py:240-245).
    recon = means["recon_l1"]
    verdict = (
        "not trained well" if recon > 5
        else "could be better" if recon > 1
        else "reasonable"
    )
    logger.info("recon L1 %.4f → %s", recon, verdict)
    if "mcd_db" in means:
        logger.info(
            "reconstruction quality: MCD=%.2f dB  LSD=%.2f dB "
            "(trained TTS recon typically well under the ~4-8 dB "
            "synthesis range; unrelated speech >10 dB)",
            means["mcd_db"], means["lsd_db"],
        )

    # Generation smoke test (reference: validate_vae_checkpoint.py:216-241).
    vae = TextConditionedVAE(config=cfg.vae)
    T = 64
    cond = jnp.zeros((1, T, cfg.vae.cond_dim))
    mel, _ = jax.jit(
        lambda p, c, k: vae.apply(
            {"params": p}, c, method=TextConditionedVAE.generate,
            rngs={"sample": k},
        )
    )(vae_params, cond, jax.random.PRNGKey(0))
    mel_np = np.asarray(mel)
    logger.info(
        "generate(): shape=%s mean=%.3f std=%.3f finite=%s",
        mel_np.shape, mel_np.mean(), mel_np.std(),
        bool(np.isfinite(mel_np).all()),
    )
    if mel_np.std() < 0.5:
        logger.warning(
            "low output variance — possible mode collapse "
            "(reference heuristic: analyze_vae.py:247-254)"
        )


if __name__ == "__main__":
    main()
