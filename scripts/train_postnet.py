"""Stage 3: train the PostNet over a frozen encoder + VAE.

TPU-native rebuild of /root/reference/scripts/train_postnet.py:79-470: the
frozen VAE reconstruction runs inside the same jitted step, batch-stats live
in the train state, config read back from the stage-2 checkpoint so the
architecture can never drift (fixes SURVEY.md §2.6's PostNet mismatch bug).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from iris_tts_tpu.data.batching import BucketedBatcher
from iris_tts_tpu.data.ljspeech import LJSpeechVAEDataset
from iris_tts_tpu.models import PostNet
from iris_tts_tpu.train import (
    TrainState,
    adam_clipped,
    make_postnet_train_step,
)
from iris_tts_tpu.train.checkpoint import CheckpointManager
from iris_tts_tpu.train.loop import TrainLoop, resume_if_available
from iris_tts_tpu.utils.metrics import MetricsWriter
from scripts.common import (
    add_common_args,
    add_mesh_arg,
    mesh_training_placement,
    resolve_config,
    setup_logging,
    training_place_fn,
    add_bf16_arg,
    add_checkify_arg,
    jit_train_step,
    compute_dtype_of,
)
from scripts.train_vae import load_frozen_encoder


def load_frozen_vae(cfg, checkpoint_dir: str | Path, frozen_encoder=None):
    """Trained VAE params via template-free restore (optimizer-agnostic)."""
    del frozen_encoder  # kept for call-site compatibility
    mgr = CheckpointManager(Path(checkpoint_dir))
    params = mgr.restore_best_params()
    mgr.close()
    return params


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    add_mesh_arg(parser)
    add_bf16_arg(parser)
    add_checkify_arg(parser)
    parser.add_argument(
        "--encoder_checkpoint", type=str, default=None,
        help="stage-1 checkpoint dir (default: <output_dir>/encoder/checkpoints)",
    )
    parser.add_argument(
        "--vae_checkpoint", type=str, default=None,
        help="stage-2 checkpoint dir (default: <output_dir>/vae/checkpoints)",
    )
    parser.add_argument(
        "--vae_config", type=str, default=None,
        help="config persisted by stage 2 (default: "
        "<output_dir>/vae/config_vae.json; ensures matching architecture)",
    )
    args = parser.parse_args()
    setup_logging(args.verbose)
    out_root = Path(args.output_dir)
    if args.encoder_checkpoint is None:
        args.encoder_checkpoint = str(out_root / "encoder" / "checkpoints")
    if args.vae_checkpoint is None:
        args.vae_checkpoint = str(out_root / "vae" / "checkpoints")
    if args.vae_config is None:
        args.vae_config = str(out_root / "vae" / "config_vae.json")
    # Architecture comes from the stage-2 config file when available
    # (reference: train_postnet.py:110-133).
    if args.vae_config and Path(args.vae_config).exists():
        args.config = args.vae_config
    cfg = resolve_config(args)

    train_ds = LJSpeechVAEDataset(
        args.data_root, args.alignment_dir, split="train",
        cache_dir=args.cache_dir, audio=cfg.audio,
    )
    val_ds = LJSpeechVAEDataset(
        args.data_root, args.alignment_dir, split="val",
        cache_dir=args.cache_dir, audio=cfg.audio,
    )
    train_ds.precompute_mels()
    val_ds.precompute_mels()

    frozen_encoder = load_frozen_encoder(cfg, args.encoder_checkpoint)
    frozen_vae = load_frozen_vae(cfg, args.vae_checkpoint, frozen_encoder)

    key = jax.random.PRNGKey(cfg.train.seed)
    pn = PostNet(config=cfg.postnet)
    t0 = cfg.vae.down_factor * 4
    pn_vars = jax.jit(pn.init)(key, jnp.zeros((1, t0, cfg.postnet.n_mels)))

    batcher = BucketedBatcher(
        train_ds, cfg.train.batch_size, with_mel=True,
        down_factor=cfg.vae.down_factor, seed=cfg.train.seed,
    )
    steps_per_epoch = batcher.num_batches()
    tx = adam_clipped(cfg.train.learning_rate, clip_norm=cfg.train.clip_norm)
    template = TrainState.create(
        pn_vars["params"], tx, key,
        batch_stats=pn_vars["batch_stats"],
        frozen={"encoder": frozen_encoder, "vae": frozen_vae},
    )

    out = Path(args.output_dir) / "postnet"
    ckpt = CheckpointManager(
        out / "checkpoints", cfg,
        keep_every_n=cfg.train.checkpoint_every_epochs,
    )
    state, start_epoch = resume_if_available(ckpt, template, steps_per_epoch)

    # donate_argnums=0: see train_encoder.py — in-place state update.
    train_step = jit_train_step(
        make_postnet_train_step(
            cfg, compute_dtype=compute_dtype_of(args)
        ),
        checkify_enabled=args.checkify,
    )
    place_batch = None  # loop default (jnp.asarray) off-mesh
    if args.mesh:
        state, place_batch = mesh_training_placement(
            state, model_parallel=args.model_parallel
        )

    loop = TrainLoop(
        state=state,
        train_step=train_step,
        # Placement runs on the loop's prefetch thread.
        place_batch=training_place_fn(place_batch),
        batcher=batcher,
        num_epochs=cfg.train.num_epochs,
        checkpoints=ckpt,
        metrics=MetricsWriter(out / "metrics.csv"),
        val_metric_key="postnet_l1",
        checkpoint_every=cfg.train.checkpoint_every_epochs,
        start_epoch=start_epoch,
    )
    loop.run()


if __name__ == "__main__":
    main()
