"""Stage 2: train the text-conditioned VAE with a frozen encoder.

TPU-native rebuild of /root/reference/scripts/train_vae.py:109-568: device-
side frame conditioning (no per-step numpy bounce), cached mels, bucketed
shapes, annealed-KL composite loss, full-state resume.

Usage:
    python scripts/train_vae.py --encoder_checkpoint outputs/encoder/checkpoints
"""

from __future__ import annotations

import argparse
import sys
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from iris_tts_tpu.data.batching import BucketedBatcher
from iris_tts_tpu.data.ljspeech import LJSpeechVAEDataset
from iris_tts_tpu.models import TextConditionedVAE
from iris_tts_tpu.train import (
    TrainState,
    adam_clipped,
    kl_weight_schedule,
    make_vae_eval_step,
    make_vae_train_step,
    warmup_cosine,
)
from iris_tts_tpu.train.checkpoint import CheckpointManager
from iris_tts_tpu.train.loop import TrainLoop, resume_if_available
from iris_tts_tpu.utils.metrics import MetricsWriter
from scripts.common import (
    add_common_args,
    add_mesh_arg,
    mesh_training_placement,
    persist_config,
    resolve_config,
    setup_logging,
    training_place_fn,
    add_bf16_arg,
    add_checkify_arg,
    jit_train_step,
    compute_dtype_of,
)


def load_frozen_encoder(cfg, checkpoint_dir: str | Path):
    """Pull trained encoder params out of a stage-1 checkpoint via a
    template-free restore (the stage's optimizer structure is irrelevant
    here; reference equivalent: train_vae.py:188-208)."""
    mgr = CheckpointManager(Path(checkpoint_dir))
    params = mgr.restore_best_params()
    mgr.close()
    return params["encoder"]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument(
        "--encoder_checkpoint", type=str, default=None,
        help="stage-1 checkpoint dir (default: <output_dir>/encoder/checkpoints)",
    )
    parser.add_argument("--max_frames", type=int, default=2048)
    parser.add_argument(
        "--accum_steps", type=int, default=1,
        help="gradient-accumulation microbatches per optimizer update: the "
        "effective batch is accum_steps * batch_size in the device memory "
        "of one batch_size (train.steps.split_microbatches)",
    )
    add_mesh_arg(parser)
    add_bf16_arg(parser)
    add_checkify_arg(parser)
    parser.add_argument(
        "--remat", action="store_true",
        help="rematerialize WaveNet-block activations in the backward "
        "pass (jax.checkpoint): ~num_blocks x less activation memory for "
        "one extra block forward — bigger batches / longer mels per chip",
    )
    args = parser.parse_args()
    setup_logging(args.verbose)
    if args.encoder_checkpoint is None:
        args.encoder_checkpoint = str(
            Path(args.output_dir) / "encoder" / "checkpoints"
        )
    cfg = resolve_config(args)

    train_ds = LJSpeechVAEDataset(
        args.data_root, args.alignment_dir, split="train",
        cache_dir=args.cache_dir, audio=cfg.audio,
        max_frames=args.max_frames,
    )
    val_ds = LJSpeechVAEDataset(
        args.data_root, args.alignment_dir, split="val",
        cache_dir=args.cache_dir, audio=cfg.audio,
        max_frames=args.max_frames,
    )
    print(f"precomputing mel cache: {train_ds.precompute_mels()} new")
    val_ds.precompute_mels()

    cfg = replace(
        cfg, encoder=replace(cfg.encoder, vocab_size=len(train_ds.vocab))
    )
    out = Path(args.output_dir) / "vae"
    persist_config(cfg, out, "config_vae.json")

    frozen_encoder = load_frozen_encoder(cfg, args.encoder_checkpoint)

    key = jax.random.PRNGKey(cfg.train.seed)
    vae = TextConditionedVAE(config=cfg.vae)
    t0 = cfg.vae.down_factor * 4
    p_vae = jax.jit(vae.init)(
        {"params": key, "sample": key},
        jnp.zeros((1, t0, cfg.vae.n_mels)),
        jnp.zeros((1, t0, cfg.vae.cond_dim)),
    )["params"]

    batcher = BucketedBatcher(
        train_ds, cfg.train.batch_size * args.accum_steps, with_mel=True,
        down_factor=cfg.vae.down_factor, seed=cfg.train.seed,
    )
    val_batcher = BucketedBatcher(
        val_ds, cfg.train.batch_size, with_mel=True,
        down_factor=cfg.vae.down_factor, seed=0,
    )
    steps_per_epoch = batcher.num_batches()
    schedule = warmup_cosine(
        cfg.train.learning_rate,
        cfg.train.warmup_epochs * steps_per_epoch,
        cfg.train.num_epochs * steps_per_epoch,
    )
    tx = adam_clipped(schedule, clip_norm=cfg.train.clip_norm)
    template = TrainState.create(
        p_vae, tx, key, frozen={"encoder": frozen_encoder}
    )

    ckpt = CheckpointManager(
        out / "checkpoints", cfg,
        keep_every_n=cfg.train.checkpoint_every_epochs,
    )
    state, start_epoch = resume_if_available(ckpt, template, steps_per_epoch)

    def kl_extras(epoch: int):
        # Linear KL annealing (reference: train_vae.py:232-239).
        return (
            kl_weight_schedule(
                epoch, cfg.train.kl_weight_start, cfg.train.kl_weight_end,
                cfg.train.kl_anneal_epochs,
            ),
        )

    place_batch = None  # loop default (jnp.asarray) off-mesh
    if args.mesh:
        state, place_batch = mesh_training_placement(
            state, accum_steps=args.accum_steps,
            model_parallel=args.model_parallel,
        )

    # donate_argnums=0: see train_encoder.py — in-place state update.
    train_step = jit_train_step(
        make_vae_train_step(cfg, accum_steps=args.accum_steps,
                            compute_dtype=compute_dtype_of(args),
                            remat=args.remat),
        checkify_enabled=args.checkify,
    )
    loop = TrainLoop(
        state=state,
        train_step=train_step,
        # Microbatch split + placement run on the prefetch thread.
        place_batch=training_place_fn(place_batch, args.accum_steps),
        batcher=batcher,
        num_epochs=cfg.train.num_epochs,
        checkpoints=ckpt,
        metrics=MetricsWriter(out / "metrics.csv"),
        eval_step=jax.jit(make_vae_eval_step(cfg)),
        val_batcher=val_batcher,
        epoch_extras=kl_extras,
        val_metric_key="total",
        checkpoint_every=cfg.train.checkpoint_every_epochs,
        start_epoch=start_epoch,
    )
    loop.run()


if __name__ == "__main__":
    main()
