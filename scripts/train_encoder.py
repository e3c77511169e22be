"""Stage 1: train the phoneme encoder + duration predictor on LJSpeech/MFA.

TPU-native rebuild of /root/reference/scripts/train_encoder.py:55-352: one
jitted train step (masked attention + Huber duration loss), bucketed static
shapes, optax warmup+cosine, full-state Orbax checkpoints with resume.

Usage:
    python scripts/train_encoder.py --data_root data/LJSpeech-1.1 \
        --alignment_dir data/aligned --num_epochs 100
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
from iris_tts_tpu.data.ljspeech import LJSpeechDurationDataset
from iris_tts_tpu.models import DurationPredictor, PhonemeEncoder
from iris_tts_tpu.train import (
    TrainState,
    adam_clipped,
    make_duration_eval_step,
    make_duration_train_step,
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


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--max_phoneme_length", type=int, default=256)
    parser.add_argument(
        "--accum_steps", type=int, default=1,
        help="gradient-accumulation microbatches per optimizer update "
        "(effective batch = accum_steps * batch_size)",
    )
    add_mesh_arg(parser)
    add_bf16_arg(parser)
    add_checkify_arg(parser)
    args = parser.parse_args()
    setup_logging(args.verbose)
    cfg = resolve_config(args)

    train_ds = LJSpeechDurationDataset(
        args.data_root, args.alignment_dir, split="train",
        cache_dir=args.cache_dir, audio=cfg.audio,
        max_phoneme_length=args.max_phoneme_length,
    )
    val_ds = LJSpeechDurationDataset(
        args.data_root, args.alignment_dir, split="val",
        cache_dir=args.cache_dir, audio=cfg.audio,
        max_phoneme_length=args.max_phoneme_length,
    )
    cfg = replace(
        cfg, encoder=replace(cfg.encoder, vocab_size=len(train_ds.vocab))
    )
    out = Path(args.output_dir) / "encoder"
    persist_config(cfg, out, "config_encoder.json")

    key = jax.random.PRNGKey(cfg.train.seed)
    encoder = PhonemeEncoder(config=cfg.encoder)
    head = DurationPredictor(config=cfg.duration)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    p_enc = jax.jit(encoder.init)(key, ids0)["params"]
    p_head = jax.jit(head.init)(
        key, jax.jit(encoder.apply)({"params": p_enc}, ids0)
    )["params"]

    batcher = BucketedBatcher(
        train_ds, cfg.train.batch_size * args.accum_steps, with_mel=False,
        seed=cfg.train.seed,
    )
    val_batcher = BucketedBatcher(
        val_ds, cfg.train.batch_size, with_mel=False, seed=0,
    )
    steps_per_epoch = batcher.num_batches()
    schedule = warmup_cosine(
        cfg.train.learning_rate,
        cfg.train.warmup_epochs * steps_per_epoch,
        cfg.train.num_epochs * steps_per_epoch,
    )
    tx = adam_clipped(schedule, clip_norm=cfg.train.clip_norm)
    template = TrainState.create(
        {"encoder": p_enc, "duration": p_head}, tx, key
    )

    ckpt = CheckpointManager(
        out / "checkpoints", cfg,
        keep_every_n=cfg.train.checkpoint_every_epochs,
    )
    state, start_epoch = resume_if_available(ckpt, template, steps_per_epoch)

    place_batch = None  # loop default (jnp.asarray) off-mesh
    if args.mesh:
        state, place_batch = mesh_training_placement(
            state, accum_steps=args.accum_steps,
            model_parallel=args.model_parallel,
        )

    # donate_argnums=0: the previous TrainState's buffers alias the new
    # one in place (halves the params+opt-state footprint of the update).
    # Safe with async checkpointing because orbax performs the
    # device→host copy INSIDE the blocking part of save() (only the disk
    # commit is backgrounded) — by the time the loop can call the next
    # donating step, the checkpoint no longer reads device buffers. A
    # checkpoint writer that defers the device fetch to its background
    # thread would break this invariant.
    train_step = jit_train_step(
        make_duration_train_step(cfg, accum_steps=args.accum_steps,
                                 compute_dtype=compute_dtype_of(args)),
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
        eval_step=jax.jit(make_duration_eval_step(cfg)),
        val_batcher=val_batcher,
        val_metric_key="duration_loss",
        checkpoint_every=cfg.train.checkpoint_every_epochs,
        start_epoch=start_epoch,
        uses_frozen_in_eval=False,
    )
    loop.run()


if __name__ == "__main__":
    main()
