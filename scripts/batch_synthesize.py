"""Bucketed batched synthesis: N utterances sharded data-parallel on a mesh.

BASELINE.json config 4: 256 utterances, length-bucketed jit caches, batch
dim sharded over the ``data`` mesh axis. Works identically on one chip, a
pod slice, or virtual CPU devices (--force_cpu_devices for testing).

Usage:
    python scripts/batch_synthesize.py --text_file sentences.txt \
        --output_dir outputs/batch --random_weights
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logger = logging.getLogger(__name__)

DEFAULT_SENTENCES = [
    "The quick brown fox jumps over the lazy dog.",
    "Hello world, this is a test of batched synthesis.",
    "Speech synthesis on tensor processing units is fast.",
    "Numbers like 42 and $3.50 are verbalised by rule.",
]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--text_file", type=str, default=None,
                        help="one utterance per line")
    parser.add_argument("--num_utterances", type=int, default=256)
    parser.add_argument("--output_dir", type=str, default="outputs/batch")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--random_weights", action="store_true")
    parser.add_argument("--encoder_checkpoint", type=str,
                        default="outputs/encoder/checkpoints")
    parser.add_argument("--vae_checkpoint", type=str,
                        default="outputs/vae/checkpoints")
    parser.add_argument("--postnet_checkpoint", type=str, default=None)
    parser.add_argument("--hifigan_checkpoint", type=str, default=None)
    parser.add_argument("--lexicon_path", type=str, default=None)
    parser.add_argument("--write_wavs", action="store_true")
    parser.add_argument("--force_cpu_devices", type=int, default=0,
                        help="N virtual CPU devices (testing without TPUs)")
    parser.add_argument("--seed", type=int, default=1337)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    from scripts.common import setup_logging

    setup_logging(args.verbose)

    if args.force_cpu_devices:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    from iris_tts_tpu.utils.tpu import wait_for_devices

    devices = wait_for_devices()
    logger.info("devices: %s", devices)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from iris_tts_tpu.config import IrisConfig, MeshConfig
    from iris_tts_tpu.data.audio_io import write_wav
    from iris_tts_tpu.models.pipeline import TTSPipeline, pick_bucket
    from iris_tts_tpu.ops.length import round_up_to_multiple
    from iris_tts_tpu.parallel.mesh import build_mesh, replicate_params
    from iris_tts_tpu.parallel.sharding import batch_sharding_tree
    from iris_tts_tpu.utils.metrics import SynthesisMeter

    if args.text_file:
        texts = [
            l.strip()
            for l in Path(args.text_file).read_text().splitlines()
            if l.strip()
        ]
    else:
        texts = [
            DEFAULT_SENTENCES[i % len(DEFAULT_SENTENCES)]
            for i in range(args.num_utterances)
        ]
    logger.info("%d utterances", len(texts))

    if args.random_weights:
        pipe = TTSPipeline.initialize(
            IrisConfig(), lexicon_path=args.lexicon_path, seed=args.seed
        )
    else:
        pipe = TTSPipeline.from_checkpoints(
            args.encoder_checkpoint, args.vae_checkpoint,
            postnet_checkpoint=args.postnet_checkpoint,
            hifigan_checkpoint=args.hifigan_checkpoint,
            lexicon_path=args.lexicon_path,
        )

    mesh_cfg = MeshConfig()
    mesh = build_mesh(mesh_cfg)
    logger.info("mesh: %s", dict(mesh.shape))
    multi_device = len(mesh.devices.flat) > 1
    if multi_device:
        pipe.params = replicate_params(pipe.params, mesh)
    else:
        # Single device: skip explicit NamedSharding placement — identical
        # semantics, and some PJRT backends take a dramatically slower
        # execution path for explicitly-sharded single-device programs.
        logger.info("single device: running unsharded")

    # Host frontend: encode all texts, group into batches by phoneme bucket.
    encoded = [pipe.text_processor.text_to_ids(t, pipe.vocab) for t in texts]
    order = sorted(range(len(texts)), key=lambda i: len(encoded[i]))
    meter = SynthesisMeter(
        pipe.config.audio.sample_rate, pipe.config.audio.hop_length
    )
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    dp = mesh.shape[mesh_cfg.data_axis]
    bs = max(args.batch_size, dp)
    bs -= bs % dp  # divisible by data-parallel degree

    def _make_batch(idxs):
        seqs = [encoded[i] for i in idxs]
        p_bucket = pick_bucket(
            max(len(s) for s in seqs), pipe.phoneme_buckets
        )
        ids = np.full((bs, p_bucket), pipe.vocab.pad_id, np.int32)
        lengths = np.zeros((bs,), np.int32)
        for r, s in enumerate(seqs):
            n = min(len(s), p_bucket)
            ids[r, :n] = s[:n]
            lengths[r] = n
        batch = {"ids": jnp.asarray(ids), "lengths": jnp.asarray(lengths)}
        if multi_device:
            batch = batch_sharding_tree(batch, mesh, mesh_cfg)
        return batch, p_bucket

    # Two sweeps: ALL stage-A batches first, then stage-B batches grouped by
    # frame bucket. Consecutive invocations reuse the same loaded executable
    # (per-bucket), which matters both for remote-attached chips (expensive
    # executable switches) and for icache/HBM locality on real pods.
    meter.start()
    staged = []
    for start in range(0, len(order), bs):
        idxs = order[start : start + bs]
        while len(idxs) < bs:  # pad final batch (masked out by trimming)
            idxs.append(idxs[-1])
        batch, p_bucket = _make_batch(idxs)
        enc, frames, total_arr = pipe._stage_a(
            pipe.params, batch["ids"], batch["lengths"]
        )
        staged.append((idxs, p_bucket, enc, frames, total_arr))

    n_done = 0
    factor = pipe.config.vae.down_factor
    hop = pipe.config.hifigan.total_upsample
    by_bucket = {}
    for item in staged:
        total = int(item[4])
        t_bucket = pick_bucket(
            round_up_to_multiple(max(total, factor), factor),
            pipe.frame_buckets,
        )
        by_bucket.setdefault(t_bucket, []).append(item)

    meter_total_samples = 0
    for t_bucket, group in sorted(by_bucket.items()):
        for gi, (idxs, p_bucket, enc, frames, _) in enumerate(group):
            audio, mel, n_frames_arr = pipe._stage_b(
                pipe.params, enc, frames,
                jnp.asarray(args.seed + n_done, jnp.int32),
                total_frames=t_bucket,
                use_postnet=pipe.use_postnet,
                upsample=pipe.upsample,
            )
            n_frames = np.asarray(n_frames_arr).astype(int)
            audio_np = np.asarray(audio)
            # Count only unique rows: the final partial batch is padded with
            # duplicate rows, which must not inflate the realtime factor.
            uniq = [r for r, i in enumerate(idxs)
                    if r == 0 or i != idxs[r - 1]]
            meter_total_samples += int(n_frames[uniq].sum()) * hop

            if args.write_wavs:
                for r, i in enumerate(idxs):
                    if r > 0 and idxs[r] == idxs[r - 1]:
                        continue  # padding repeat
                    write_wav(
                        out_dir / f"utt_{i:04d}.wav",
                        audio_np[r, : n_frames[r] * hop],
                        pipe.config.audio.sample_rate,
                    )
            n_done += len(set(idxs))
            logger.info(
                "bucket T=%d batch %d: P=%d → %d utterances done",
                t_bucket, gi, p_bucket, n_done,
            )
    meter.stop(meter_total_samples)

    summary = meter.summary()
    logger.info("== batched synthesis summary ==")
    for k, v in summary.items():
        logger.info("  %s: %.3f", k, v)


if __name__ == "__main__":
    main()
