"""Stage 4 (new): HiFiGAN adversarial fine-tune with MPD/MSD discriminators.

The reference only gestures at GAN training (demo_vocoder.py:139-142);
this driver completes the story (BASELINE.json config 5): alternating
discriminator/generator steps with LSGAN + feature-matching + mel losses,
on (mel, audio) pairs cut from LJSpeech.
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

from iris_tts_tpu.data.ljspeech import LJSpeechVAEDataset
from iris_tts_tpu.data.native import load_audio
from iris_tts_tpu.models.discriminators import HiFiGANDiscriminators
from iris_tts_tpu.models.hifigan import HiFiGANGenerator
from iris_tts_tpu.train import TrainState
from iris_tts_tpu.train.checkpoint import CheckpointManager
from iris_tts_tpu.train.gan import make_gan_steps
from iris_tts_tpu.utils.metrics import MetricsWriter
from iris_tts_tpu.data.batching import prefetch_to_device
from scripts.common import (
    add_common_args,
    add_mesh_arg,
    mesh_training_placement,
    resolve_config,
    setup_logging,
    training_place_fn,
    add_bf16_arg,
    add_checkify_arg,
    compute_dtype_of,
    jit_train_step,
)

logger = logging.getLogger(__name__)


class AudioSegmentBatcher:
    """Random fixed-length (mel, audio) segment batches — the standard
    HiFi-GAN training regime (8192-sample segments).

    Conditioning mels are SLICED from the full-utterance cached mel rather
    than recomputed per crop: recomputing would center-pad each crop, so its
    edge frames (~12% of a 32-frame segment) would encode mirrored audio the
    discriminator never sees — a train/inference conditioning mismatch."""

    def __init__(self, dataset, batch_size: int, segment_frames: int,
                 audio_cfg, seed: int = 1337):
        self.dataset = dataset
        self.batch_size = batch_size
        self.segment_frames = segment_frames
        self.audio_cfg = audio_cfg
        self.seed = seed

    def num_batches(self) -> int:
        return max(1, len(self.dataset) // self.batch_size)

    def epoch(self, epoch: int):
        rng = np.random.default_rng(self.seed + epoch)
        hop = self.audio_cfg.hop_length
        seg_t = self.segment_frames
        order = rng.permutation(len(self.dataset))
        batch_mel, batch_audio = [], []
        for idx in order:
            sample = self.dataset[int(idx)]  # full-context cached mel
            sid = sample.file_id
            wav = load_audio(
                Path(self.dataset.root) / "wavs" / f"{sid}.wav",
                self.audio_cfg.sample_rate,
            )
            n_frames = min(sample.mel.shape[0], len(wav) // hop)
            if n_frames <= seg_t:
                continue
            start_frame = int(rng.integers(0, n_frames - seg_t))
            audio_seg = wav[start_frame * hop : (start_frame + seg_t) * hop]
            mel = sample.mel[start_frame : start_frame + seg_t]
            batch_mel.append(mel)
            batch_audio.append(audio_seg)
            if len(batch_mel) == self.batch_size:
                yield {
                    "mel": np.stack(batch_mel),
                    "audio": np.stack(batch_audio),
                }
                batch_mel, batch_audio = [], []


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--segment_frames", type=int, default=32,
                        help="mel frames per training segment (32 → 8192 "
                        "samples, the HiFi-GAN paper's segment size)")
    parser.add_argument(
        "--init_from_torch", type=str, default=None,
        help="warm-start generator from a torch generator.ckpt",
    )
    parser.add_argument(
        "--disc_width", type=float, default=1.0,
        help="discriminator channel scale (1.0 = paper sizes; smaller for "
        "smoke tests)",
    )
    parser.add_argument("--periods", type=int, nargs="+",
                        default=[2, 3, 5, 7, 11])
    parser.add_argument("--num_scales", type=int, default=3)
    parser.add_argument(
        "--accum_steps", type=int, default=1,
        help="gradient-accumulation microbatches per optimizer update on "
        "both GAN sides (effective batch = accum_steps * batch_size)",
    )
    add_mesh_arg(parser)
    add_bf16_arg(parser)
    add_checkify_arg(parser)
    parser.add_argument(
        "--remat", action="store_true",
        help="rematerialize MRF resblock activations in the generator's "
        "backward pass (jax.checkpoint): resblocks run at the upsampled "
        "audio rate and dominate GAN memory. (The discriminators are NOT "
        "rematerialized: every intermediate feature map is a RETURNED "
        "output — feature matching — so checkpointing would store them "
        "anyway and save nothing.)",
    )
    parser.add_argument(
        "--ema_decay", type=float, default=0.0,
        help="exponential-moving-average decay for the generator params "
        "(e.g. 0.999); the averaged generator is what the checkpoint's "
        "serving_params exposes, 0 disables",
    )
    args = parser.parse_args()
    setup_logging(args.verbose)
    cfg = resolve_config(args)

    ds = LJSpeechVAEDataset(
        args.data_root, args.alignment_dir, split="train",
        cache_dir=args.cache_dir, audio=cfg.audio,
    )
    batcher = AudioSegmentBatcher(
        ds, cfg.train.batch_size * args.accum_steps, args.segment_frames,
        cfg.audio, seed=cfg.train.seed,
    )

    key = jax.random.PRNGKey(cfg.train.seed)
    k_g, k_d = jax.random.split(key)
    gen = HiFiGANGenerator(config=cfg.hifigan)
    disc = HiFiGANDiscriminators(
        periods=tuple(args.periods), num_scales=args.num_scales,
        width=args.disc_width,
    )
    p_gen = jax.jit(gen.init)(
        k_g, jnp.zeros((1, args.segment_frames, cfg.hifigan.in_channels))
    )["params"]
    if args.init_from_torch:
        from iris_tts_tpu.convert.hifigan_torch import (
            convert_hifigan_state_dict,
            load_torch_checkpoint,
        )

        p_gen = convert_hifigan_state_dict(
            load_torch_checkpoint(args.init_from_torch), cfg.hifigan
        )
        logger.info("generator warm-started from %s", args.init_from_torch)
    seg_samples = args.segment_frames * cfg.audio.hop_length
    p_disc = jax.jit(disc.init)(k_d, jnp.zeros((2, seg_samples)))["params"]

    # AdamW β=(0.8, 0.99) per the HiFi-GAN paper.
    import optax

    def tx():
        return optax.chain(
            optax.clip_by_global_norm(cfg.train.clip_norm),
            optax.adam(cfg.train.learning_rate, b1=0.8, b2=0.99),
        )

    gen_state = TrainState.create(
        p_gen, tx(), k_g, ema_decay=args.ema_decay or None
    )
    disc_state = TrainState.create(p_disc, tx(), k_d)

    disc_step, gen_step = make_gan_steps(
        cfg, periods=tuple(args.periods), num_scales=args.num_scales,
        disc_width=args.disc_width, accum_steps=args.accum_steps,
        compute_dtype=compute_dtype_of(args), remat=args.remat,
    )
    # Each side donates ONLY its own updated state: disc_step(gen, disc,
    # batch) consumes disc (argnum 1); gen_step(gen, disc, batch) consumes
    # gen (argnum 0). The other side's state and the batch are read twice
    # per round and must stay live. --checkify swaps both for located
    # NaN/Inf/index-error checking (donation off in that mode).
    disc_step = jit_train_step(disc_step, checkify_enabled=args.checkify,
                               donate_argnums=1)
    gen_step = jit_train_step(gen_step, checkify_enabled=args.checkify,
                              donate_argnums=0)

    out = Path(args.output_dir) / "hifigan_gan"
    gen_ckpt = CheckpointManager(out / "gen", cfg)
    disc_ckpt = CheckpointManager(out / "disc", cfg)
    writer = MetricsWriter(out / "metrics.csv")

    # Full-state resume of BOTH sides (params+opt+RNG+EMA+epoch) — resuming
    # a GAN from generator weights alone restarts the discriminator cold,
    # which wrecks the adversarial balance (loop.resume_if_available is the
    # single-state version of this).
    start_epoch = 0
    g_step, d_step = gen_ckpt.latest_step(), disc_ckpt.latest_step()
    if g_step is not None and d_step is not None:
        # min(): a kill between the two sequential saves can leave one side
        # a save point ahead; resume from the last step BOTH sides have.
        step = min(g_step, d_step)
        gen_state = gen_ckpt.restore(gen_state, step=step)
        disc_state = disc_ckpt.restore(disc_state, step=step)
        start_epoch = int(gen_state.epoch)
        logger.info(
            "resumed GAN from step %d (epoch %d)",
            int(gen_state.step), start_epoch,
        )
    elif g_step is not None or d_step is not None:
        logger.warning(
            "only one GAN side has a checkpoint (gen=%s disc=%s); "
            "starting fresh — resuming half a GAN wrecks the adversarial "
            "balance", g_step, d_step,
        )

    place_batch = None  # training_place_fn default (jnp.asarray) off-mesh
    if args.mesh:
        # Both sides place identically (mesh placement after resume so
        # restored host arrays get sharded too). Batches shard over data;
        # --model_parallel additionally tensor-shards params + moments.
        gen_state, place_batch = mesh_training_placement(
            gen_state, accum_steps=args.accum_steps,
            model_parallel=args.model_parallel,
        )
        disc_state, _ = mesh_training_placement(
            disc_state, accum_steps=args.accum_steps,
            model_parallel=args.model_parallel,
        )
    # Collate + microbatch split + host→device transfer run on a prefetch
    # thread, overlapping the GAN steps' device compute (one placement:
    # numpy goes straight to its mesh sharding, never via a default-device
    # bounce).
    place = training_place_fn(place_batch, args.accum_steps)

    for epoch in range(start_epoch, cfg.train.num_epochs):
        # Device-side metric accumulation: float() every step would force a
        # host sync per batch (the TrainLoop pattern, loop.py:123).
        sums, n_steps = None, 0
        for batch in prefetch_to_device(
            batcher.epoch(epoch), size=2, place=place
        ):
            disc_state, dm = disc_step(gen_state, disc_state, batch)
            gen_state, gm = gen_step(gen_state, disc_state, batch)
            m = {**dm, **gm}
            n_steps += 1
            sums = m if sums is None else {k: sums[k] + m[k] for k in sums}
        means = (
            {k: float(v) / n_steps for k, v in sums.items()} if sums else {}
        )
        gen_state = gen_state.replace(
            epoch=jnp.asarray(epoch + 1, jnp.int32)
        )
        logger.info("epoch %d: %s", epoch + 1,
                    {k: round(v, 4) for k, v in means.items()})
        writer.write(int(gen_state.step), means)
        if (
            (epoch + 1) % cfg.train.checkpoint_every_epochs == 0
            or epoch + 1 == cfg.train.num_epochs
        ):
            # Async saves: the next epoch trains while both sides commit.
            gen_ckpt.save(int(gen_state.step), gen_state,
                          val_metric=means.get("gen_mel_l1"),
                          epoch=epoch + 1)
            disc_ckpt.save(int(disc_state.step), disc_state,
                           epoch=epoch + 1)
    # Settle in-flight commits before the process exits.
    gen_ckpt.wait_until_finished()
    disc_ckpt.wait_until_finished()


if __name__ == "__main__":
    main()
