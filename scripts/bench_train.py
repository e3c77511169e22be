"""Training-throughput benchmark: VAE or GAN train step.

Measures steady-state jitted train-step time on the production
architecture at a realistic bucket shape, reporting mel-frames/sec and
steps/sec. Uses synthetic batches shaped exactly like the LJSpeech bucketed
pipeline, so the number isolates device throughput from disk IO.

``--stage vae`` (default, BASELINE.json config 3): the flagship acoustic
training loop. ``--stage gan``: one discriminator step + one generator
step of HiFiGAN fine-tuning on 8192-sample segments (the standard
regime; the reference has no GAN training at all — SURVEY.md §2.2).

    python scripts/bench_train.py [--batch_size 16] [--frames 1024]
    python scripts/bench_train.py --stage gan [--batch_size 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--frames", type=int, default=1024)
    parser.add_argument("--phonemes", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--bf16", action="store_true",
                        help="mixed-precision step (bf16 compute, f32 "
                        "params/grads) — the --bf16 training-CLI path")
    parser.add_argument("--stage", choices=["vae", "gan"], default="vae")
    parser.add_argument("--segment_frames", type=int, default=32,
                        help="GAN stage: mel frames per training segment "
                        "(32 frames = 8192 samples, the standard regime)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from iris_tts_tpu.config import IrisConfig
    from iris_tts_tpu.models import PhonemeEncoder, TextConditionedVAE
    from iris_tts_tpu.train import TrainState, adam_clipped, make_vae_train_step

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = IrisConfig()
    if args.stage == "gan":
        _bench_gan(args, cfg)
        return
    B, P, T = args.batch_size, args.phonemes, args.frames
    if T % max(1, P) != 0 or T // P < 1:
        parser.error(f"--frames ({T}) must be a positive multiple of "
                     f"--phonemes ({P})")
    if T % cfg.vae.down_factor != 0:
        parser.error(f"--frames ({T}) must be a multiple of the VAE "
                     f"downsample factor ({cfg.vae.down_factor})")

    key = jax.random.PRNGKey(0)
    encoder = PhonemeEncoder(config=cfg.encoder)
    vae = TextConditionedVAE(config=cfg.vae)
    p_enc = jax.jit(encoder.init)(key, jnp.zeros((1, P), jnp.int32))["params"]
    p_vae = jax.jit(vae.init)(
        {"params": key, "sample": key},
        jnp.zeros((1, T, cfg.vae.n_mels)),
        jnp.zeros((1, T, cfg.vae.cond_dim)),
    )["params"]
    state = TrainState.create(
        p_vae, adam_clipped(1e-4, clip_norm=1.0), key,
        frozen={"encoder": p_enc},
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(p_vae))
    print(f"VAE params: {n_params:,}", file=sys.stderr)

    rng = np.random.default_rng(0)
    batch = {
        "phoneme_ids": jnp.asarray(
            rng.integers(2, cfg.encoder.vocab_size, (B, P)), jnp.int32
        ),
        "phoneme_mask": jnp.ones((B, P), jnp.float32),
        "durations": jnp.full((B, P), T // P, jnp.float32),
        "mel": jnp.asarray(
            rng.standard_normal((B, T, cfg.vae.n_mels)).astype(np.float32)
        ),
    }
    kl_w = jnp.asarray(0.01)
    # donate_argnums=0 matches the training CLIs: the state updates in
    # place, so the bench measures the deployed memory/throughput shape.
    step = jax.jit(
        make_vae_train_step(
            cfg, compute_dtype=jnp.bfloat16 if args.bf16 else None
        ),
        donate_argnums=0,
    )

    t0 = time.time()
    state, metrics = step(state, batch, kl_w)
    checksum = float(metrics["total"])
    print(f"compile+first: {time.time()-t0:.1f}s (loss {checksum:.4f})",
          file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        state, metrics = step(state, batch, kl_w)
        float(metrics["total"])  # force
        times.append(time.time() - t0)
    dt = min(times)
    frames_per_sec = B * T / dt
    audio_sec_per_sec = frames_per_sec * cfg.audio.hop_length / cfg.audio.sample_rate
    print(
        f"steady: {dt*1e3:.1f} ms/step, {frames_per_sec:,.0f} mel-frames/s "
        f"({audio_sec_per_sec:.1f}s of audio trained per second)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "vae_train_mel_frames_per_sec",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "step_ms": round(dt * 1e3, 2),
        "batch": [B, T],
        "dtype": "bf16" if args.bf16 else "f32",
    }))


def _bench_gan(args, cfg) -> None:
    """One disc step + one gen step per iteration (the alternating regime
    of scripts/train_hifigan.py) on synthetic 8192-sample segments."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from iris_tts_tpu.models import HiFiGANGenerator
    from iris_tts_tpu.models.discriminators import HiFiGANDiscriminators
    from iris_tts_tpu.train import TrainState, adam_clipped
    from iris_tts_tpu.train.gan import make_gan_steps

    B, seg = args.batch_size, args.segment_frames
    hop = cfg.hifigan.total_upsample
    dt = jnp.bfloat16 if args.bf16 else None
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    gen = HiFiGANGenerator(config=cfg.hifigan)
    disc = HiFiGANDiscriminators()
    mel = jnp.asarray(
        rng.standard_normal((B, seg, cfg.hifigan.in_channels)), jnp.float32
    )
    audio = jnp.asarray(
        0.1 * rng.standard_normal((B, seg * hop)), jnp.float32
    )
    g_params = jax.jit(gen.init)(key, mel[:1])["params"]
    d_params = jax.jit(disc.init)(key, audio[:1])["params"]
    n_g = sum(x.size for x in jax.tree_util.tree_leaves(g_params))
    n_d = sum(x.size for x in jax.tree_util.tree_leaves(d_params))
    print(f"generator params: {n_g:,}  discriminators: {n_d:,}",
          file=sys.stderr)
    # Distinct key arrays: donation frees each state's buffers in place, so
    # the two states must not alias (incl. the PRNG key).
    k_g, k_d = jax.random.split(key)
    g_state = TrainState.create(g_params, adam_clipped(2e-4), k_g)
    d_state = TrainState.create(d_params, adam_clipped(2e-4), k_d)
    batch = {"mel": mel, "audio": audio}

    disc_step, gen_step = make_gan_steps(cfg, compute_dtype=dt)
    disc_step = jax.jit(disc_step, donate_argnums=1)
    gen_step = jax.jit(gen_step, donate_argnums=0)

    t0 = time.time()
    d_state, dm = disc_step(g_state, d_state, batch)
    g_state, gm = gen_step(g_state, d_state, batch)
    losses = {k: float(v) for k, v in {**dm, **gm}.items()}
    print(f"compile+first: {time.time()-t0:.1f}s "
          f"(disc {losses['disc_loss']:.3f} gen {losses['gen_total']:.3f})",
          file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        d_state, dm = disc_step(g_state, d_state, batch)
        g_state, gm = gen_step(g_state, d_state, batch)
        float(gm["gen_total"])  # force both (gen consumed disc's update)
        times.append(time.time() - t0)
    dt_s = min(times)
    samples_per_sec = B * seg * hop / dt_s
    audio_sec_per_sec = samples_per_sec / cfg.audio.sample_rate
    print(
        f"steady: {dt_s*1e3:.1f} ms per disc+gen pair, "
        f"{audio_sec_per_sec:.1f}s of audio trained per second",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "gan_train_audio_sec_per_sec",
        "value": round(audio_sec_per_sec, 2),
        "unit": "audio_s/s",
        "step_ms": round(dt_s * 1e3, 2),
        "batch": [B, seg],
        "dtype": "bf16" if args.bf16 else "f32",
    }))


if __name__ == "__main__":
    main()
