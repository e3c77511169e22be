"""Training-throughput benchmark: VAE train step (BASELINE.json config 3).

Measures steady-state jitted VAE train-step time on the production
architecture at a realistic bucket shape, reporting mel-frames/sec and
steps/sec. Uses synthetic batches shaped exactly like the LJSpeech bucketed
pipeline, so the number isolates device throughput from disk IO.

    python scripts/bench_train.py [--batch_size 16] [--frames 1024]
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
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from iris_tts_tpu.config import IrisConfig
    from iris_tts_tpu.models import PhonemeEncoder, TextConditionedVAE
    from iris_tts_tpu.train import TrainState, adam_clipped, make_vae_train_step

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = IrisConfig()
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


if __name__ == "__main__":
    main()
