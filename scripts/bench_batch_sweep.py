"""Synthesis throughput vs batch size on the real chip.

Sweeps the batched two-stage synthesis executable over batch sizes with
the same pipelined chained-accumulator measurement bench.py uses (one
forcing host fetch per loop, not per step — see bench.py:183-195), and
prints one JSON line per batch with mel frames/s, realtime factor, and
the marginal scaling efficiency vs the previous point. Locates the
throughput knee: the roofline (scripts/roofline.py, docs/PERF.md) says
the vocoder is HBM-bound, so frames/s should climb until the per-
dispatch fixed cost is amortized and HBM saturates, then flatline.

New functionality beyond the reference (its synthesis is strictly B=1,
reference scripts/synthesize.py:64-220).

Usage:
    python scripts/bench_batch_sweep.py                 # 1..32 ladder
    python scripts/bench_batch_sweep.py --batches 8,16 --frames 2048
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="1,2,4,8,16,32")
    ap.add_argument("--phonemes", type=int, default=64)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--config", type=str, default=None,
                    help="IrisConfig JSON (default: production config)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from iris_tts_tpu.models.pipeline import TTSPipeline
    from scripts.common import resolve_config

    cfg = resolve_config(args)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    pipe = TTSPipeline.initialize(cfg, seed=1337, dtype=dtype)
    P, T = args.phonemes, args.frames
    sr = cfg.audio.sample_rate
    print(f"devices: {jax.devices()}", file=sys.stderr)

    @jax.jit
    def synth(params, ids, lengths, seed, acc):
        enc, frames, _ = pipe._stage_a_fn(params, ids, lengths)
        audio, _mel, _n = pipe._stage_b_fn(
            params, enc, frames, seed, total_frames=T
        )
        return audio, acc + jnp.sum(audio, dtype=jnp.float32)

    rng = np.random.default_rng(1337)
    prev_fps = None
    prev_b = None
    for b in (int(x) for x in args.batches.split(",")):
        ids = jnp.asarray(
            rng.integers(2, len(pipe.vocab), size=(b, P)), jnp.int32
        )
        lengths = jnp.full((b,), P, jnp.int32)
        t0 = time.time()
        audio, acc = synth(
            pipe.params, ids, lengths, jnp.asarray(0, jnp.int32),
            jnp.float32(0),
        )
        float(acc)
        compile_s = time.time() - t0

        acc = jnp.float32(0)
        t0 = time.time()
        for i in range(args.iters):
            audio, acc = synth(
                pipe.params, ids, lengths, jnp.asarray(i, jnp.int32), acc
            )
        float(acc)
        wall = (time.time() - t0) / args.iters

        fps = b * T / wall
        audio_s = audio.shape[0] * audio.shape[1] / sr
        # Marginal efficiency: 1.0 = perfect linear scaling from the
        # previous batch point, 0.0 = no gain (HBM/dispatch saturated).
        eff = None
        if prev_fps is not None and b != prev_b:
            eff = round(
                (fps / prev_fps - 1.0) / (b / prev_b - 1.0), 3
            )
        prev_fps, prev_b = fps, b
        print(json.dumps({
            "metric": "synthesis_batch_sweep",
            "batch": b,
            "frames": T,
            "mel_frames_per_sec": round(fps, 1),
            "rtf": round(audio_s / wall, 1),
            "step_ms": round(wall * 1e3, 2),
            "marginal_scaling_eff": eff,
            "compile_s": round(compile_s, 1),
            "dtype": args.dtype,
        }))


if __name__ == "__main__":
    main()
