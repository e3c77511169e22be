"""Streaming-vocoder benchmark: TTFA and throughput vs the full pass.

Measures, on the current backend (real chip under the tunnel, CPU
otherwise), for a long mel:
  * full-pass vocode wall time (one big dispatch + one fetch),
  * streaming time-to-first-audio (one window dispatch + chunk fetch),
  * streaming total wall time across all chunks (the per-chunk dispatch
    round trips are the price of the O(chunk) memory bound).

The streaming output is sample-exact vs the full pass by construction —
bit-identical on CPU, float-ulp on TPU where the two executable shapes
order reductions differently (tests/test_stream_vocode.py); the run
asserts that and quantifies the latency trade.

Usage: PYTHONPATH=. python scripts/bench_stream.py \
           [--frames 2048] [--chunk 256] [--pcm16]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from iris_tts_tpu.config import IrisConfig
from iris_tts_tpu.models.pipeline import TTSPipeline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048,
                    help="mel length (2048 frames ≈ 23.8 s of audio)")
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--pcm16", action="store_true")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    pipe = TTSPipeline.initialize(IrisConfig(), seed=0)
    rng = np.random.default_rng(0)
    mel = rng.normal(-3.0, 2.0, size=(args.frames, 80)).astype(np.float32)
    sr = pipe.config.audio.sample_rate
    secs = args.frames * pipe.config.hifigan.total_upsample / sr

    # Full pass (compile, then timed runs over varied inputs).
    pipe.vocode(mel)  # compile
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        pipe.vocode(mel + np.float32(i) * 1e-6)
    full_ms = 1000 * (time.perf_counter() - t0) / n

    # Streaming: TTFA = first chunk out; total = all chunks.
    gen = pipe.vocode_streaming(mel, chunk_frames=args.chunk,
                                pcm16=args.pcm16)
    next(gen)  # compile the window executable
    for _ in gen:
        pass
    t0 = time.perf_counter()
    gen = pipe.vocode_streaming(mel, chunk_frames=args.chunk,
                                pcm16=args.pcm16)
    first = next(gen)
    ttfa_ms = 1000 * (time.perf_counter() - t0)
    chunks = [first] + list(gen)
    total_ms = 1000 * (time.perf_counter() - t0)

    audio = np.concatenate(chunks)
    want = pipe.vocode(mel)
    if args.pcm16:
        want = (np.clip(want, -1.0, 1.0) * 32767.0).astype(np.int16)
        # Window vs full executables may differ by float ulp on TPU
        # backends; after quantization that is at most 1 LSB.
        err = np.abs(audio.astype(np.int32) - want.astype(np.int32)).max()
        ok = err <= 1
        verdict = f"max |Δ| = {err} LSB"
    else:
        err = float(np.abs(audio - want).max())
        scale = float(np.abs(want).max()) or 1.0
        # Same policy as tests/corpus_utils.assert_audio_equal: CPU
        # executables are bit-identical, so keep exact equality there;
        # accelerator backends may reorder float reductions between the
        # window and full executables, so compare at 1e-5 of peak.
        import jax

        if jax.default_backend() == "cpu":
            ok = err == 0.0
        else:
            ok = err <= 1e-5 * scale
        verdict = f"max |Δ| = {err:.2e} (peak {scale:.2e})"

    print(
        f"{secs:.1f}s audio ({args.frames} frames, chunk {args.chunk}"
        f"{', pcm16' if args.pcm16 else ''}): "
        f"full pass {full_ms:.1f} ms ({1000*secs/full_ms:.0f}x RT) | "
        f"stream TTFA {ttfa_ms:.1f} ms, total {total_ms:.1f} ms "
        f"({1000*secs/total_ms:.0f}x RT, {len(chunks)} chunks) | "
        f"sample-exact: {verdict}"
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
