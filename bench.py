"""Headline benchmark: end-to-end synthesis real-time factor on one chip.

Prints ONE JSON line:
    {"metric": "synthesis_rtf_per_chip", "value": N, "unit": "x_realtime",
     "vs_baseline": N}

``value`` = seconds of 22.05 kHz audio generated per wall-clock second by the
full jitted pipeline (text-side inputs → encoder → durations → device length
regulation → VAE prior decode → PostNet → HiFiGAN → waveform) at a serving
batch size, steady state (post-compile), on a single TPU chip.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
self-set target is >50x real time per chip, so vs_baseline = value / 50.
Extra diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _wait_for_tpu(max_wait_s: float = 300.0):
    """Retry the device claim (incl. late plugin re-registration) before
    falling back to CPU."""
    from iris_tts_tpu.utils.tpu import wait_for_devices

    return wait_for_devices(max_wait_s, fall_back_to_cpu=True)


def main() -> None:
    devices = _wait_for_tpu()
    print(f"bench: devices = {devices}", file=sys.stderr)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from iris_tts_tpu.config import IrisConfig
    from iris_tts_tpu.models.pipeline import TTSPipeline

    cfg = IrisConfig()
    # bf16 activations are the serving default (params stay f32): gated by
    # tests/test_pipeline.py::test_bfloat16_parity_with_float32.
    pipe = TTSPipeline.initialize(cfg, seed=1337, dtype=jnp.bfloat16)

    # Serving-shaped workload: batch of 8 utterances, 64 phonemes each,
    # 1024-frame bucket (≈ 11.9 s of audio per utterance).
    B, P, T = 8, 64, 1024
    n_iters = 10
    on_cpu = devices[0].platform == "cpu"
    if on_cpu:
        # Accelerator never became claimable: still produce an honest JSON
        # line in bounded time on the CPU fallback.
        B, T, n_iters = 1, 256, 2
        print("bench: CPU fallback — shrinking workload to "
              f"B={B}, T={T}", file=sys.stderr)
    rng = np.random.default_rng(1337)
    ids = jnp.asarray(rng.integers(2, len(pipe.vocab), size=(B, P)), jnp.int32)
    lengths = jnp.full((B,), P, jnp.int32)
    key = jnp.asarray(0, jnp.int32)

    # Vocoder MRF implementation. The fused Pallas kernel (ops/mrf_pallas.py)
    # cuts HBM passes ~18x on paper, but on this backend's XLA (which fuses
    # the leaky-relu chains into native convs well) it measured 0.63-0.98x —
    # i.e. NOT faster (scripts/bench_mrf.py, v5e, bf16) — so XLA stays the
    # default; IRIS_MRF_IMPL=pallas opts in for re-evaluation on other TPUs.
    mrf_impl = "xla" if on_cpu else os.environ.get("IRIS_MRF_IMPL", "xla")

    @jax.jit
    def synth(params, ids, lengths, seed):
        enc, frames, _ = pipe._stage_a_fn(params, ids, lengths)
        audio, mel, n_frames = pipe._stage_b_fn(
            params, enc, frames, seed, total_frames=T, mrf_impl=mrf_impl
        )
        return audio

    # NOTE: force a host transfer of a reduction each iteration —
    # block_until_ready alone does not reliably block on tunneled backends.
    t0 = time.time()
    audio = synth(pipe.params, ids, lengths, key)
    checksum = float(jnp.sum(audio))
    compile_s = time.time() - t0
    print(
        f"bench: compile+first run = {compile_s:.1f}s (sum={checksum:.3f})",
        file=sys.stderr,
    )

    # Steady state.
    t0 = time.time()
    for i in range(n_iters):
        audio = synth(pipe.params, ids, lengths, jnp.asarray(i, jnp.int32))
        float(jnp.sum(audio))
    wall = (time.time() - t0) / n_iters

    sr = cfg.audio.sample_rate
    audio_seconds = audio.shape[0] * audio.shape[1] / sr
    rtf = audio_seconds / wall
    mel_fps = B * T / wall  # mel frames synthesized per wall-clock second
    print(
        f"bench: {audio_seconds:.1f}s audio in {wall*1e3:.1f}ms "
        f"({audio.shape}) → {rtf:.1f}x realtime, "
        f"{mel_fps:.0f} mel frames/s",
        file=sys.stderr,
    )

    # Secondary metric (BASELINE.md): p50 single-utterance latency at a
    # short-utterance shape (B=1, 256 frames ≈ 3 s of audio).
    if on_cpu:
        print(json.dumps({
            "metric": "synthesis_rtf_per_chip",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / 50.0, 3),
        }))
        return
    # Fused single-dispatch path (pipeline._fused_fn): one device round trip
    # per utterance, scalar-forced (serving-dispatch latency).
    T1 = 256
    ids1, lengths1 = ids[:1], lengths[:1]

    @jax.jit
    def synth_one(params, ids, lengths, seed):
        audio, _, _ = pipe._fused_fn(
            params, ids, lengths, seed, total_frames=T1, mrf_impl=mrf_impl
        )
        return audio

    float(jnp.sum(synth_one(pipe.params, ids1, lengths1, key)))  # compile
    lats = []
    for i in range(11):
        t0 = time.time()
        float(jnp.sum(
            synth_one(pipe.params, ids1, lengths1, jnp.asarray(i, jnp.int32))
        ))
        lats.append(time.time() - t0)
    p50 = sorted(lats)[len(lats) // 2]
    print(
        f"bench: p50 single-utterance latency (fused single dispatch) = "
        f"{p50*1e3:.1f} ms for {T1*cfg.audio.hop_length/sr:.2f}s of audio "
        f"(includes the fixed per-dispatch tunnel round trip)",
        file=sys.stderr,
    )

    # Public-API latency (text in → trimmed waveform on host, incl. the
    # frontend and the batched device→host fetch).
    text = "The quick brown fox jumps over the lazy dog."
    pipe.mrf_impl = mrf_impl
    pipe.synthesize(text, seed=0)  # compile
    api_lats = []
    for i in range(11):
        t0 = time.time()
        pipe.synthesize(text, seed=i)
        api_lats.append(time.time() - t0)
    api_p50 = sorted(api_lats)[len(api_lats) // 2]
    print(
        f"bench: p50 public-API synthesize latency = {api_p50*1e3:.1f} ms",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "synthesis_rtf_per_chip",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 50.0, 3),
                "mel_frames_per_sec": round(mel_fps, 1),
                "p50_fused_dispatch_ms": round(p50 * 1e3, 2),
                "p50_public_api_ms": round(api_p50 * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
