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


def _wait_for_tpu(max_wait_s: float = None):
    """Retry the device claim (incl. late plugin re-registration) before
    falling back to CPU. Default window 600 s (overridable via
    IRIS_TPU_MAX_WAIT_S): tunnel outages measured on 2026-08-17 blocked a
    single claim for ~25 min, so a short window turns a transient outage
    into a misleading CPU-fallback headline number."""
    from iris_tts_tpu.utils.tpu import wait_for_devices

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("IRIS_TPU_MAX_WAIT_S", "600"))
    return wait_for_devices(max_wait_s, fall_back_to_cpu=True)


def _measure_cold_start() -> dict:
    """Serving cold start with the AOT path (VERDICT r2 item 1).

    Two child processes, run BEFORE this process claims the TPU (only one
    process can hold the chip):
      1. a CPU process cross-lowers the fused synthesis executable to
         StableHLO for the ``tpu`` platform (scripts/export_serving.py path
         — no device, no compile service),
      2. a fresh TPU process loads the artifacts and synthesizes one
         utterance; its wall time from process start to audio bytes on the
         host IS the serving cold start.
    Returns {} on any failure (bench still reports the steady-state line).
    """
    import subprocess
    import tempfile
    from pathlib import Path

    repo = Path(__file__).resolve().parent
    tmp = Path(tempfile.mkdtemp(prefix="iris_bench_aot_"))
    env_cpu = dict(os.environ)
    env_cpu["JAX_PLATFORMS"] = "cpu"
    try:
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, str(repo / "scripts/export_serving.py"),
             "--random_weights", "--output", str(tmp / "aot"),
             "--batch_sizes", "1", "--phoneme_buckets", "64",
             "--platforms", "tpu"],
            env=env_cpu, cwd=repo, capture_output=True, text=True,
            timeout=900,
        )
        if r.returncode != 0:
            print(f"bench: AOT export failed: {r.stderr[-800:]}",
                  file=sys.stderr)
            return {}
        export_s = time.time() - t0
        print(f"bench: AOT cross-lower (CPU) took {export_s:.1f}s",
              file=sys.stderr)

        child = (
            "import time, sys; t0 = time.time()\n"
            "import numpy as np\n"
            # Environment floor: the remote compile service pays a large,
            # HIGHLY VARIABLE per-process session-establishment cost on the
            # FIRST compile of ANY graph (measured 216 s (r4) to 618 s (r3)
            # for the same 1-op jit; the plugin does not serialize
            # executables, so no persistent cache can absorb it). Time a
            # trivial jit first so the floor is isolated, then a SECOND
            # distinct trivial jit to pin the marginal small-compile cost
            # post-session (~0.4 s) — the gap between the two is pure
            # backend/session cost, not framework work.
            "import jax, jax.numpy as jnp\n"
            "float(jax.jit(lambda x: x + 1)(jnp.float32(1)))\n"
            "floor_s = time.time() - t0\n"
            "print(f'ENV_FLOOR_S={floor_s:.2f}')\n"
            "t_m = time.time()\n"
            "float(jax.jit(lambda x: x * 2 + 3)(jnp.float32(1)))\n"
            "print(f'MARGINAL_JIT_S={time.time() - t_m:.2f}')\n"
            # Framework-share breakdown (VERDICT r3 item 9 / r4 item 4):
            # import / init (deserialize + frontend; warmup_async kicks the
            # backend compile of the exported module on a thread) / WARM
            # (residual wait for that backend compile — backend cost, the
            # tunnel compile service recompiles pre-lowered StableHLO from
            # scratch) / first synthesize (now a pure dispatch — the only
            # post-init cost the framework itself owns).
            "t_i = time.time()\n"
            "from iris_tts_tpu.serve import AotPipeline\n"
            "print(f'IMPORT_S={time.time() - t_i:.2f}')\n"
            "t_d = time.time()\n"
            f"aot = AotPipeline({str(tmp / 'aot')!r}, warmup_async=True)\n"
            "print(f'DESERIALIZE_S={time.time() - t_d:.2f}')\n"
            "t_w = time.time()\n"
            "while not aot.warm_all_done(): time.sleep(0.2)\n"
            "print(f'WARM_S={time.time() - t_w:.2f}')\n"
            "t_s = time.time()\n"
            "audio = aot.synthesize("
            "'The quick brown fox jumps over the lazy dog.', seed=0)\n"
            "print(f'FIRST_SYNTH_S={time.time() - t_s:.2f}')\n"
            "assert audio.size > 0 and np.isfinite(audio).all()\n"
            "print(f'FIRST_AUDIO_S={time.time() - t0:.2f}')\n"
        )
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-c", child], env=dict(os.environ), cwd=repo,
            # 1800 s: the session floor alone has measured 618 s (r3), and
            # a chip freshly released by another process can stall the
            # claim for minutes more — a 900 s cap lost the r5 sweep's
            # cold-start sample entirely.
            capture_output=True, text=True, timeout=1800,
        )
        total_s = time.time() - t0
        if r.returncode != 0:
            print(f"bench: cold-start child failed: {r.stderr[-800:]}",
                  file=sys.stderr)
            return {}
        marks = {}
        for line in r.stdout.splitlines():
            if "=" in line:
                k, _, v = line.partition("=")
                if k in ("FIRST_AUDIO_S", "ENV_FLOOR_S", "MARGINAL_JIT_S",
                         "DESERIALIZE_S", "IMPORT_S", "WARM_S",
                         "FIRST_SYNTH_S"):
                    marks[k] = float(v)
        first_audio_s = marks.get("FIRST_AUDIO_S", total_s)
        floor_s = marks.get("ENV_FLOOR_S", 0.0)
        warm_s = marks.get("WARM_S", 0.0)
        # What the FRAMEWORK owns: import + init (deserialize pre-lowered
        # StableHLO + build the text frontend) + the first dispatch. The
        # session floor and the module's backend compile are the tunnel
        # compile service's — it recompiles from scratch every process
        # (no executable serialization in the plugin; r3 vs r4 floors of
        # 618 s vs 216 s for the SAME 1-op jit show the variance is the
        # service's, not this code's). VERDICT r4 item 4.
        framework_s = (
            marks.get("IMPORT_S", 0.0)
            + marks.get("DESERIALIZE_S", 0.0)
            + marks.get("FIRST_SYNTH_S", 0.0)
        )
        print(
            f"bench: cold start to first audio (AOT serving path) = "
            f"{first_audio_s:.1f}s in-process — session floor {floor_s:.1f}s "
            f"(marginal 1-op jit after it: "
            f"{marks.get('MARGINAL_JIT_S', 0):.2f}s), backend compile of the "
            f"exported module {warm_s:.1f}s, framework share "
            f"{framework_s:.1f}s; {total_s:.1f}s including interpreter spawn",
            file=sys.stderr,
        )
        print(
            "bench: framework-share breakdown — import "
            f"{marks.get('IMPORT_S', 0):.1f}s, init (deserialize+frontend, "
            f"compile overlapped) {marks.get('DESERIALIZE_S', 0):.1f}s, "
            f"first synthesize (pure dispatch) "
            f"{marks.get('FIRST_SYNTH_S', 0):.2f}s", file=sys.stderr,
        )
        return {
            "cold_start_to_first_audio_s": round(first_audio_s, 2),
            "cold_start_env_floor_s": round(floor_s, 2),
            "cold_start_marginal_jit_s": round(
                marks.get("MARGINAL_JIT_S", 0.0), 2
            ),
            # r4 called (first_audio - floor) "framework share", which
            # billed the exported module's backend compile to the
            # framework; that compile is now isolated (WARM_S) and
            # reported as the backend's.
            "cold_start_backend_compile_s": round(warm_s, 2),
            "cold_start_framework_s": round(framework_s, 2),
            "cold_start_import_s": round(marks.get("IMPORT_S", 0.0), 2),
            # NOTE: renamed from cold_start_deserialize_s (r03): with the
            # warmup_async overlap the constructor now also builds the
            # text frontend, so this is init time, not pure deserialize.
            "cold_start_init_s": round(
                marks.get("DESERIALIZE_S", 0.0), 2
            ),
            "cold_start_first_synth_s": round(
                marks.get("FIRST_SYNTH_S", 0.0), 2
            ),
            "aot_export_s": round(export_s, 2),
        }
    except Exception as e:  # noqa: BLE001 — never break the headline line
        print(f"bench: cold-start measurement failed: {e}", file=sys.stderr)
        return {}


def main() -> None:
    # Cold-start FIRST: its TPU child cannot claim the chip once this
    # process does. IRIS_BENCH_SKIP_COLDSTART=1 skips (fast iteration).
    cold = (
        {} if os.environ.get("IRIS_BENCH_SKIP_COLDSTART")
        else _measure_cold_start()
    )
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

    @jax.jit
    def synth(params, ids, lengths, seed, acc):
        enc, frames, _ = pipe._stage_a_fn(params, ids, lengths)
        audio, mel, n_frames = pipe._stage_b_fn(
            params, enc, frames, seed, total_frames=T
        )
        # Accumulate a checksum ON DEVICE: the final host fetch of ``acc``
        # forces every chained iteration (block_until_ready does not reliably
        # block on tunneled backends), so steady state is measured with the
        # dispatches pipelined — one host round trip per LOOP, not per step.
        # This is how the serving batcher actually runs (slice lookahead,
        # serve/batcher.py), so it is the honest device-throughput number.
        return audio, acc + jnp.sum(audio, dtype=jnp.float32)

    t0 = time.time()
    acc = jnp.float32(0)
    audio, acc = synth(pipe.params, ids, lengths, key, acc)
    checksum = float(acc)
    compile_s = time.time() - t0
    print(
        f"bench: compile+first run = {compile_s:.1f}s (sum={checksum:.3f})",
        file=sys.stderr,
    )

    # Steady state, pipelined: one forcing fetch after n_iters chained steps.
    acc = jnp.float32(0)
    t0 = time.time()
    for i in range(n_iters):
        audio, acc = synth(
            pipe.params, ids, lengths, jnp.asarray(i, jnp.int32), acc
        )
    float(acc)
    wall = (time.time() - t0) / n_iters

    # Diagnostic: the same loop with a per-step forcing fetch (adds the
    # fixed per-dispatch tunnel round trip to every step).
    t0 = time.time()
    for i in range(n_iters):
        _, a = synth(
            pipe.params, ids, lengths, jnp.asarray(i, jnp.int32),
            jnp.float32(0),
        )
        float(a)
    wall_synced = (time.time() - t0) / n_iters
    print(
        f"bench: per-dispatch-synced steady state = {wall_synced*1e3:.1f} ms"
        f" ({B*T/wall_synced:.0f} mel frames/s)",
        file=sys.stderr,
    )

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

    # Bulk-throughput headline: the batch sweep (scripts/bench_batch_sweep,
    # docs/PERF.md) measured throughput climbing past B=8 all the way to
    # B=128, where the executable crosses the roofline ridge and becomes
    # FLOPs-bound (arith intensity ~302 vs the ~240 ridge: XLA fuses ~2.3x
    # more HBM traffic per frame away at large batch). B=8 stays the
    # latency-balanced serving point; B=128 is the per-chip capability.
    # Guarded: the remote compile helper 500s on some oversized modules
    # (B=160+ reproducibly; B=128 compiles but a loaded helper may flake),
    # so fall back down the ladder rather than lose the headline.
    bulk = {}
    if not on_cpu:
        for B_bulk in (128, 96, 64):
            try:
                ids_b = jnp.asarray(
                    rng.integers(2, len(pipe.vocab), size=(B_bulk, P)),
                    jnp.int32,
                )
                len_b = jnp.full((B_bulk,), P, jnp.int32)
                t0 = time.time()
                audio_b, a = synth(
                    pipe.params, ids_b, len_b, key, jnp.float32(0)
                )
                float(a)
                compile_bulk_s = time.time() - t0
                acc = jnp.float32(0)
                n_bulk = 5
                t0 = time.time()
                for i in range(n_bulk):
                    audio_b, acc = synth(
                        pipe.params, ids_b, len_b,
                        jnp.asarray(i, jnp.int32), acc,
                    )
                float(acc)
                wall_b = (time.time() - t0) / n_bulk
                audio_s_b = audio_b.shape[0] * audio_b.shape[1] / sr
                bulk = {
                    "bulk_batch": B_bulk,
                    "bulk_rtf": round(audio_s_b / wall_b, 2),
                    "bulk_mel_frames_per_sec": round(B_bulk * T / wall_b, 1),
                }
                print(
                    f"bench: bulk throughput B={B_bulk}: "
                    f"{audio_s_b:.0f}s audio in {wall_b*1e3:.0f}ms → "
                    f"{bulk['bulk_rtf']:.0f}x realtime "
                    f"(compile {compile_bulk_s:.0f}s)", file=sys.stderr,
                )
                break
            except Exception as e:  # noqa: BLE001 — helper flake: step down
                print(
                    f"bench: bulk B={B_bulk} failed ({type(e).__name__}); "
                    "stepping down", file=sys.stderr,
                )

    # Secondary metric (BASELINE.md): p50 single-utterance latency at a
    # short-utterance shape (B=1, 256 frames ≈ 3 s of audio).
    if on_cpu:
        print(json.dumps({
            "metric": "synthesis_rtf_per_chip",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / 50.0, 3),
            # Not a chip number: the accelerator never became claimable
            # inside the wait window (tunnel outage), so this run measured
            # the CPU fallback. Compare TPU rounds to TPU rounds.
            "device": "cpu_fallback",
        }))
        return
    # Fused single-dispatch path (pipeline._fused_fn): one device round trip
    # per utterance, scalar-forced (serving-dispatch latency).
    T1 = 256
    ids1, lengths1 = ids[:1], lengths[:1]

    @jax.jit
    def synth_one(params, ids, lengths, seed):
        audio, _, _, _ = pipe._fused_fn(
            params, ids, lengths, seed, total_frames=T1
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

    # PCM16 transfer variant (device-side int16: half the fetch bytes).
    pipe.synthesize(text, seed=0, pcm16=True)  # compile
    pcm_lats = []
    for i in range(11):
        t0 = time.time()
        pipe.synthesize(text, seed=i, pcm16=True)
        pcm_lats.append(time.time() - t0)
    pcm_p50 = sorted(pcm_lats)[len(pcm_lats) // 2]

    # Wire-format A/B: the packed single-transfer path (default) vs the
    # multi-array fetch — isolates what the 2-transfers-per-call format
    # buys against this tunnel's per-array cost.
    pipe.packed_fetch = False
    pipe.synthesize(text, seed=0)  # compile the unpacked variant
    unp_lats = []
    for i in range(11):
        t0 = time.time()
        pipe.synthesize(text, seed=i)
        unp_lats.append(time.time() - t0)
    pipe.packed_fetch = True
    unpacked_p50 = sorted(unp_lats)[len(unp_lats) // 2]
    print(
        f"bench: p50 public API with multi-array fetch = "
        f"{unpacked_p50*1e3:.1f} ms (packed wire saves "
        f"{(unpacked_p50 - api_p50)*1e3:.1f} ms)", file=sys.stderr,
    )

    # Host-side breakdown of the public path (VERDICT r2 item 2).
    def p50_of(fn, n=11):
        ts = []
        for _ in range(n):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return sorted(ts)[n // 2]

    frontend_cached_ms = p50_of(lambda: pipe._encode_texts([text])) * 1e3

    def uncached():
        pipe._ids_cache.clear()
        pipe._encode_texts([text])

    frontend_uncached_ms = p50_of(uncached) * 1e3
    print(
        "bench: public-API breakdown — frontend text→ids "
        f"{frontend_uncached_ms:.2f} ms uncached / "
        f"{frontend_cached_ms:.2f} ms memoized; fused device dispatch "
        f"{p50*1e3:.1f} ms; residual (upload+fetch+trim) "
        f"{max(api_p50*1e3 - frontend_cached_ms - p50*1e3, 0):.1f} ms; "
        f"pcm16 transfer variant p50 {pcm_p50*1e3:.1f} ms",
        file=sys.stderr,
    )

    # Roofline efficiency: speed of light for THIS dispatch shape from the
    # backend's own cost model (scripts/roofline.py holds the analysis;
    # docs/PERF.md the interpretation). Guarded: some PJRT plugins do not
    # implement cost_analysis.
    # Roofline for the HEADLINE executable (bulk when it ran, else B=8),
    # falling back to the B=8 executable if the bulk-shape cost analysis
    # fails: lower().compile() does NOT hit the jit executable cache, so
    # the bulk attempt re-runs the remote compile helper on the exact
    # module size it sometimes 500s on — a flake there must degrade the
    # diagnostic to the B=8 bound, not discard it. Peaks mirror
    # scripts/roofline.py's --peak_* defaults (v5e).
    def _sol_of(sol_ids, sol_lens, sol_audio_s, sol_rtf):
        ca = (
            synth
            .lower(pipe.params, sol_ids, sol_lens, key, jnp.float32(0))
            .compile()
            .cost_analysis()
        )
        if isinstance(ca, list):
            ca = ca[0]
        fl = float(ca.get("flops", 0))
        by = float(ca.get("bytes accessed", 0))
        t_sol = max(fl / 197e12, by / 819e9)  # v5e dense-bf16 / HBM peaks
        if t_sol <= 0:
            return {}
        sol_rt = sol_audio_s / t_sol
        out = {
            "sol_rt_factor": round(sol_rt, 1),
            "sol_fraction": round(sol_rtf / sol_rt, 3),
            "sol_bound": "hbm" if by / 819e9 > fl / 197e12 else "flops",
        }
        print(
            f"bench: roofline — speed of light {sol_rt:.0f}x realtime "
            f"({out['sol_bound']}-bound) → running at "
            f"{100*sol_rtf/sol_rt:.0f}% of light", file=sys.stderr,
        )
        return out

    attempts = []
    if bulk:
        B_sol = bulk["bulk_batch"]
        attempts.append((
            jnp.asarray(
                rng.integers(2, len(pipe.vocab), size=(B_sol, P)), jnp.int32
            ),
            jnp.full((B_sol,), P, jnp.int32),
            B_sol * T * cfg.audio.hop_length / sr,
            bulk["bulk_rtf"],
        ))
    attempts.append((ids, lengths, audio_seconds, rtf))
    sol = {}
    for attempt in attempts:
        try:
            sol = _sol_of(*attempt)
            break
        except Exception as e:  # noqa: BLE001 — diagnostics must not fail
            print(f"bench: cost_analysis unavailable for shape "
                  f"{attempt[0].shape} ({e})", file=sys.stderr)

    headline_rtf = bulk.get("bulk_rtf", rtf)
    print(
        json.dumps(
            {
                "metric": "synthesis_rtf_per_chip",
                "value": round(headline_rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(headline_rtf / 50.0, 3),
                "mel_frames_per_sec": bulk.get(
                    "bulk_mel_frames_per_sec", round(mel_fps, 1)
                ),
                "rtf_b8": round(rtf, 2),
                "mel_frames_per_sec_b8": round(mel_fps, 1),
                **bulk,
                "p50_fused_dispatch_ms": round(p50 * 1e3, 2),
                "p50_public_api_ms": round(api_p50 * 1e3, 2),
                "p50_public_api_pcm16_ms": round(pcm_p50 * 1e3, 2),
                "p50_public_api_unpacked_ms": round(unpacked_p50 * 1e3, 2),
                **sol,
                **cold,
            }
        )
    )


if __name__ == "__main__":
    main()
