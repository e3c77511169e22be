"""Speed-of-light analysis of the synthesis path from XLA's own cost model.

Lowers and compiles the production-config executables, reads FLOPs and
HBM bytes from ``compiled.cost_analysis()`` (the compiler's numbers, not
hand arithmetic), and prints the roofline bound per pipeline stage plus
the implied maximum realtime factor on the target chip. Compare against
``bench.py``'s measured RT to see how far from the light cone the
deployment sits and WHICH wall (FLOPs vs HBM) it leans on.

The reference has no performance analysis of any kind (BASELINE.md:
"publishes no benchmark numbers"); this tool is how the rebuild keeps its
perf claims honest. Peak numbers default to TPU v5e and are flags.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _cost(fn, *args, **static):
    """FLOPs + bytes accessed for one jitted call, per XLA cost analysis."""
    compiled = jax.jit(fn, static_argnames=tuple(static)).lower(
        *args, **static
    ).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jaxlib returns one dict per module
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(
        ca.get("bytes accessed", 0.0)
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1024,
                    help="mel frames per utterance (1024 ≈ 11.9 s audio)")
    ap.add_argument("--phonemes", type=int, default=256)
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="chip peak dense bf16 TFLOP/s (v5e: 197)")
    ap.add_argument("--peak_hbm_gbps", type=float, default=819.0,
                    help="chip peak HBM GB/s (v5e: 819)")
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="bfloat16",
                    help="activation dtype (bfloat16 = the serving "
                    "default bench.py measures)")
    ap.add_argument("--json", action="store_true",
                    help="emit one JSON line instead of the table")
    args = ap.parse_args()

    from iris_tts_tpu.config import IrisConfig
    from iris_tts_tpu.models import TTSPipeline

    cfg = IrisConfig()
    pipe = TTSPipeline.initialize(
        cfg, seed=0, dtype=jnp.dtype(args.dtype)
    )
    B, P, T = args.batch, args.phonemes, args.frames
    hop = cfg.audio.hop_length
    sr = cfg.audio.sample_rate
    audio_s = B * T * hop / sr  # seconds of audio per dispatch

    ids = jnp.zeros((B, P), jnp.int32)
    lengths = jnp.full((B,), P, jnp.int32)
    seed = jnp.asarray(0, jnp.int32)
    mel = jnp.zeros((B, T, cfg.hifigan.in_channels), jnp.float32)

    stages = {}
    # upsample takes the pipeline's own mode string ('hard'|'gaussian') so
    # the analyzed executables carry the SAME static jit keys production
    # uses — bench.py and these numbers must describe one module.
    stages["text_to_mel (enc+dur+VAE+PostNet)"] = _cost(
        pipe._fused_mel_fn, pipe.params, ids, lengths, seed,
        total_frames=T, use_postnet=pipe.use_postnet,
        upsample=pipe.upsample,
    )
    stages["vocoder (HiFiGAN)"] = _cost(
        pipe._vocode_fn, pipe.params, mel,
    )
    stages["fused end-to-end"] = _cost(
        pipe._fused_fn, pipe.params, ids, lengths, seed,
        total_frames=T, use_postnet=pipe.use_postnet,
        upsample=pipe.upsample, pcm16=True,
    )

    peak_fl = args.peak_tflops * 1e12
    peak_bw = args.peak_hbm_gbps * 1e9
    rows = []
    for name, (fl, by) in stages.items():
        t_fl = fl / peak_fl
        t_bw = by / peak_bw
        wall = "HBM" if t_bw > t_fl else "FLOPs"
        t_sol = max(t_fl, t_bw)
        rows.append({
            "stage": name,
            "gflops": fl / 1e9,
            "gbytes": by / 1e9,
            "arith_intensity": fl / by if by else float("inf"),
            "t_flops_ms": t_fl * 1e3,
            "t_hbm_ms": t_bw * 1e3,
            "bound": wall,
            "sol_rt_factor": audio_s / t_sol if t_sol else float("inf"),
        })

    if args.json:
        print(json.dumps({"config": {"B": B, "T": T, "P": P,
                                     "dtype": args.dtype},
                          "audio_s_per_dispatch": audio_s,
                          "peak_tflops": args.peak_tflops,
                          "peak_hbm_gbps": args.peak_hbm_gbps,
                          "stages": rows}))
        return
    print(f"B={B} T={T} frames P={P} {args.dtype}  "
          f"({audio_s:.2f} s audio/dispatch); "
          f"peaks: {args.peak_tflops} TFLOP/s, {args.peak_hbm_gbps} GB/s")
    hdr = (f"{'stage':38} {'GFLOP':>8} {'GB':>7} {'F/B':>6} "
           f"{'t_fl ms':>8} {'t_bw ms':>8} {'bound':>6} {'SoL RT×':>9}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(f"{r['stage']:38} {r['gflops']:8.2f} {r['gbytes']:7.3f} "
              f"{r['arith_intensity']:6.1f} {r['t_flops_ms']:8.3f} "
              f"{r['t_hbm_ms']:8.3f} {r['bound']:>6} "
              f"{r['sol_rt_factor']:9.0f}")
    e2e = rows[-1]
    print(f"\nspeed of light: {e2e['sol_rt_factor']:.0f}x realtime per "
          f"dispatch shape ({e2e['bound']}-bound). Measured RT from "
          f"bench.py divides into this for the efficiency fraction.")


if __name__ == "__main__":
    main()
