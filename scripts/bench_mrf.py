"""Honest XLA-vs-Pallas timing of the fused MRF stage on the real chip.

Runs every production HiFiGAN stage shape (C = 256, 128, 64, 32 at their
true time lengths for N seconds of audio) through both implementations,
checks numerics, and prints a per-stage table. Drives the keep/drop decision
for the Pallas kernel (VERDICT round-1 item 7).

Usage: PYTHONPATH=. python scripts/bench_mrf.py [--seconds 10] [--dtype bf16]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.config import HiFiGANConfig
from iris_tts_tpu.models.hifigan import ResBlock
from iris_tts_tpu.ops.mrf_pallas import mrf_stage_pallas, stack_resblock_params
from scripts.common import avg_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--tile", type=int, default=2048)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    cfg = HiFiGANConfig()
    ks, dil = cfg.resblock_kernel_sizes, cfg.resblock_dilations
    nk = len(ks)
    t_frames = int(args.seconds * 22050 / 256)
    rng = np.random.default_rng(0)

    t = t_frames
    for stage, u in enumerate(cfg.upsample_rates):
        t *= u
        c = cfg.upsample_initial_channel // (2 ** (stage + 1))
        xs = [
            jnp.asarray(rng.standard_normal((args.batch, t, c)), dtype)
            for _ in range(4)
        ]
        x = xs[0]
        mods, tree = [], {}
        for j in range(nk):
            m = ResBlock(c, ks[j], dil[j], dtype=dtype)
            tree[f"resblocks_{stage * nk + j}"] = m.init(
                jax.random.PRNGKey(j), x
            )["params"]
            mods.append(m)

        def xla_mrf(ps, x):
            acc = None
            for j, m in enumerate(mods):
                out = m.apply({"params": ps[f"resblocks_{stage * nk + j}"]}, x)
                acc = out if acc is None else acc + out
            return acc / nk

        weights, biases = stack_resblock_params(tree, stage, nk, dtype=dtype)
        wbytes = sum(int(w.size) * w.dtype.itemsize for w in weights)
        if wbytes > 12 * 2**20:  # VMEM weight budget (see ops/mrf_pallas.py)
            print(f"stage {stage} [T={t:7d} C={c:3d}]: pallas skipped "
                  f"(weights {wbytes / 2**20:.1f} MiB exceed VMEM budget)")
            continue
        f_xla = jax.jit(xla_mrf)
        f_pl = jax.jit(
            lambda w, b, x: mrf_stage_pallas(
                x, w, b, ks, dil, tile=args.tile
            )
        )
        try:
            y_pl = f_pl(weights, biases, x)
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"stage {stage} [T={t:7d} C={c:3d}]: pallas FAILED: "
                  f"{type(e).__name__}: {str(e)[:120]}")
            continue
        y_xla = f_xla(tree, x)
        err = float(
            jnp.max(jnp.abs(y_pl.astype(jnp.float32)
                            - y_xla.astype(jnp.float32)))
        )
        ms_xla = avg_ms(f_xla, [(tree, xx) for xx in xs])
        ms_pl = avg_ms(f_pl, [(weights, biases, xx) for xx in xs])
        print(
            f"stage {stage} [T={t:7d} C={c:3d}]: xla {ms_xla:8.2f} ms | "
            f"pallas {ms_pl:8.2f} ms | speedup {ms_xla / ms_pl:5.2f}x | "
            f"maxabs {err:.2e}"
        )


if __name__ == "__main__":
    main()
