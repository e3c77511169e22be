"""Per-stage timing of the HiFiGAN generator on the real chip.

Times conv_pre, each (upsample, MRF) stage, and conv_post separately (each
jitted on its own, so per-stage numbers include one dispatch each — compare
deltas, not absolutes), plus the whole generator in one dispatch. Drives the
Pallas-fusion work (VERDICT round-1 item 7): shows which stages are
HBM-bound.

Usage: python scripts/profile_vocoder.py [--seconds 10] [--dtype bf16|f32]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.config import HiFiGANConfig
from iris_tts_tpu.models.hifigan import (
    HiFiGANGenerator,
    ResBlock,
    TorchConv1d,
    TorchConvTranspose1d,
    leaky_relu,
)
from scripts.common import avg_ms


def median_ms(fn, *args, n=20):
    """Per-call wall time with a single repeated input (upstream layers on
    some backends may dedupe identical queued dispatches — per-stage numbers
    here are for comparing deltas, see module docstring)."""
    return avg_ms(fn, [args], n=n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    cfg = HiFiGANConfig()
    gen = HiFiGANGenerator(config=cfg, dtype=dtype)
    t_frames = int(args.seconds * 22050 / 256)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, t_frames, cfg.in_channels)
        ),
        dtype,
    )
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]

    full = jax.jit(lambda p, m: gen.apply({"params": p}, m))
    print(f"full generator: {median_ms(full, params, mel):8.2f} ms "
          f"({args.seconds}s audio, B={args.batch}, {args.dtype})")

    # Stage-by-stage: rebuild each piece as its own jitted module.
    num_kernels = len(cfg.resblock_kernel_sizes)
    x = mel
    pre = TorchConv1d(cfg.upsample_initial_channel, 7, dtype=dtype)
    p = pre.init(jax.random.PRNGKey(0), x)["params"]
    f = jax.jit(lambda p, x: pre.apply({"params": p}, x))
    print(f"  conv_pre  [{x.shape[1]:7d} x {x.shape[2]:3d}]: "
          f"{median_ms(f, p, x):8.2f} ms")
    x = f(p, x)

    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        ups = TorchConvTranspose1d(ch, k, u, dtype=dtype)
        p = ups.init(jax.random.PRNGKey(0), x)["params"]
        f = jax.jit(lambda p, x, _m=ups: _m.apply({"params": p}, leaky_relu(x)))
        ms_up = median_ms(f, p, x)
        x = f(p, x)

        def mrf_apply(mods, ps, x):
            acc = None
            for mod, pp in zip(mods, ps):
                out = mod.apply({"params": pp}, x)
                acc = out if acc is None else acc + out
            return acc / num_kernels

        mods, ps = [], []
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations)
        ):
            m = ResBlock(ch, rk, rd, dtype=dtype)
            mods.append(m)
            ps.append(m.init(jax.random.PRNGKey(j), x)["params"])
        fm = jax.jit(lambda ps, x: mrf_apply(mods, ps, x))
        ms_mrf = median_ms(fm, ps, x)
        x = fm(ps, x)
        print(f"  stage {i}: ups [{x.shape[1]:7d} x {ch:3d}]: {ms_up:8.2f} ms"
              f"   MRF: {ms_mrf:8.2f} ms")

    post = TorchConv1d(1, 7, dtype=dtype)
    p = post.init(jax.random.PRNGKey(0), x)["params"]
    f = jax.jit(lambda p, x: jnp.tanh(post.apply({"params": p}, leaky_relu(x))))
    print(f"  conv_post [{x.shape[1]:7d} x {x.shape[2]:3d}]: "
          f"{median_ms(f, p, x):8.2f} ms")


if __name__ == "__main__":
    main()
