"""Compiler memory analysis for the training steps: HBM budgeting tool.

Prints XLA's own ``memory_analysis()`` (argument/output/temp bytes) for
each training step at the given shapes, across the memory knobs
(--remat, --bf16), so batch/length limits are chosen from the compiler's
numbers rather than OOM bisection. Temp = live activations + workspace —
the number that decides whether a shape fits.

Measured example (CPU lowering, production configs): VAE step B=8 T=1024
temp 588 MiB → 534 MiB with --remat (~9%); the GAN generator step at the
paper segment is NOT improved by remat on this lowering (discriminator
feature-matching activations dominate its temp) — which is why both
flags are opt-in. Run this on the target backend before a big run.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _mem(fn, *args):
    ma = jax.jit(fn).lower(*args).compile().memory_analysis()
    return {
        "temp_mib": round(ma.temp_size_in_bytes / 2**20, 1),
        "args_mib": round(ma.argument_size_in_bytes / 2**20, 1),
        "out_mib": round(ma.output_size_in_bytes / 2**20, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", choices=["vae", "gan"], default="vae")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1024,
                    help="mel frames (vae) / segment frames (gan)")
    ap.add_argument("--phonemes", type=int, default=64)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    from iris_tts_tpu.config import IrisConfig
    from iris_tts_tpu.train import TrainState, adam_clipped

    cfg = IrisConfig()
    dt = jnp.bfloat16 if args.bf16 else None
    key = jax.random.PRNGKey(0)
    B, P, T = args.batch_size, args.phonemes, args.frames
    rows = []
    if args.stage == "vae":
        from iris_tts_tpu.models import PhonemeEncoder, TextConditionedVAE
        from iris_tts_tpu.train import make_vae_train_step

        enc = PhonemeEncoder(config=cfg.encoder)
        vae = TextConditionedVAE(config=cfg.vae)
        p_enc = jax.jit(enc.init)(key, jnp.zeros((1, P), jnp.int32))["params"]
        p_vae = jax.jit(vae.init)(
            {"params": key, "sample": key},
            jnp.zeros((1, T, cfg.vae.n_mels)),
            jnp.zeros((1, T, cfg.vae.cond_dim)),
        )["params"]
        st = TrainState.create(
            p_vae, adam_clipped(1e-3), key, frozen={"encoder": p_enc}
        )
        batch = {
            "phoneme_ids": jnp.zeros((B, P), jnp.int32),
            "phoneme_mask": jnp.ones((B, P), jnp.float32),
            "durations": jnp.full((B, P), T / P),
            "mel": jnp.zeros((B, T, cfg.vae.n_mels)),
        }
        for remat in (False, True):
            step = make_vae_train_step(cfg, compute_dtype=dt, remat=remat)
            rows.append({"stage": "vae", "remat": remat,
                         **_mem(step, st, batch, jnp.asarray(0.01))})
    else:
        import optax

        from iris_tts_tpu.models.discriminators import HiFiGANDiscriminators
        from iris_tts_tpu.models.hifigan import HiFiGANGenerator
        from iris_tts_tpu.train.gan import make_gan_steps

        hop = cfg.audio.hop_length
        k_g, k_d = jax.random.split(key)
        gen = HiFiGANGenerator(config=cfg.hifigan)
        disc = HiFiGANDiscriminators()
        p_g = jax.jit(gen.init)(
            k_g, jnp.zeros((1, T, cfg.hifigan.in_channels))
        )["params"]
        p_d = jax.jit(disc.init)(k_d, jnp.zeros((2, T * hop)))["params"]
        gs = TrainState.create(p_g, optax.adam(1e-4), k_g)
        ds = TrainState.create(p_d, optax.adam(1e-4), k_d)
        batch = {"mel": jnp.zeros((B, T, cfg.hifigan.in_channels)),
                 "audio": jnp.zeros((B, T * hop))}
        for remat in (False, True):
            d_step, g_step = make_gan_steps(cfg, compute_dtype=dt,
                                            remat=remat)
            rows.append({"stage": "gan_gen", "remat": remat,
                         **_mem(g_step, gs, ds, batch)})
            if not remat:  # disc step has no remat knob (see --remat help)
                rows.append({"stage": "gan_disc", "remat": False,
                             **_mem(d_step, gs, ds, batch)})

    for r in rows:
        print(json.dumps({"B": B, "T": T,
                          "dtype": "bf16" if args.bf16 else "f32", **r}))


if __name__ == "__main__":
    main()
