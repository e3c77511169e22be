"""VAE loss forensics: re-derive the jitted loss arithmetic step by step.

Rebuild of /root/reference/debug_vae_loss.py:150-218 — cross-checks the
compiled trainer against an explicit host-side re-computation of every term
(masked sums, denominators, KL composition) on one batch, with NaN/Inf
tripwires. If the two disagree, the training step has a bug.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.config import IrisConfig
from iris_tts_tpu.models import PhonemeEncoder, TextConditionedVAE
from iris_tts_tpu.ops.length import length_regulate
from iris_tts_tpu.ops.losses import vae_loss
from iris_tts_tpu.train import TrainState, adam_clipped, make_vae_train_step


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--frames", type=int, default=32)
    parser.add_argument("--kl_weight", type=float, default=0.01)
    args = parser.parse_args()

    cfg = IrisConfig()
    B, P, T = args.batch_size, 8, args.frames
    key = jax.random.PRNGKey(0)

    encoder = PhonemeEncoder(config=cfg.encoder)
    vae = TextConditionedVAE(config=cfg.vae)
    p_enc = jax.jit(encoder.init)(key, jnp.zeros((1, P), jnp.int32))["params"]
    p_vae = jax.jit(vae.init)(
        {"params": key, "sample": key},
        jnp.zeros((1, T, cfg.vae.n_mels)),
        jnp.zeros((1, T, cfg.vae.cond_dim)),
    )["params"]

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

    # 1) What the jitted trainer computes.
    state = TrainState.create(
        p_vae, adam_clipped(1e-4), key, frozen={"encoder": p_enc}
    )
    step = jax.jit(make_vae_train_step(cfg))
    _, metrics = step(state, batch, jnp.asarray(args.kl_weight))
    print("jitted step:     ",
          {k: round(float(v), 6) for k, v in metrics.items()})

    # 2) Explicit re-derivation with the same rng stream.
    step_rng = jax.random.fold_in(state.rng, state.step)
    sample_rng, dropout_rng = jax.random.split(step_rng)
    enc = encoder.apply(
        {"params": p_enc}, batch["phoneme_ids"],
        padding_mask=batch["phoneme_mask"],
    )
    cond, frame_mask = length_regulate(
        enc, batch["durations"].astype(jnp.int32), T
    )
    recon, (mean, logvar), _ = vae.apply(
        {"params": p_vae}, batch["mel"], cond, deterministic=False,
        rngs={"sample": sample_rng, "dropout": dropout_rng},
    )
    for name, x in [("recon", recon), ("mean", mean), ("logvar", logvar)]:
        assert bool(jnp.all(jnp.isfinite(x))), f"{name} has NaN/Inf!"
    total, manual = vae_loss(
        batch["mel"], recon, mean, logvar, frame_mask,
        cfg.vae.down_factor, jnp.asarray(args.kl_weight),
    )
    print("manual recompute:",
          {k: round(float(v), 6) for k, v in manual.items()})

    # 3) Fully-manual arithmetic (no library loss fns).
    m = np.asarray(frame_mask)[..., None]
    diff = np.abs(np.asarray(batch["mel"]) - np.asarray(recon)) * m
    recon_l1 = diff.sum() / (m.sum() * cfg.vae.n_mels + 1e-6)
    lm = np.asarray(frame_mask)[:, :: cfg.vae.down_factor][..., None]
    kl_el = -0.5 * (
        1 + np.asarray(logvar) - np.asarray(mean) ** 2
        - np.exp(np.asarray(logvar))
    )
    kl = (kl_el * lm).sum() / (lm.sum() + 1e-8)
    print(f"raw numpy:        recon_l1={recon_l1:.6f} kl={kl:.6f} "
          f"total={recon_l1 + args.kl_weight * kl:.6f}")

    ok = abs(recon_l1 - float(manual["recon_l1"])) < 1e-4 and abs(
        kl - float(manual["kl"])
    ) < 1e-4
    print("✓ all three derivations agree" if ok
          else "✗ MISMATCH — investigate")


if __name__ == "__main__":
    main()
