"""Pre-training smoke test for the VAE stage, incl. flow invertibility.

Rebuild of /root/reference/scripts/test_vae_setup.py:17-234 — dataset/model/
forward/generate checks plus the flow invertibility property test
``max|z − flow⁻¹(flow(z))|`` (done on latent_dim, fixing the reference's
channel-count bug at test_vae_setup.py:193 — SURVEY.md §2.6).
"""

from __future__ import annotations

import argparse
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from iris_tts_tpu.models import TextConditionedVAE, VolumePreservingFlow
from scripts.common import add_common_args, resolve_config, setup_logging


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    args = parser.parse_args()
    setup_logging(args.verbose)
    cfg = resolve_config(args)
    failures = 0
    key = jax.random.PRNGKey(0)
    B, T = 2, cfg.vae.down_factor * 8

    # 1. build + reconstruction forward
    try:
        vae = TextConditionedVAE(config=cfg.vae)
        mel = jax.random.normal(key, (B, T, cfg.vae.n_mels))
        cond = jax.random.normal(key, (B, T, cfg.vae.cond_dim))
        params = jax.jit(vae.init)(
            {"params": key, "sample": key}, mel, cond
        )["params"]
        recon, (mean, logvar), residual = jax.jit(vae.apply)(
            {"params": params}, mel, cond
        )
        tp = T // cfg.vae.down_factor
        assert recon.shape == (B, T, cfg.vae.n_mels)
        assert mean.shape == (B, tp, cfg.vae.latent_dim)
        assert float(jnp.abs(logvar).max()) == 0.0  # zero-init head
        print(f"✓ VAE forward: recon {recon.shape}, latent {mean.shape}, "
              f"logvar zero-init")
    except Exception:
        traceback.print_exc()
        return 1

    # 2. generation from prior
    try:
        gen, res = jax.jit(
            lambda p, c, k: vae.apply(
                {"params": p}, c, method=TextConditionedVAE.generate,
                rngs={"sample": k},
            )
        )(params, cond, key)
        assert gen.shape == (B, T, cfg.vae.n_mels)
        assert bool(jnp.isfinite(gen).all())
        print(f"✓ generate(): {gen.shape}, std={float(gen.std()):.3f}")
    except Exception:
        traceback.print_exc()
        failures += 1

    # 3. flow invertibility (on latent_dim — the reference's own test used
    #    model_channels and would crash).
    try:
        flow = VolumePreservingFlow(
            channels=cfg.vae.latent_dim,
            num_layers=cfg.vae.flow_layers,
            hidden_channels=cfg.vae.flow_hidden,
        )
        tp = T // cfg.vae.down_factor
        z = jax.random.normal(key, (B, tp, cfg.vae.latent_dim))
        lat_cond = jax.random.normal(key, (B, tp, cfg.vae.model_channels))
        fp = flow.init(key, z, lat_cond)["params"]
        fwd = flow.apply({"params": fp}, z, lat_cond, reverse=False)
        back = flow.apply({"params": fp}, fwd, lat_cond, reverse=True)
        err = float(jnp.max(jnp.abs(z - back)))
        assert err < 1e-4, err
        print(f"✓ flow invertibility: max|z − f⁻¹(f(z))| = {err:.2e}")
    except Exception:
        traceback.print_exc()
        failures += 1

    print("SETUP OK" if failures == 0 else f"{failures} FAILURES")
    return failures


if __name__ == "__main__":
    sys.exit(main())
