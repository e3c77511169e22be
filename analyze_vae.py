"""VAE output diagnostics: reconstruction quality + mode-collapse heuristics.

Rebuild of /root/reference/analyze_vae.py:112-255: reconstruction vs ground
truth, unconditional and random-conditioned generation, and the flat-output
/ mode-collapse heuristics (std < 0.5 warnings, MSE rubric).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

from iris_tts_tpu.data.ljspeech import LJSpeechVAEDataset
from iris_tts_tpu.models import PhonemeEncoder, TextConditionedVAE
from iris_tts_tpu.ops.length import length_regulate, round_up_to_multiple
from scripts.common import add_common_args, resolve_config, setup_logging
from scripts.train_postnet import load_frozen_vae
from scripts.train_vae import load_frozen_encoder


def rubric(mse: float) -> str:
    # reference: analyze_vae.py:240-245
    if mse > 5:
        return "not trained well"
    if mse > 1:
        return "could be better"
    return "reasonable"


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--encoder_checkpoint", type=str,
                        default="outputs/encoder/checkpoints")
    parser.add_argument("--vae_checkpoint", type=str,
                        default="outputs/vae/checkpoints")
    parser.add_argument("--num_samples", type=int, default=4)
    args = parser.parse_args()
    setup_logging(args.verbose)
    cfg_file = Path(args.vae_checkpoint) / "config.json"
    if cfg_file.exists():
        args.config = str(cfg_file)
    cfg = resolve_config(args)

    ds = LJSpeechVAEDataset(
        args.data_root, args.alignment_dir, split="val",
        cache_dir=args.cache_dir, audio=cfg.audio,
    )
    frozen_encoder = load_frozen_encoder(cfg, args.encoder_checkpoint)
    vae_params = load_frozen_vae(cfg, args.vae_checkpoint, frozen_encoder)
    encoder = PhonemeEncoder(config=cfg.encoder)
    vae = TextConditionedVAE(config=cfg.vae)
    key = jax.random.PRNGKey(0)

    for i in range(min(args.num_samples, len(ds))):
        s = ds[i]
        T = round_up_to_multiple(s.mel.shape[0], cfg.vae.down_factor)
        mel = jnp.asarray(np.pad(s.mel, ((0, T - s.mel.shape[0]), (0, 0))))[None]
        ids = jnp.asarray(s.phoneme_ids)[None]
        durs = jnp.asarray(s.durations.astype(np.int32))[None]
        enc = encoder.apply({"params": frozen_encoder}, ids)
        cond, _ = length_regulate(enc, durs, T)

        # Reconstruction (posterior mean).
        recon, (mean, logvar), _ = vae.apply({"params": vae_params}, mel, cond)
        r = np.asarray(recon[0, : s.mel.shape[0]])
        mse = float(np.mean((r - s.mel) ** 2))
        print(f"[{s.file_id}] recon MSE={mse:.4f} ({rubric(mse)}) "
              f"recon std={r.std():.3f} target std={s.mel.std():.3f} "
              f"posterior |mean|={float(jnp.abs(mean).mean()):.3f} "
              f"logvar mean={float(logvar.mean()):.3f}")
        if r.std() < 0.5:
            print("  WARNING: flat reconstruction (std < 0.5) — possible "
                  "mode collapse (reference heuristic analyze_vae.py:247)")

        # Conditioned generation from prior.
        gen, _ = vae.apply(
            {"params": vae_params}, cond,
            method=TextConditionedVAE.generate,
            rngs={"sample": jax.random.fold_in(key, i)},
        )
        g = np.asarray(gen[0])
        print(f"  prior generate: std={g.std():.3f} "
              f"range [{g.min():.2f}, {g.max():.2f}]")

        # Random-conditioning control (should look different).
        rand_cond = jax.random.normal(jax.random.fold_in(key, 100 + i),
                                      cond.shape)
        gen_r, _ = vae.apply(
            {"params": vae_params}, rand_cond,
            method=TextConditionedVAE.generate,
            rngs={"sample": jax.random.fold_in(key, 200 + i)},
        )
        delta = float(np.abs(np.asarray(gen_r) - g).mean())
        print(f"  random-cond control: |Δ|={delta:.3f} "
              f"{'(conditioning is live)' if delta > 0.05 else '(WARNING: conditioning ignored!)'}")


if __name__ == "__main__":
    main()
