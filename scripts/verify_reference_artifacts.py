"""One-command real-artifact insurance (VERDICT r3 item 7).

This environment cannot download the reference's trained artifacts — the
speechbrain HiFiGAN ``generator.ckpt``
(/root/reference/src/iris/hifigan_pretrained.py:270-273), per-stage Keras
``.weights.h5`` files (/root/reference/scripts/train_vae.py:139-164), or
LJSpeech itself. The converters and trainers stand ready, validated on
fixtures. When any real artifact ever appears, point this script at it:
it runs the conversion, scores parity, optionally runs one real training
epoch, and appends a dated results section to PARITY.md.

Usage (any subset of flags):
    python scripts/verify_reference_artifacts.py \
        --hifigan_ckpt /path/to/generator.ckpt \
        --encoder_h5 enc.weights.h5 --duration_h5 dur.weights.h5 \
        --ljspeech /path/to/LJSpeech-1.1 --alignment_dir /path/to/aligned \
        --parity_md PARITY.md
"""

from __future__ import annotations

import argparse
import datetime
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def check_hifigan(ckpt: Path, cfg, lines: list) -> bool:
    """Convert a torch generator checkpoint and score waveform parity of
    the JAX generator against the torch oracle forward (the BASELINE
    1e-3 max-abs contract)."""
    import jax
    import jax.numpy as jnp

    from iris_tts_tpu.convert.hifigan_torch import (
        convert_hifigan_state_dict,
        load_torch_checkpoint,
        normalize_state_dict_keys,
    )
    from iris_tts_tpu.models.hifigan import HiFiGANGenerator

    t0 = time.time()
    sd = load_torch_checkpoint(ckpt)
    params = convert_hifigan_state_dict(sd, cfg.hifigan)
    lines.append(f"- hifigan conversion: OK ({time.time() - t0:.1f}s, "
                 f"{ckpt})")

    # torch oracle forward on the same weights
    try:
        import torch

        from iris_tts_tpu.convert.torch_oracle import TorchGenerator

        oracle = TorchGenerator(cfg.hifigan)
        oracle.load_state_dict(
            {k: torch.as_tensor(np.asarray(v))
             for k, v in normalize_state_dict_keys(sd).items()},
            strict=False,
        )
        oracle.eval()
    except Exception as e:  # noqa: BLE001
        lines.append(f"- hifigan torch-oracle load FAILED: {e}")
        return False
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 87, cfg.hifigan.in_channels)).astype(
        np.float32
    )
    with torch.no_grad():
        want = oracle(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0]
    gen = HiFiGANGenerator(config=cfg.hifigan)
    got = np.asarray(
        jax.jit(lambda p, m: gen.apply({"params": p}, m))(
            params, jnp.asarray(mel)
        )
    )
    err = float(np.abs(got - want).max())
    ok = err <= 1e-3
    lines.append(
        f"- hifigan waveform parity vs torch oracle: max|Δ| = {err:.2e} "
        f"({'PASS' if ok else 'FAIL'} vs the 1e-3 BASELINE contract)"
    )
    return ok


def check_keras_stage(h5: Path, stage: str, cfg, lines: list) -> bool:
    """Convert a reference .weights.h5 and smoke the converted params
    through the matching flax module."""
    import jax
    import jax.numpy as jnp

    from iris_tts_tpu.convert import keras_h5

    t0 = time.time()
    w = keras_h5.read_weights_h5(h5)
    try:
        if stage == "encoder":
            from iris_tts_tpu.models import PhonemeEncoder

            params = keras_h5.convert_encoder(
                w, num_blocks=cfg.encoder.num_blocks
            )
            mod = PhonemeEncoder(config=cfg.encoder)
            out = jax.jit(mod.apply)(
                {"params": params}, jnp.zeros((1, 8), jnp.int32)
            )
        elif stage == "duration":
            from iris_tts_tpu.models import DurationPredictor

            params = keras_h5.convert_duration(
                w, num_layers=cfg.duration.num_layers
            )
            mod = DurationPredictor(config=cfg.duration)
            out = jax.jit(mod.apply)(
                {"params": params},
                jnp.zeros((1, 8, cfg.encoder.embed_dim)),
            )
        elif stage == "postnet":
            from iris_tts_tpu.models import PostNet

            converted = keras_h5.convert_postnet(
                w, num_layers=cfg.postnet.num_layers
            )
            mod = PostNet(config=cfg.postnet)
            out = mod.apply(
                converted, jnp.zeros((1, 8, cfg.postnet.n_mels)),
            )
        elif stage == "vae":
            from iris_tts_tpu.models import TextConditionedVAE

            params = keras_h5.convert_vae(
                w,
                num_wavenet_blocks=cfg.vae.num_wavenet_blocks,
                decoder_blocks=cfg.vae.decoder_blocks,
                down_stages=cfg.vae.down_stages,
                flow_layers=cfg.vae.flow_layers,
            )
            mod = TextConditionedVAE(config=cfg.vae)
            t = cfg.vae.down_factor * 4
            out = mod.apply(
                {"params": params},
                jnp.zeros((1, t, cfg.vae.n_mels)),
                jnp.zeros((1, t, cfg.vae.cond_dim)),
                rngs={"sample": jax.random.PRNGKey(0)},
            )
        else:
            raise ValueError(f"unknown stage {stage}")
    except Exception as e:  # noqa: BLE001
        lines.append(f"- {stage} .weights.h5 conversion FAILED: {e}")
        return False
    finite = all(
        bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(out)
    )
    lines.append(
        f"- {stage} .weights.h5 conversion: OK ({time.time() - t0:.1f}s, "
        f"forward finite={finite}, {h5})"
    )
    return finite


def check_ljspeech_epoch(data_root: Path, alignment_dir: Path, cfg,
                         lines: list, cache_dir: Path) -> bool:
    """One real VAE training epoch on the actual dataset: encoder from
    random init (frozen), losses must be finite and decrease within the
    epoch."""
    import jax
    import jax.numpy as jnp

    from iris_tts_tpu.data.batching import BucketedBatcher
    from iris_tts_tpu.data.ljspeech import LJSpeechVAEDataset
    from iris_tts_tpu.models import PhonemeEncoder, TextConditionedVAE
    from iris_tts_tpu.train import (
        TrainState,
        adam_clipped,
        make_vae_train_step,
    )

    t0 = time.time()
    ds = LJSpeechVAEDataset(
        data_root, alignment_dir, split="train", cache_dir=cache_dir,
        audio=cfg.audio, max_frames=1024,
    )
    lines.append(f"- LJSpeech dataset: {len(ds)} train utterances, vocab "
                 f"{len(ds.vocab)}")
    if not len(ds):
        lines.append("- LJSpeech epoch: FAILED (empty dataset)")
        return False
    from dataclasses import replace

    cfg = replace(cfg, encoder=replace(cfg.encoder,
                                       vocab_size=len(ds.vocab)))
    key = jax.random.PRNGKey(0)
    enc = PhonemeEncoder(config=cfg.encoder)
    p_enc = jax.jit(enc.init)(key, jnp.zeros((1, 8), jnp.int32))["params"]
    vae = TextConditionedVAE(config=cfg.vae)
    t = cfg.vae.down_factor * 4
    p_vae = jax.jit(vae.init)(
        {"params": key, "sample": key},
        jnp.zeros((1, t, cfg.vae.n_mels)),
        jnp.zeros((1, t, cfg.vae.cond_dim)),
    )["params"]
    state = TrainState.create(
        p_vae, adam_clipped(1e-3), key, frozen={"encoder": p_enc}
    )
    step = jax.jit(make_vae_train_step(cfg))
    batcher = BucketedBatcher(ds, 8, with_mel=True,
                              down_factor=cfg.vae.down_factor)
    losses = []
    for batch in batcher.epoch(0):
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step(state, b, jnp.asarray(0.001))
        losses.append(float(metrics["total"]))
    ok = (
        len(losses) > 1
        and all(np.isfinite(losses))
        and losses[-1] < losses[0]
    )
    lines.append(
        f"- LJSpeech VAE epoch: {len(losses)} steps in "
        f"{time.time() - t0:.1f}s, loss {losses[0]:.3f} → {losses[-1]:.3f} "
        f"({'PASS' if ok else 'FAIL'})"
    )
    return ok


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hifigan_ckpt", type=Path, default=None)
    ap.add_argument("--encoder_h5", type=Path, default=None)
    ap.add_argument("--duration_h5", type=Path, default=None)
    ap.add_argument("--postnet_h5", type=Path, default=None)
    ap.add_argument("--vae_h5", type=Path, default=None)
    ap.add_argument("--ljspeech", type=Path, default=None)
    ap.add_argument("--alignment_dir", type=Path, default=None)
    ap.add_argument("--cache_dir", type=Path, default=Path("outputs/refcache"))
    ap.add_argument("--config", type=str, default=None,
                    help="IrisConfig JSON (default: production config)")
    ap.add_argument("--parity_md", type=Path,
                    default=Path(__file__).resolve().parent.parent
                    / "PARITY.md")
    args = ap.parse_args()

    from iris_tts_tpu.config import IrisConfig, load_config

    cfg = load_config(args.config) if args.config else IrisConfig()

    lines: list = []
    results: list = []
    if args.hifigan_ckpt:
        results.append(check_hifigan(args.hifigan_ckpt, cfg, lines))
    for stage, p in (("encoder", args.encoder_h5),
                     ("duration", args.duration_h5),
                     ("postnet", args.postnet_h5),
                     ("vae", args.vae_h5)):
        if p:
            results.append(check_keras_stage(p, stage, cfg, lines))
    if args.ljspeech:
        if not args.alignment_dir:
            ap.error("--ljspeech needs --alignment_dir")
        results.append(check_ljspeech_epoch(
            args.ljspeech, args.alignment_dir, cfg, lines, args.cache_dir
        ))
    if not results:
        ap.error("nothing to verify: pass at least one artifact flag")

    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    verdict = "ALL PASS" if all(results) else "FAILURES PRESENT"
    section = "\n".join([
        "",
        f"## Real-artifact verification — {stamp} ({verdict})",
        "",
        "Produced by `scripts/verify_reference_artifacts.py`:",
        "",
        *lines,
        "",
    ])
    with open(args.parity_md, "a") as f:
        f.write(section)
    print(section)
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
