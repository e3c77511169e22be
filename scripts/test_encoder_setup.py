"""Pre-training smoke test for the encoder/duration stage.

Rebuild of /root/reference/scripts/test_encoder_setup.py:17-154: dataset
load → model build → batched forward + loss, printed as ✓/✗ checks. (The
real correctness coverage lives in tests/; this is the quick pre-flight.)
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

from iris_tts_tpu.data.batching import collate_duration_batch
from iris_tts_tpu.data.ljspeech import LJSpeechDurationDataset, Sample
from iris_tts_tpu.models import DurationPredictor, PhonemeEncoder
from iris_tts_tpu.ops.losses import duration_huber_loss
from scripts.common import add_common_args, resolve_config, setup_logging


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    args = parser.parse_args()
    setup_logging(args.verbose)
    cfg = resolve_config(args)
    failures = 0

    # 1. dataset (falls back to synthetic samples if no corpus present)
    try:
        ds = LJSpeechDurationDataset(
            args.data_root, args.alignment_dir, split="train",
            cache_dir=args.cache_dir, audio=cfg.audio,
        )
        assert len(ds) > 0
        print(f"✓ dataset: {len(ds)} samples, vocab {len(ds.vocab)}")
        vocab_size = len(ds.vocab)
        samples = [ds[i] for i in range(min(4, len(ds)))]
    except Exception as e:
        print(f"… no corpus at {args.data_root} ({e}); using synthetic")
        vocab_size = cfg.encoder.vocab_size
        rng = np.random.default_rng(0)
        samples = [
            Sample(f"syn{i}", "", rng.integers(2, vocab_size, 12).astype(np.int32),
                   rng.integers(1, 9, 12).astype(np.float32))
            for i in range(4)
        ]

    # 2. model build
    try:
        from dataclasses import replace

        cfg = replace(cfg, encoder=replace(cfg.encoder, vocab_size=vocab_size))
        key = jax.random.PRNGKey(0)
        encoder = PhonemeEncoder(config=cfg.encoder)
        head = DurationPredictor(config=cfg.duration)
        p_enc = jax.jit(encoder.init)(key, jnp.zeros((1, 8), jnp.int32))["params"]
        p_head = jax.jit(head.init)(
            key, jax.jit(encoder.apply)({"params": p_enc}, jnp.zeros((1, 8), jnp.int32))
        )["params"]
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(p_enc))
        print(f"✓ models built ({n_params:,} encoder params)")
    except Exception:
        traceback.print_exc()
        return 1

    # 3. batched forward + loss
    try:
        batch = collate_duration_batch(samples, phoneme_bucket=16)

        @jax.jit
        def fwd(p_enc, p_head, batch):
            enc = encoder.apply(
                {"params": p_enc}, batch["phoneme_ids"],
                padding_mask=batch["phoneme_mask"],
            )
            pred = head.apply({"params": p_head}, enc)
            return duration_huber_loss(
                pred, batch["durations"], batch["phoneme_mask"]
            )

        loss = float(fwd(p_enc, p_head,
                         {k: jnp.asarray(v) for k, v in batch.items()}))
        assert np.isfinite(loss)
        print(f"✓ batched forward + loss = {loss:.4f} "
              f"({'reasonable' if loss < 500 else 'check scaling'})")
    except Exception:
        traceback.print_exc()
        failures += 1

    print("SETUP OK" if failures == 0 else f"{failures} FAILURES")
    return failures


if __name__ == "__main__":
    sys.exit(main())
