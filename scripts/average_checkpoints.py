"""Average the params of the last K checkpoints of a training stage.

Checkpoint averaging (Polyak-style, over saved steps rather than every
update) is the standard cheap quality lift for seq2seq/vocoder models when
EMA wasn't tracked during the run: the averaged point sits in a flatter
region of the loss landscape than any single step. Writes a bare params
directory loadable by ``iris_tts_tpu.train.checkpoint.load_params`` (or a
TTSPipeline stage slot).

Usage:
    python scripts/average_checkpoints.py \
        --stage_dir outputs/vae/checkpoints --last 5 --output avg_params
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from iris_tts_tpu.train.checkpoint import CheckpointManager, save_params
from scripts.common import setup_logging

logger = logging.getLogger(__name__)


def average_stage_params(stage_dir: str | Path, last: int = 5,
                         steps: list[int] | None = None):
    """Mean of the ``params`` subtree over checkpoint ``steps`` (default:
    the last ``last`` retained steps). Returns (avg_params, used_steps)."""
    mgr = CheckpointManager(Path(stage_dir))
    try:
        all_steps = mgr.all_steps()
        if not all_steps:
            raise FileNotFoundError(f"no checkpoints in {stage_dir}")
        if steps is None:
            steps = all_steps[-last:]
        missing = sorted(set(steps) - set(all_steps))
        if missing:
            raise ValueError(
                f"steps {missing} not retained (have {all_steps})"
            )
        acc = None
        for s in steps:
            params = mgr.restore_raw(s)["params"]
            params = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float64), params
            )
            acc = params if acc is None else jax.tree_util.tree_map(
                np.add, acc, params
            )
        inv = 1.0 / len(steps)
        avg = jax.tree_util.tree_map(
            lambda x: (x * inv).astype(np.float32), acc
        )
        return avg, list(steps)
    finally:
        mgr.close()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage_dir", required=True,
                    help="a stage checkpoint dir (CheckpointManager root)")
    ap.add_argument("--last", type=int, default=5)
    ap.add_argument("--steps", type=int, nargs="+", default=None,
                    help="explicit checkpoint steps to average")
    ap.add_argument("--output", required=True,
                    help="output directory for the averaged bare params")
    args = ap.parse_args()
    setup_logging()

    avg, used = average_stage_params(args.stage_dir, args.last, args.steps)
    save_params(args.output, avg)
    logger.info("averaged %d checkpoints (steps %s) -> %s",
                len(used), used, args.output)


if __name__ == "__main__":
    main()
