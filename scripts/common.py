"""Shared CLI plumbing for the training/inference scripts.

One config tree + one arg pattern across every stage — the fix for the
reference's drifting per-script argparse defaults (SURVEY.md §5 "Config /
flag system").
"""

from __future__ import annotations

import argparse
import logging
from dataclasses import replace
from pathlib import Path

from iris_tts_tpu.config import IrisConfig, load_config, save_config


def setup_logging(verbose: bool = False) -> None:
    # force=True: jax/absl may have installed a root handler already, which
    # would silently turn basicConfig into a no-op.
    logging.basicConfig(
        level=logging.DEBUG if verbose else logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
        force=True,
    )
    # Third-party INFO chatter (orbax emits several lines per checkpoint op).
    for noisy in ("orbax", "absl", "jax"):
        logging.getLogger(noisy).setLevel(
            logging.DEBUG if verbose else logging.WARNING
        )


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--config", type=str, default=None,
        help="Path to an IrisConfig JSON (defaults to built-in production "
        "config; stage checkpoints persist the config they trained with)",
    )
    parser.add_argument("--data_root", type=str, default="data/LJSpeech-1.1")
    parser.add_argument("--alignment_dir", type=str, default="data/aligned")
    parser.add_argument("--cache_dir", type=str, default="outputs/cache")
    parser.add_argument("--output_dir", type=str, default="outputs")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--num_epochs", type=int, default=None)
    parser.add_argument("--learning_rate", type=float, default=None)
    parser.add_argument("--seed", type=int, default=None,
                        help="training seed (default: config value)")
    parser.add_argument("--verbose", action="store_true")


def resolve_config(args: argparse.Namespace) -> IrisConfig:
    cfg = (
        load_config(args.config) if args.config else IrisConfig()
    )
    train = cfg.train
    if getattr(args, "batch_size", None):
        train = replace(train, batch_size=args.batch_size)
    if getattr(args, "num_epochs", None):
        train = replace(train, num_epochs=args.num_epochs)
    if getattr(args, "learning_rate", None):
        train = replace(train, learning_rate=args.learning_rate)
    if getattr(args, "seed", None) is not None:
        train = replace(train, seed=args.seed)
    return replace(cfg, train=train)


def persist_config(cfg: IrisConfig, output_dir: str | Path, name: str) -> None:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_config(cfg, out / name)


# ---------------------------------------------------------------------------
# Tunnel-aware device timing (shared by the bench/profiling scripts)
# ---------------------------------------------------------------------------


def sync(out) -> None:
    """Force execution AND completion of a device computation.

    On the tunneled axon backend ``block_until_ready`` returns before the
    computation finishes, so honest timing must fetch (a scalar of) the
    result to the host; the reduction keeps the transfer negligible.
    """
    import jax
    import jax.numpy as jnp

    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def avg_ms(fn, args_cycle, n: int = 30) -> float:
    """Wall time per call: queue ``n`` calls (cycling distinct inputs so no
    layer can dedupe), then one host fetch — the single ~27 ms tunnel round
    trip is amortized over all of them."""
    import time

    args_cycle = [a if isinstance(a, tuple) else (a,) for a in args_cycle]
    sync(fn(*args_cycle[0]))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for i in range(n):
        out = fn(*args_cycle[i % len(args_cycle)])
    sync(out)
    return 1000 * (time.perf_counter() - t0) / n
