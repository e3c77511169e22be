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
