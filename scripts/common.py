"""Shared CLI plumbing for the training/inference scripts.

One config tree + one arg pattern across every stage — the fix for the
reference's drifting per-script argparse defaults (SURVEY.md §5 "Config /
flag system").
"""

from __future__ import annotations

import argparse
import logging
import os
from dataclasses import replace
from pathlib import Path

# Optional platform override for the stage CLIs (mirrors the test
# conftest's IRIS_TEST_PLATFORM): environments that pre-import jax with
# JAX_PLATFORMS pinned to a hardware plugin (site customization) make the
# env var alone too late, so go through the live config. Lets smoke runs
# of the training scripts execute on CPU: IRIS_PLATFORM=cpu python
# scripts/train_full_pipeline.py ...
_plat = os.environ.get("IRIS_PLATFORM")
if _plat:
    import jax

    os.environ["JAX_PLATFORMS"] = _plat
    jax.config.update("jax_platforms", _plat)

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
    """Force execution AND completion of a device computation (tunneled
    backends: ``block_until_ready`` is not a barrier). Delegates to the
    one canonical barrier, :func:`iris_tts_tpu.utils.tpu.force_done`."""
    from iris_tts_tpu.utils.tpu import force_done

    force_done(out)


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


def add_mesh_arg(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--mesh", action="store_true",
        help="train data-parallel over all visible devices: batches shard "
        "over the mesh's data axis, state replicates, XLA inserts the "
        "gradient psums (new capability beyond the single-device "
        "reference, SURVEY.md §2.4)",
    )
    parser.add_argument(
        "--model_parallel", type=int, default=1,
        help="with --mesh: split the mesh (all_devices/N, N) and shard "
        "wide trailing parameter dims (conv output channels, FFN widths) "
        "over the model axis — params, optimizer moments, and their "
        "gradients then live sharded, cutting per-device state memory "
        "~1/N for the wide layers",
    )


def add_bf16_arg(parser) -> None:
    parser.add_argument(
        "--bf16", action="store_true",
        help="mixed-precision training: bf16 module compute, f32 "
        "params/grads/optimizer (no loss scaling needed on TPU); roughly "
        "halves activation HBM traffic",
    )


def compute_dtype_of(args):
    import jax.numpy as jnp

    return jnp.bfloat16 if getattr(args, "bf16", False) else None


def add_checkify_arg(parser) -> None:
    parser.add_argument(
        "--checkify", action="store_true",
        help="debug mode: run the train step under jax.experimental."
        "checkify float/index checks — NaN/Inf/out-of-bounds inside the "
        "jitted step raise WITH the failing operation's location instead "
        "of silently poisoning the run (SURVEY §5 sanitizers; slower, "
        "disables buffer donation)",
    )


def jit_train_step(step_fn, checkify_enabled: bool = False,
                   donate_argnums=0):
    """jit a train step (``(state, batch, *extras)`` or the GAN's
    ``(gen_state, disc_state, batch)`` shape — ``donate_argnums`` says
    which argument is the updated state).

    Default: donating jit (in-place state update). With
    ``checkify_enabled``: the step runs under checkify float+index checks
    and every call raises at the first NaN/Inf/bad index, pinpointing the
    op — the debug counterpart of utils.prof.guard_finite's coarse
    post-hoc check. Donation is off in this mode (the error state threads
    through the same buffers).
    """
    import jax

    if not checkify_enabled:
        return jax.jit(step_fn, donate_argnums=donate_argnums)
    from jax.experimental import checkify

    checked = checkify.checkify(
        step_fn, errors=checkify.float_checks | checkify.index_checks
    )
    jitted = jax.jit(checked)

    def step(state, batch, *extras):
        err, out = jitted(state, batch, *extras)
        checkify.check_error(err)
        return out

    return step


def training_place_fn(place_batch=None, accum_steps: int = 1):
    """Compose the ``TrainLoop.place_batch`` callable: optional microbatch
    split (host-side reshape, BEFORE transfer) then mesh/device placement.
    Runs on the loop's prefetch thread, so collate + split + transfer all
    overlap the previous step's device compute."""
    import jax.numpy as jnp
    import numpy as np

    from iris_tts_tpu.train import split_microbatches

    def place(batch):
        batch = {k: np.asarray(v) for k, v in batch.items()}
        if accum_steps > 1:
            batch = split_microbatches(batch, accum_steps)
        if place_batch is not None:
            return place_batch(batch)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    return place


def mesh_training_placement(
    state, accum_steps: int = 1, model_parallel: int = 1
):
    """Place a TrainState + per-step batches for mesh training.

    Returns ``(state, place_batch)``: the state placed across a
    ``(data, model)`` mesh of all visible devices, and a function that
    device_puts a host batch with its batch axis sharded over ``data``
    (axis 1 when gradient accumulation stacks microbatches in front —
    each microbatch then spreads over the mesh). The jitted train step
    itself is untouched: GSPMD reads the shardings and inserts the
    cross-device gradient reductions. Masked losses stay exact under the
    batcher's padded remainder rows because their denominators are global
    mask sums.

    ``model_parallel > 1`` additionally tensor-shards the state: every
    array leaf goes through the serving TP rule
    (:func:`iris_tts_tpu.parallel.sharding.tp_param_sharding` — trailing
    output-channel dims over the ``model`` axis where wide enough and
    evenly divisible, everything else replicated). Optimizer moments and
    the EMA average have param shapes, so they shard identically and the
    whole optimizer state scales ~1/N in per-device memory for the wide
    layers. Gradients inherit the param shardings from XLA's propagation.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from iris_tts_tpu.config import MeshConfig
    from iris_tts_tpu.parallel.mesh import build_mesh, replicated
    from iris_tts_tpu.parallel.sharding import tp_param_sharding

    cfg = MeshConfig(model_parallel=model_parallel)
    mesh = build_mesh(cfg)
    if model_parallel > 1:
        state = tp_param_sharding(state, mesh, cfg)
    else:
        rep = replicated(mesh)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state
        )
    spec = (
        PartitionSpec(None, cfg.data_axis)
        if accum_steps > 1
        else PartitionSpec(cfg.data_axis)
    )
    sharding = NamedSharding(mesh, spec)

    def place_batch(batch):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )

    logging.getLogger(__name__).info(
        "mesh training on %s (%s)", dict(mesh.shape),
        "data+tensor parallel" if model_parallel > 1 else "data parallel",
    )
    return state, place_batch
