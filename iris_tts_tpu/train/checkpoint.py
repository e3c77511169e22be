"""Orbax checkpointing: full train state, atomic, resumable.

The reference saves per-component Keras ``.weights.h5`` files and loses
optimizer state + RNG on resume (/root/reference/scripts/train_vae.py:241-256,
498-511; SURVEY.md §5). Here a :class:`CheckpointManager` wraps Orbax with
the reference's retention policy — best-on-val + every-N-epochs + latest —
and checkpoints the **entire** :class:`TrainState` (params, optimizer, RNG,
step, batch_stats, frozen companions) plus the config JSON, so resume is
bit-exact and architecture mismatches (SURVEY.md §2.6 PostNet case) are
structurally impossible.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp

from iris_tts_tpu.config import IrisConfig, config_from_json, config_to_json

logger = logging.getLogger(__name__)


class CheckpointManager:
    """Stage-level checkpoint manager (one directory per training stage)."""

    def __init__(
        self,
        directory: str | Path,
        config: Optional[IrisConfig] = None,
        keep_every_n: int = 5,
        max_to_keep: int = 5,
    ):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.keep_every_n = keep_every_n
        # Long-term retention: saves marked as epoch-boundary keepers are
        # PINNED by step number (orbax's keep_period is in raw step units,
        # which drifts off epoch boundaries after a mid-epoch preemption
        # resume — the every-N-EPOCHS policy must not depend on step
        # arithmetic). The pinned set persists beside the checkpoints.
        self._pinned_file = self.directory / "pinned_steps.json"
        self._pinned = set()
        if self._pinned_file.exists():
            self._pinned = set(json.loads(self._pinned_file.read_text()))
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                should_keep_fn=lambda step: step in self._pinned,
                create=True,
            ),
        )
        self.best_metric = float("inf")
        self._best_file = self.directory / "best_metric.json"
        if self._best_file.exists():
            data = json.loads(self._best_file.read_text())
            self.best_metric = data.get("best_metric", float("inf"))
        if config is not None:
            cfg_file = self.directory / "config.json"
            new_text = config_to_json(config)
            if cfg_file.exists():
                # The config that TRAINED these checkpoints is the
                # authoritative record — never clobber it on resume (the
                # SURVEY §2.6 drift-bug class). Mismatches are surfaced,
                # not silently overwritten.
                if cfg_file.read_text() != new_text:
                    logger.warning(
                        "config differs from the one recorded beside the "
                        "checkpoints (%s); keeping the ORIGINAL record — "
                        "delete it explicitly if the change is intentional",
                        cfg_file,
                    )
            else:
                cfg_file.write_text(new_text)

    # -- save ----------------------------------------------------------------

    def save(self, step: int, state: Any, metrics: Optional[dict] = None,
             val_metric: Optional[float] = None, wait: bool = False,
             epoch: Optional[int] = None) -> bool:
        """Save at ``step``; track best-on-val separately (reference policy:
        train_encoder.py:281-296). Returns True if this is a new best.

        Saves are ASYNC by default: orbax snapshots the arrays and commits
        on a background thread, so training resumes immediately (a second
        ``save`` while one is in flight waits internally, and commits are
        atomic — readers only ever see completed steps). Pass ``wait=True``
        when the process may exit right after (preemption, final save) or
        when another process must observe the checkpoint immediately.

        ``epoch`` (1-based count of COMPLETED epochs) drives long-term
        retention: saves at multiples of ``keep_every_n`` epochs are
        pinned and survive ``max_to_keep`` eviction forever.
        """
        if (epoch is not None and self.keep_every_n
                and epoch % self.keep_every_n == 0):
            self._pinned.add(int(step))
            # persist BEFORE the save triggers eviction, and atomically
            tmp = self._pinned_file.with_suffix(".tmp")
            tmp.write_text(json.dumps(sorted(self._pinned)))
            tmp.replace(self._pinned_file)
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(_to_savable(state)),
            metrics=metrics,
        )
        is_best = False
        if val_metric is not None and val_metric < self.best_metric:
            best_dir = self.directory / "best"
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(
                    best_dir, _to_savable(state), force=True
                )
            # Record the new best AFTER its checkpoint commits: a crash
            # in between would otherwise leave a phantom best metric that
            # suppresses every future best save while best/ holds a stale
            # (or no) state.
            self.best_metric = float(val_metric)
            self._best_file.write_text(
                json.dumps({"best_metric": self.best_metric, "step": step})
            )
            is_best = True
        if wait:
            self._mgr.wait_until_finished()
        return is_best

    def wait_until_finished(self) -> None:
        """Block until every in-flight async save has committed."""
        self._mgr.wait_until_finished()

    # -- restore -------------------------------------------------------------

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()  # async saves: settle before read
        return self._mgr.latest_step()

    def all_steps(self) -> list:
        """Retained checkpoint steps, ascending (public accessor so tools
        like scripts/average_checkpoints.py never touch the orbax handle)."""
        self._mgr.wait_until_finished()  # async saves: settle before read
        return sorted(self._mgr.all_steps())

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_template`` (same pytree,
        abstract or concrete arrays)."""
        self._mgr.wait_until_finished()  # async saves: settle before read
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        try:
            restored = self._mgr.restore(
                step,
                args=ocp.args.StandardRestore(_to_savable(state_template)),
            )
        except ValueError as e:
            if ("structures do not match" in str(e)
                    and "ema_params" in str(e)):
                # The common way to hit this: resuming an EMA run without
                # re-passing --ema_decay (template ema_params=None is an
                # EMPTY pytree node, not a mismatched leaf — orbax sees a
                # different tree). Say so instead of the raw tree dump.
                raise ValueError(
                    "checkpoint/template EMA mismatch: the checkpoint and "
                    "the resume template disagree on whether ema_params is "
                    "tracked — pass the ema_decay the run trained with "
                    f"(checkpoint: {self.directory})"
                ) from e
            raise
        return _from_savable(state_template, restored)

    def restore_best(self, state_template: Any) -> Any:
        best_dir = self.directory / "best"
        if not best_dir.exists():
            return self.restore(state_template)
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(
                best_dir, target=_to_savable(state_template)
            )
        return _from_savable(state_template, restored)

    # -- template-free restore (cross-stage loading) --------------------------

    def restore_raw(self, step: Optional[int] = None) -> dict:
        """Restore the checkpoint as a raw pytree dict (keys: step, params,
        opt_state, rng, batch_stats, frozen) WITHOUT a structure template.

        Use this when only a subtree (typically ``params``) is needed and
        the consumer's optimizer differs from the one that trained the
        stage — a template-based restore would fail on the ``opt_state``
        structure mismatch.
        """
        self._mgr.wait_until_finished()  # async saves: settle before read
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    def restore_best_raw(self) -> dict:
        best_dir = self.directory / "best"
        if not best_dir.exists():
            return self.restore_raw()
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(best_dir)

    def restore_best_params(self) -> Any:
        """The trained ``params`` subtree of the best (or latest)
        checkpoint, with no optimizer-structure coupling."""
        return self.restore_best_raw()["params"]

    def load_config(self) -> IrisConfig:
        return config_from_json(
            (self.directory / "config.json").read_text()
        )

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def _to_savable(state: Any) -> Any:
    """TrainState → plain pytree dict (drop the non-pytree optax tx)."""
    if hasattr(state, "params") and hasattr(state, "opt_state"):
        return {
            "step": state.step,
            "epoch": state.epoch,
            "params": state.params,
            "opt_state": state.opt_state,
            "rng": state.rng,
            "batch_stats": state.batch_stats,
            "frozen": state.frozen,
            # EMA average (None when disabled): without this key a resumed
            # GAN run would silently restart the average from the raw
            # params while serving_params claims a warmed-up EMA. The decay
            # rides along so resume can detect a template whose --ema_decay
            # flag disagrees with what trained (an ema_params=None template
            # would otherwise SKIP the saved subtree silently — None is an
            # empty pytree node, not a leaf).
            "ema_params": state.ema_params,
            "ema_decay": np.asarray(state.ema_decay, np.float32),
        }
    return state


def _from_savable(template: Any, restored: Any) -> Any:
    if hasattr(template, "params") and hasattr(template, "opt_state"):
        restored = dict(restored)
        saved_decay = float(np.asarray(restored.pop("ema_decay", 0.0)))
        if bool(saved_decay) != bool(template.ema_decay):
            raise ValueError(
                f"checkpoint trained with ema_decay={saved_decay} but the "
                f"resume template has ema_decay={template.ema_decay}: "
                "pass the matching --ema_decay (a mismatched template "
                "would silently drop the saved EMA average)"
            )
        return template.replace(**restored)
    return restored


# ---------------------------------------------------------------------------
# Simple single-pytree save/load (for exporting inference params)
# ---------------------------------------------------------------------------


def save_params(path: str | Path, params: Any) -> None:
    """Save a bare parameter pytree (e.g. TTSPipeline.params) to one
    directory."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params(path: str | Path, template: Any = None) -> Any:
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target=template)
