"""Generic training loop shared by all stage trainers.

One loop replaces the reference's three copy-pasted epoch loops
(scripts/train_encoder.py:192-296, train_vae.py:378-511,
train_postnet.py:294-409): bucketed batches in, jitted step, running means,
CSV metrics, per-epoch validation, best/periodic full-state checkpoints, and
resume. Host work per step is limited to the batcher's numpy collation.
"""

from __future__ import annotations

import logging
import signal
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from iris_tts_tpu.train.checkpoint import CheckpointManager
from iris_tts_tpu.train.state import TrainState
from iris_tts_tpu.utils.metrics import MetricsWriter, RunningMean

logger = logging.getLogger(__name__)

# Process-wide preemption marker. A standalone stage CLI exits right after
# its TrainLoop returns, so the instance flag is enough there — but the
# four-stage driver (scripts/train_full_pipeline.py) calls several stage
# mains in one process and must NOT proceed to the next stage after a
# SIGTERM-triggered checkpoint-and-stop (the later stages would train
# against a half-trained upstream and the run would look "complete").
_PREEMPTED = False


def was_preempted() -> bool:
    """True if any TrainLoop in this process stopped on SIGTERM/SIGINT."""
    return _PREEMPTED


@dataclass
class TrainLoop:
    """Configure once, ``run()`` to train.

    Args:
        state: initial (or restored) TrainState.
        train_step: jitted ``(state, batch, *extras) → (state, metrics)``.
        batcher: object with ``epoch(i) → iterator of numpy batch dicts``.
        num_epochs: total epochs (absolute — resume continues the count).
        checkpoints: optional CheckpointManager (full-state saves).
        eval_step: optional ``(params_or_state, batch, *extras) → metrics``.
        val_batcher: batcher for validation.
        epoch_extras: ``epoch → tuple`` of extra positional args for the
            step (e.g. the annealed KL weight, train_vae.py:378-382).
        eval_extras: same for eval (defaults to epoch_extras).
        val_metric_key: metric minimised for best-checkpoint tracking.
        place_batch: host training batch → device-placed batch (microbatch
            split and/or mesh placement); runs on the PREFETCH thread so
            collate+transfer overlap device compute. Default: ``jnp.asarray``
            per leaf. Validation batches always use the default placement
            (no microbatch split — eval steps take whole batches).
        prefetch: training batches staged ahead of the step (0 disables
            the prefetch thread).
    """

    state: TrainState
    train_step: Callable
    batcher: Any
    num_epochs: int
    checkpoints: Optional[CheckpointManager] = None
    metrics: Optional[MetricsWriter] = None
    eval_step: Optional[Callable] = None
    val_batcher: Optional[Any] = None
    epoch_extras: Optional[Callable[[int], tuple]] = None
    eval_extras: Optional[Callable[[int], tuple]] = None
    val_metric_key: str = "total"
    checkpoint_every: int = 5
    log_every_steps: int = 50
    start_epoch: int = 0
    uses_frozen_in_eval: bool = True
    place_batch: Optional[Callable] = None
    prefetch: int = 2

    # Preemption safety (new beyond the reference, whose resume loses
    # optimizer/RNG state — SURVEY.md §5): SIGTERM/SIGINT set a flag that
    # the step loop polls; the loop then writes a full-state checkpoint and
    # returns cleanly. Resume granularity is the epoch: the interrupted
    # epoch re-runs from its start, so its already-applied batches are seen
    # twice (optimizer/RNG state themselves restore exactly; only the data
    # order replays).
    handle_signals: bool = True

    history: list = field(default_factory=list)
    preempted: bool = field(default=False, init=False)

    def run(self) -> TrainState:
        global _PREEMPTED
        _PREEMPTED = False  # a past loop's preemption is not this one's
        state = self.state
        stop = threading.Event()
        old_handlers = {}
        if self.handle_signals and (
            threading.current_thread() is threading.main_thread()
        ):
            def _on_signal(signum, frame):
                logger.warning(
                    "received %s — will checkpoint and stop",
                    signal.Signals(signum).name,
                )
                stop.set()

            for sig in (signal.SIGTERM, signal.SIGINT):
                old_handlers[sig] = signal.signal(sig, _on_signal)
        try:
            return self._run(state, stop)
        finally:
            if self.checkpoints is not None:
                # Periodic saves are async; settle them before the caller
                # can exit or read the checkpoint directory.
                self.checkpoints.wait_until_finished()
            for sig, h in old_handlers.items():
                signal.signal(sig, h)

    def _preempt_save(self, state: TrainState) -> None:
        global _PREEMPTED
        _PREEMPTED = True
        self.preempted = True
        if self.checkpoints is None:
            return
        step = int(state.step)
        if self.checkpoints.latest_step() == step:
            # The periodic/best block (or a resume) already saved this exact
            # step; a second save would raise StepAlreadyExistsError.
            logger.info("step %d already checkpointed; clean stop", step)
            return
        try:
            # wait=True: the process exits right after this save.
            self.checkpoints.save(step, state, val_metric=None, wait=True)
        except Exception:  # noqa: BLE001 — a failed save must not mask exit
            logger.exception("preemption checkpoint failed at step %d", step)
            return
        logger.info(
            "preemption checkpoint written at step %d (epoch counter "
            "%d — the interrupted epoch re-runs on resume)",
            step, int(state.epoch),
        )

    def _train_batches(self, epoch: int):
        """Device-placed training batches, staged ``prefetch`` ahead on a
        background thread (collate + transfer overlap the step's compute)."""
        from iris_tts_tpu.data.batching import prefetch_to_device

        place = self.place_batch or (
            lambda b: {k: jnp.asarray(v) for k, v in b.items()}
        )
        if self.prefetch <= 0:
            return (place(b) for b in self.batcher.epoch(epoch))
        return prefetch_to_device(
            self.batcher.epoch(epoch), size=self.prefetch, place=place
        )

    def _run(self, state: TrainState, stop: threading.Event) -> TrainState:
        for epoch in range(self.start_epoch, self.num_epochs):
            extras = self.epoch_extras(epoch) if self.epoch_extras else ()
            extras = tuple(jnp.asarray(e) for e in extras)
            t0 = time.time()
            n_steps = 0
            sums = None  # device-side metric accumulation: no per-step sync
            for batch in self._train_batches(epoch):
                if stop.is_set():
                    self._preempt_save(state)
                    return state
                state, m = self.train_step(state, batch, *extras)
                n_steps += 1
                sums = (
                    m
                    if sums is None
                    else {k: sums[k] + m[k] for k in sums}
                )
                if (
                    self.metrics
                    and self.log_every_steps
                    and n_steps % self.log_every_steps == 0
                ):
                    self.metrics.write(
                        int(state.step), {k: float(v) for k, v in m.items()}
                    )
            train_means = (
                {k: float(v) / n_steps for k, v in sums.items()}
                if sums
                else {}
            )
            wall = time.time() - t0

            val_means: Dict[str, float] = {}
            if self.eval_step and self.val_batcher is not None:
                ev_extras = (
                    self.eval_extras(epoch)
                    if self.eval_extras
                    else extras
                )
                ev_extras = tuple(jnp.asarray(e) for e in ev_extras)
                vm = RunningMean()
                for batch in self.val_batcher.epoch(0):
                    batch = {k: jnp.asarray(v) for k, v in batch.items()}
                    if self.uses_frozen_in_eval and state.frozen is not None:
                        m = self.eval_step(
                            state.params, state.frozen, batch, *ev_extras
                        )
                    else:
                        m = self.eval_step(state.params, batch, *ev_extras)
                    vm.update({f"val_{k}": float(v) for k, v in m.items()})
                val_means = vm.means()

            logger.info(
                "epoch %d/%d (%.1fs, %d steps): train=%s val=%s",
                epoch + 1, self.num_epochs, wall, n_steps,
                {k: round(v, 5) for k, v in train_means.items()},
                {k: round(v, 5) for k, v in val_means.items()},
            )
            self.history.append({**train_means, **val_means, "epoch": epoch})
            if self.metrics:
                self.metrics.write(
                    int(state.step), {**train_means, **val_means}
                )

            state = state.replace(
                epoch=jnp.asarray(epoch + 1, jnp.int32)
            )
            if self.checkpoints is not None:
                val_key = f"val_{self.val_metric_key}"
                val_metric = val_means.get(
                    val_key, train_means.get(self.val_metric_key)
                )
                periodic = (
                    (self.checkpoint_every
                     and (epoch + 1) % self.checkpoint_every == 0)
                    or epoch + 1 == self.num_epochs
                )
                new_best = (
                    val_metric is not None
                    and val_metric < self.checkpoints.best_metric
                )
                if periodic or new_best:
                    is_best = self.checkpoints.save(
                        int(state.step), state, val_metric=val_metric,
                        epoch=epoch + 1,
                    )
                    if is_best:
                        logger.info(
                            "new best %s=%.5f", val_key, val_metric
                        )
            if stop.is_set():
                self._preempt_save(state)
                return state
        return state


def resume_if_available(
    ckpt: CheckpointManager, template: TrainState,
    steps_per_epoch: int = 0,
) -> tuple[TrainState, int]:
    """Restore the latest checkpoint if one exists; returns (state,
    start_epoch). Full-state resume (SURVEY.md §5 fix). The epoch comes
    from the checkpointed counter itself (``steps_per_epoch`` is unused and
    kept for call-site compatibility)."""
    del steps_per_epoch
    step = ckpt.latest_step()
    if step is None:
        return template, 0
    state = ckpt.restore(template)
    start_epoch = int(state.epoch)
    logger.info(
        "resumed from step %d (epoch %d)", int(state.step), start_epoch
    )
    return state, start_epoch
