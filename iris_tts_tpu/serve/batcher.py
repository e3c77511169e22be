"""Dynamic request batching for TPU serving.

TPU throughput comes from batched dispatch (one executable over [B, ...]),
but serving traffic arrives one utterance at a time. The batcher bridges
the two: requests queue from any number of frontend threads, a single
device thread drains the queue, groups compatible requests, and runs ONE
jitted dispatch per group on the pipeline's bucketed executables
(models/pipeline.py). A single device thread also respects the one-process
/ one-stream TPU model — no lock contention on the device.

Batching policy: take whatever is queued (up to ``max_batch``); if the
queue is empty and a request just arrived, wait up to ``max_wait_ms`` for
company before dispatching. Under load the wait never triggers (the queue
is always non-empty), so latency cost is bounded by one batch's compute.

New functionality beyond the reference (single-utterance CLI only,
reference scripts/synthesize.py:64-220).
"""

from __future__ import annotations

import collections
import logging
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class BatchItem:
    """One queued synthesis request."""

    text: str
    future: "Future[np.ndarray]"
    temperature: float = 1.0
    seed: Optional[int] = None
    enqueued_at: float = field(default_factory=time.monotonic)


class DynamicBatcher:
    """Groups queued requests and drives the pipeline on one device thread.

    Args:
        pipeline: a ready :class:`iris_tts_tpu.models.pipeline.TTSPipeline`.
        max_batch: largest group per dispatch (pad-to-bucket makes larger
            groups cheaper per utterance up to memory limits).
        max_wait_ms: how long a lone request waits for company.
    """

    def __init__(self, pipeline, max_batch: int = 8,
                 max_wait_ms: float = 5.0, gap_ms: float = 120.0):
        self._pipe = pipeline
        self._max_batch = max_batch
        self._max_wait_s = max_wait_ms / 1000.0
        self._gap_ms = gap_ms
        self._queue: "queue.Queue[Optional[BatchItem]]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._stopping = threading.Event()
        # stats (read without lock: single writer, monotonic counters)
        self.n_requests = 0
        self.n_batches = 0
        self.batch_size_hist: Dict[int, int] = {}
        self._latencies = collections.deque(maxlen=1024)  # seconds

    # -- frontend side ------------------------------------------------------

    def submit(self, text: str, temperature: float = 1.0,
               seed: Optional[int] = None) -> "Future[np.ndarray]":
        """Queue one utterance; resolves to a 1-D float32 waveform."""
        if self._stopping.is_set():
            raise RuntimeError("batcher is stopped")
        fut: "Future[np.ndarray]" = Future()
        self._queue.put(BatchItem(text, fut, temperature, seed))
        return fut

    def synthesize(self, text: str, timeout: Optional[float] = 60.0,
                   temperature: float = 1.0,
                   seed: Optional[int] = None) -> np.ndarray:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(text, temperature, seed).result(timeout=timeout)

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> "DynamicBatcher":
        if self._thread is not None:
            raise RuntimeError("batcher already started")
        self._thread = threading.Thread(
            target=self._run, name="tts-batcher", daemon=True
        )
        self._thread.start()
        return self

    def stop(self, timeout: float = 30.0) -> None:
        """Drain-stop: queued requests still complete."""
        if self._thread is None:
            return
        self._stopping.set()
        self._queue.put(None)  # wake the device thread
        self._thread.join(timeout=timeout)
        self._thread = None
        # Fail anything still queued after the drain window.
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item.future.set_exception(RuntimeError("server shutdown"))

    def __enter__(self) -> "DynamicBatcher":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- device thread ------------------------------------------------------

    def _collect(self) -> List[BatchItem]:
        """Block for the first request, then take whatever else is queued
        (waiting up to max_wait for company if alone)."""
        items: List[BatchItem] = []
        while True:
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                if self._stopping.is_set():
                    return items
                continue
            if first is None:  # shutdown sentinel
                return items
            items.append(first)
            break
        deadline = time.monotonic() + self._max_wait_s
        while len(items) < self._max_batch:
            remaining = deadline - time.monotonic()
            try:
                nxt = self._queue.get(
                    timeout=max(remaining, 0.0) if remaining > 0 else None
                ) if remaining > 0 else self._queue.get_nowait()
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)  # keep the sentinel for the outer loop
                break
            items.append(nxt)
        return items

    def _run(self) -> None:
        while not (self._stopping.is_set() and self._queue.empty()):
            items = self._collect()
            if not items:
                continue
            # Same-temperature groups share one dispatch (temperature is a
            # traced scalar but batching mixes it per-row only if the model
            # supported per-row temps; it doesn't, so group by value).
            by_temp: Dict[float, List[BatchItem]] = {}
            for it in items:
                by_temp.setdefault(it.temperature, []).append(it)
            for temp, group in by_temp.items():
                self._dispatch(group, temp)

    def _dispatch(self, group: List[BatchItem], temperature: float) -> None:
        # Long inputs chunk at sentence boundaries (same policy as
        # TTSPipeline.synthesize_long) and the chunks of EVERY request in
        # the group ride one batched dispatch; each request's chunks are
        # re-joined with the silence gap afterwards. Short requests pass
        # through 1:1.
        cap = self._pipe.phoneme_buckets[-1]
        flat: List[str] = []
        per_item_chunks: List[int] = []
        for it in group:
            chunks = self._pipe._chunk_long_text(it.text, cap) or [""]
            per_item_chunks.append(len(chunks))
            flat.extend(chunks)
        seed = next((it.seed for it in group if it.seed is not None), None)
        try:
            outs = self._pipe.synthesize(
                flat, temperature=temperature, seed=seed, fused=False
            )
        except Exception as e:  # noqa: BLE001 — deliver to every waiter
            for it in group:
                it.future.set_exception(e)
            logger.exception("batch of %d failed", len(group))
            return
        self.n_requests += len(group)
        self.n_batches += 1
        self.batch_size_hist[len(flat)] = (
            self.batch_size_hist.get(len(flat), 0) + 1
        )
        gap = np.zeros(
            int(round(self._gap_ms / 1000.0
                      * self._pipe.config.audio.sample_rate)),
            np.float32,
        )
        now = time.monotonic()
        pos = 0
        for gi, it in enumerate(group):
            n = per_item_chunks[gi]
            parts = outs[pos:pos + n]
            pos += n
            joined = (
                parts[0] if n == 1
                else np.concatenate(
                    [p for pair in zip(parts, [gap] * n) for p in pair][:-1]
                )
            )
            self._latencies.append(now - it.enqueued_at)
            it.future.set_result(joined)

    # -- observability ------------------------------------------------------

    def stats(self) -> Dict:
        lats = sorted(self._latencies)
        def pct(p):
            return (
                round(1000 * lats[min(len(lats) - 1,
                                      int(p * len(lats)))], 2)
                if lats else None
            )
        return {
            "requests": self.n_requests,
            "batches": self.n_batches,
            "mean_batch_size": (
                self.n_requests / self.n_batches if self.n_batches else 0.0
            ),
            "batch_size_hist": dict(sorted(self.batch_size_hist.items())),
            "latency_ms": {"p50": pct(0.50), "p95": pct(0.95),
                           "max": pct(1.0)},
        }
