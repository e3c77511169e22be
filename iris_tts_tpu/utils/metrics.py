"""Scalar metrics logging: CSV writer + running meters + RTF meters.

The reference has only tqdm postfix losses and log lines (SURVEY.md §5
"Metrics / logging"); this adds a persistent scalar record per run (CSV —
greppable, plottable, no TensorBoard dependency) and the north-star
synthesis meters (RTF, mel-frames/sec — BASELINE.md).
"""

from __future__ import annotations

import csv
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional


class MetricsWriter:
    """Append-only CSV of (step, name, value) scalars."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._new = not self.path.exists()
        self._fh = open(self.path, "a", newline="")
        self._writer = csv.writer(self._fh)
        if self._new:
            self._writer.writerow(["step", "name", "value", "wall_time"])

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        now = time.time()
        for name, value in scalars.items():
            self._writer.writerow([step, name, float(value), now])
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()


class RunningMean:
    """Streaming means for per-epoch loss aggregation."""

    def __init__(self):
        self._sums: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    def update(self, scalars: Dict[str, float]) -> None:
        for k, v in scalars.items():
            self._sums[k] += float(v)
            self._counts[k] += 1

    def means(self) -> Dict[str, float]:
        return {k: self._sums[k] / self._counts[k] for k in self._sums}

    def reset(self) -> None:
        self._sums.clear()
        self._counts.clear()


class SynthesisMeter:
    """North-star serving metrics: RTF, mel-frames/sec, per-utterance
    latency percentiles (BASELINE.md)."""

    def __init__(self, sample_rate: int = 22050, hop_length: int = 256):
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self.latencies: list[float] = []
        self.audio_seconds = 0.0
        self.frames = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.time()

    def stop(self, n_samples: int) -> float:
        dt = time.time() - self._t0
        self.latencies.append(dt)
        self.audio_seconds += n_samples / self.sample_rate
        self.frames += n_samples // self.hop_length
        return dt

    def summary(self) -> Dict[str, float]:
        total = sum(self.latencies) or 1e-9
        lat = sorted(self.latencies)

        def pct(p):
            return lat[min(len(lat) - 1, int(p * len(lat)))] if lat else 0.0

        return {
            "rtf": self.audio_seconds / total,
            "mel_frames_per_sec": self.frames / total,
            "p50_latency_s": pct(0.50),
            "p90_latency_s": pct(0.90),
            "audio_seconds": self.audio_seconds,
            "wall_seconds": total,
        }
