"""Profiling + numerical-guard utilities.

The reference has no tracing/profiling and hand-rolls NaN checks in a debug
script (SURVEY.md §5). Here: ``jax.profiler`` trace hooks, a step timer, and
jit-safe NaN/Inf guards built on ``jax.debug`` (usable inside compiled
training steps — the checkify-style guard the reference lacked).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str | Path) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/Perfetto:
    ``with trace('/tmp/trace'): run_step()``."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup discard (compile excluded)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._seen = 0
        self._total = 0.0
        self._count = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self._total += dt
            self._count += 1
        return False

    @property
    def mean_s(self) -> float:
        return self._total / max(1, self._count)


def guard_finite(name: str, x: jnp.ndarray) -> jnp.ndarray:
    """Inside-jit NaN/Inf tripwire: prints a warning from the device when
    the array goes non-finite (replaces the reference's host-side forensic
    script debug_vae_loss.py:145-146). Identity on the value."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.debug.callback(
        lambda b, n=name: print(f"[guard_finite] {n}: non-finite values!")
        if bool(b)
        else None,
        bad,
    )
    return x


def tree_finite(tree) -> bool:
    """Host-side: True iff every leaf of a pytree is finite."""
    leaves = jax.tree_util.tree_leaves(tree)
    return all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)


def grad_norm(tree) -> float:
    """Global L2 norm of a gradient pytree (host-side diagnostic)."""
    leaves = jax.tree_util.tree_leaves(tree)
    total = sum(float(jnp.sum(jnp.square(x))) for x in leaves)
    return total**0.5


def profile_stats(metrics: Dict[str, float], step_time_s: float,
                  tokens_or_frames: int) -> Dict[str, float]:
    """Standard per-step perf scalars for MetricsWriter."""
    out = dict(metrics)
    out["step_time_s"] = step_time_s
    out["frames_per_sec"] = tokens_or_frames / max(step_time_s, 1e-9)
    return out
