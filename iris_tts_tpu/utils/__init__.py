"""Utilities: metrics, profiling, numerical guards."""

from iris_tts_tpu.utils.metrics import (
    MetricsWriter,
    RunningMean,
    SynthesisMeter,
)
from iris_tts_tpu.utils.prof import (
    StepTimer,
    grad_norm,
    guard_finite,
    profile_stats,
    trace,
    tree_finite,
)

__all__ = [
    "MetricsWriter",
    "RunningMean",
    "SynthesisMeter",
    "StepTimer",
    "grad_norm",
    "guard_finite",
    "profile_stats",
    "trace",
    "tree_finite",
]
