"""Test bootstrap: force an 8-device CPU platform before JAX initialises.

This is the idiomatic JAX way to exercise multi-device sharding without real
hardware (SURVEY.md §4): every test sees 8 virtual CPU devices and can build
real `jax.sharding.Mesh`es over them. Benchmarks (bench.py) run on the real
TPU instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment may pre-import jax with JAX_PLATFORMS pinned to a hardware
# plugin (site customization), so an env-var override is too late here —
# force the CPU backend through the live config instead.
# IRIS_TEST_PLATFORM=native opts a run out of the pin (e.g. executing the
# convergence suite on the real chip for on-hardware evidence); anything
# else is used as the platform name (default cpu).
_plat = os.environ.get("IRIS_TEST_PLATFORM", "cpu")
import jax

if _plat != "native":
    os.environ["JAX_PLATFORMS"] = _plat
    jax.config.update("jax_platforms", _plat)
else:
    # Parity tests assert NUMERICS on the real chip. TPU backends may run
    # f32 dot-generals as single bf16 MXU passes at *default* precision
    # (~4e-3 relative error — observed to vary across PJRT backend
    # generations). ops/conv.py pins its own f32 precision; this covers
    # flax Dense/attention inside the acoustic models. bench.py measures
    # PERF and keeps the serving default (bf16 modules, native precision).
    jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the large unrolled conv graphs (GAN
# discriminators) take minutes to compile on CPU the first time; cached
# executables make repeat suite runs fast.
from pathlib import Path

_CACHE_DIR = Path(__file__).resolve().parent.parent / ".jax_cache_cpu"
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import sys
from pathlib import Path

# Make the repo root importable when pytest is run from anywhere.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1337)


@pytest.fixture(scope="session")
def pjrt_runner_bin():
    """The native PJRT host binary, built on demand (shared by
    test_pjrt_runner.py and the npy fuzz property test)."""
    import subprocess
    from pathlib import Path

    native = Path(__file__).resolve().parent.parent / "native"
    binary = native / "pjrt_runner"
    if not binary.exists():
        r = subprocess.run(
            ["make", "-C", str(native), "pjrt_runner"],
            capture_output=True, text=True, timeout=180,
        )
        if r.returncode != 0:
            pytest.skip(f"no C++ toolchain: {r.stderr[-300:]}")
    return binary
