"""Native PJRT serving host (native/pjrt_runner.cpp).

The .npy IO contract and plugin probing are testable anywhere; actual
StableHLO execution needs a PJRT plugin with claimable hardware, so the
end-to-end test is gated behind IRIS_TEST_PLATFORM=native (the real-chip
switch used across this suite).
"""

import json
import os
import subprocess
from pathlib import Path

import numpy as np
import pytest

NATIVE = Path(__file__).resolve().parent.parent / "native"
RUNNER = NATIVE / "pjrt_runner"
LIBTPU = Path(
    "/opt/venv/lib/python3.12/site-packages/libtpu/libtpu.so"
)


@pytest.fixture(scope="module")
def runner(pjrt_runner_bin):
    return pjrt_runner_bin


@pytest.mark.parametrize(
    "arr",
    [
        np.arange(12, dtype=np.float32).reshape(3, 4),
        np.array(7, dtype=np.int32),
        np.arange(5, dtype=np.int16),
        np.arange(8, dtype=np.int64).reshape(2, 2, 2),
        (np.random.default_rng(0).standard_normal(640) * 100).astype(
            np.float32
        ).reshape(1, 640),
    ],
    ids=["f32_2d", "i32_scalar", "i16_1d", "i64_3d", "f32_audio_row"],
)
def test_npy_roundtrip(runner, tmp_path, arr):
    """The C++ npy reader/writer agrees with numpy bit-for-bit (dtype,
    shape incl. rank 0/1/3, payload)."""
    src = tmp_path / "in.npy"
    dst = tmp_path / "out.npy"
    np.save(src, arr)
    r = subprocess.run(
        [str(runner), "--npy-roundtrip", str(src), str(dst)],
        capture_output=True, text=True, timeout=30,
    )
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout)["bytes"] == arr.nbytes
    back = np.load(dst)
    assert back.dtype == arr.dtype and back.shape == arr.shape
    np.testing.assert_array_equal(back, arr)


def test_probe_plugin(runner):
    """dlopen + GetPjrtApi against a real plugin .so (no device claim)."""
    if not LIBTPU.exists():
        pytest.skip("no libtpu.so in this environment")
    r = subprocess.run(
        [str(runner), "--probe", "--plugin", str(LIBTPU)],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    major, minor = out["api_version"].split(".")
    assert int(major) == 0 and int(minor) > 0


def test_bad_flags(runner):
    r = subprocess.run([str(runner), "--module", "x"], capture_output=True,
                       text=True, timeout=30)
    assert r.returncode != 0
    assert "--plugin is required" in r.stderr


@pytest.mark.skipif(
    os.environ.get("IRIS_TEST_PLATFORM") != "native",
    reason="needs a claimable PJRT device (IRIS_TEST_PLATFORM=native)",
)
def test_execute_artifact_on_device(runner, tmp_path):
    """Full native serving: export → C++ host compiles + executes the raw
    StableHLO on the tunneled chip → audio matches the Python path."""
    import uuid

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        ["python", str(repo / "scripts/export_serving.py"),
         "--random_weights", "--output", str(tmp_path / "aot"),
         "--batch_sizes", "1", "--phoneme_buckets", "32",
         "--platforms", "tpu"],
        env=env, capture_output=True, text=True, timeout=900, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-800:]
    manifest = json.loads((tmp_path / "aot/manifest.json").read_text())
    entry = manifest["entries"][0]

    ids = np.zeros((1, 32), np.int32)
    ids[0, :5] = [4, 9, 12, 9, 4]
    lengths = np.array([5], np.int32)
    np.save(tmp_path / "ids.npy", ids)
    np.save(tmp_path / "lengths.npy", lengths)
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    r = subprocess.run(
        [str(runner), "--plugin", "/opt/axon/libaxon_pjrt.so",
         "--option", f"topology=s:{gen}:1x1x1",
         "--option", f"session_id=s:{uuid.uuid4()}",
         "--option", "remote_compile=b:"
         + ("1" if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
            else "0"),
         "--module", str(tmp_path / "aot" / entry["mlir_file"]),
         "--compile-options", str(tmp_path / "aot/compile_options.pb"),
         "--arg", str(tmp_path / "ids.npy"),
         "--arg", str(tmp_path / "lengths.npy"),
         "--arg", "i32:0", "--arg", "f32:1.0",
         "--iters", "2", "--out-prefix", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    stats = json.loads(r.stdout)
    assert stats["num_outputs"] == 4
    audio = np.load(tmp_path / "out_0.npy")
    assert audio.shape[0] == 1 and np.isfinite(audio).all()
    assert np.abs(audio).max() > 0
