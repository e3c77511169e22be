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


# ---------------------------------------------------------------------------
# Artifact serving host (VERDICT r3 item 2): request-loop contract, CPU-
# testable via --dry-run (tokenize + bucket pick, no plugin), full device
# path under IRIS_TEST_PLATFORM=native below.
# ---------------------------------------------------------------------------

REPO = Path(__file__).resolve().parent.parent
LEXICON = REPO / "iris_tts_tpu" / "text" / "data" / "cmu_dict.txt"


@pytest.fixture(scope="module")
def aot_artifact(tmp_path_factory):
    """Tiny CPU-platform artifact (random weights, 2 phoneme buckets)."""
    out = tmp_path_factory.mktemp("aot") / "artifact"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        ["python", str(REPO / "scripts/export_serving.py"),
         "--random_weights", "--output", str(out),
         "--batch_sizes", "1", "--phoneme_buckets", "16", "32",
         "--platforms", "cpu"],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-800:]
    return out


def _drive_artifact_host(runner, artifact, requests, extra_flags=()):
    """Run the host over a fixed request list; returns (ready, replies)."""
    proc = subprocess.run(
        [str(runner), "--artifact", str(artifact), "--dry-run",
         "--lexicon", str(LEXICON), *extra_flags],
        input="".join(r + "\n" for r in requests),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    return lines[0], lines[1:]


def test_artifact_host_request_loop_dry_run(runner, aot_artifact, tmp_path):
    ready, replies = _drive_artifact_host(
        runner, aot_artifact,
        [f"synth\t{tmp_path}/a\t0\t1.0\thello world",
         f"ids\t{tmp_path}/b\t3\t0.8\t4,9,12,9",
         # a longer sentence must land in the bigger bucket
         f"synth\t{tmp_path}/c\t0\t1.0\t"
         "the quick brown fox jumps over the dog",
         # hostile: empty text → single <UNK>, server stays up
         f"synth\t{tmp_path}/d\t0\t1.0\t",
         "badverb\tx\t0\t1\ty",
         "toofewfields",
         f"ids\t{tmp_path}/e\t0\t1.0\tnot,numbers"],
    )
    assert ready["ready"] is True
    assert ready["buckets"] == [[1, 16], [1, 32]]
    assert ready["lexicon_words"] > 100000
    assert ready["vocab"] == 41
    assert replies[0]["bucket"] == [1, 16] and replies[0]["n_ids"] == 8
    assert replies[1]["ids"] == [4, 9, 12, 9]
    assert replies[2]["bucket"] == [1, 32]
    assert replies[3]["n_ids"] == 1  # <UNK>
    assert "error" in replies[4]
    assert "error" in replies[5]
    assert "error" in replies[6]
    # one reply per request, server never died
    assert len(replies) == 7


def test_artifact_host_tokenizer_matches_python_frontend(
    runner, aot_artifact, tmp_path
):
    """The C++ lexicon tokenizer must agree with the Python frontend on
    lexicon words (the ids feed the SAME executables the Python server
    uses — divergence = different speech)."""
    from iris_tts_tpu.text import PhonemeVocab, create_text_processor

    text = "the quick brown fox jumped over a lazy dog"
    vocab = PhonemeVocab.load(aot_artifact / "vocab.json")
    tp = create_text_processor(use_g2p=False)
    want = tp.text_to_ids(text, vocab).tolist()
    _, replies = _drive_artifact_host(
        runner, aot_artifact, [f"synth\t{tmp_path}/x\t0\t1.0\t{text}"]
    )
    assert replies[0]["ids"] == want


def test_artifact_host_rejects_bad_artifacts(runner, tmp_path):
    # missing manifest
    r = subprocess.run(
        [str(runner), "--artifact", str(tmp_path), "--dry-run"],
        capture_output=True, text=True, timeout=30,
    )
    assert r.returncode != 0 and "cannot open" in r.stderr
    # wrong format_version must refuse with a re-export message
    (tmp_path / "manifest.json").write_text(json.dumps({
        "format_version": 1, "sample_rate": 22050,
        "samples_per_frame": 256, "entries": [],
    }))
    r = subprocess.run(
        [str(runner), "--artifact", str(tmp_path), "--dry-run"],
        capture_output=True, text=True, timeout=30,
    )
    assert r.returncode != 0 and "re-export" in r.stderr


def test_artifact_host_oversized_request_is_an_error_not_a_crash(
    runner, aot_artifact, tmp_path
):
    long_text = " ".join(["hello"] * 40)  # 120 ids > largest bucket (32)
    _, replies = _drive_artifact_host(
        runner, aot_artifact,
        [f"synth\t{tmp_path}/z\t0\t1.0\t{long_text}",
         f"synth\t{tmp_path}/ok\t0\t1.0\thi"],
    )
    assert "error" in replies[0] and "bucket" in replies[0]["error"]
    assert replies[1]["n_ids"] >= 1  # server survived


@pytest.mark.skipif(
    os.environ.get("IRIS_TEST_PLATFORM") != "native",
    reason="needs a claimable PJRT device (IRIS_TEST_PLATFORM=native)",
)
def test_artifact_host_serves_text_on_device(runner, tmp_path):
    """Full native serving on the real chip: export (tpu platform) → C++
    host compiles ALL buckets, serves text requests, writes real WAVs.
    Promotion of the old single-module env-gated test (VERDICT r3 item 2)."""
    import uuid
    import wave

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = tmp_path / "aot"
    r = subprocess.run(
        ["python", str(REPO / "scripts/export_serving.py"),
         "--random_weights", "--output", str(out),
         "--batch_sizes", "1", "--phoneme_buckets", "16", "32",
         "--platforms", "tpu"],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-800:]
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    requests = [
        f"synth\t{tmp_path}/req1\t0\t1.0\thello world",
        f"synth\t{tmp_path}/req2\t7\t0.8\tthe quick brown fox jumps "
        "over the dog",
        f"ids\t{tmp_path}/req3\t0\t1.0\t4,9,12,9",
    ]
    proc = subprocess.run(
        [str(runner), "--plugin", "/opt/axon/libaxon_pjrt.so",
         "--option", f"topology=s:{gen}:1x1x1",
         "--option", f"session_id=s:{uuid.uuid4()}",
         "--option", "remote_compile=b:"
         + ("1" if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
            else "0"),
         "--artifact", str(out), "--lexicon", str(LEXICON), "--npy"],
        input="".join(r_ + "\n" for r_ in requests),
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    ready, replies = lines[0], lines[1:]
    assert ready["ready"] and len(ready["buckets"]) == 2
    assert len(replies) == 3
    for rep, base in zip(replies, ["req1", "req2", "req3"]):
        assert "error" not in rep, rep
        assert rep["n_frames"] > 0
        with wave.open(str(tmp_path / f"{base}.wav")) as w:
            assert w.getframerate() == 22050
            assert w.getnframes() == rep["n_frames"] * 256 or \
                w.getnframes() == int(rep["audio_s"] * 22050)
    # bucket routing: short → 16, long → 32
    assert replies[0]["bucket"] == [1, 16]
    assert replies[1]["bucket"] == [1, 32]
    audio = np.load(tmp_path / "req1_audio.npy")
    assert np.isfinite(audio).all() and np.abs(audio).max() > 0
