"""AOT StableHLO serving artifacts: export → deserialize → synthesize."""

import json

import numpy as np
import pytest

from iris_tts_tpu.serve.export import ExportedSynthesizer, export_pipeline
from tests.test_pipeline import _small_config


@pytest.fixture(scope="module")
def pipeline():
    from iris_tts_tpu.models import TTSPipeline

    pipe = TTSPipeline.initialize(_small_config(), seed=0)
    pipe.phoneme_buckets = (16, 32)
    pipe.frame_buckets = (32, 64, 128, 256, 512)
    return pipe


@pytest.fixture(scope="module")
def artifact_dir(pipeline, tmp_path_factory):
    out = tmp_path_factory.mktemp("aot")
    export_pipeline(pipeline, out, batch_sizes=(1,),
                    phoneme_buckets=(16, 32))
    return out


def test_export_writes_artifacts(artifact_dir):
    manifest = json.loads((artifact_dir / "manifest.json").read_text())
    assert manifest["sample_rate"] == 22050
    files = {e["file"] for e in manifest["entries"]}
    assert files == {"synth_b1_p16.shlo", "synth_b1_p32.shlo"}
    for f in files:
        assert (artifact_dir / f).stat().st_size > 1000
    assert (artifact_dir / "vocab.json").exists()


def test_exported_matches_pipeline(pipeline, artifact_dir):
    """The deserialized executable reproduces the live fused path exactly
    (same params, same seed). The artifact bakes the BUCKET's frame budget
    (here 256) while the live path picks the length-based one (128) — the
    outputs still match because jax's counter-based PRNG makes prefix
    noise shape-stable, so the trimmed real frames are identical whenever
    no duration compression triggers (see serve/export.py docstring)."""
    synth = ExportedSynthesizer(artifact_dir,
                                text_processor=pipeline.text_processor)
    got = synth.synthesize("hello world", seed=5)
    want = pipeline.synthesize("hello world", seed=5, fused=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_exported_bucket_overflow_raises(pipeline, artifact_dir):
    synth = ExportedSynthesizer(artifact_dir,
                                text_processor=pipeline.text_processor)
    with pytest.raises(ValueError, match="exceeds every exported bucket"):
        synth.synthesize("word " * 40)


def test_export_cli(pipeline, tmp_path):
    """scripts/export_serving.py end to end (subprocess, CPU)."""
    import subprocess
    import sys
    from pathlib import Path

    from iris_tts_tpu.config import save_config

    repo = Path(__file__).resolve().parent.parent
    save_config(pipeline.config, tmp_path / "cfg.json")
    env = {"PYTHONPATH": str(repo), "PATH": "/usr/bin:/bin:/usr/local/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root"}
    r = subprocess.run(
        [sys.executable, str(repo / "scripts/export_serving.py"),
         "--random_weights", "--config", str(tmp_path / "cfg.json"),
         "--output", str(tmp_path / "aot"),
         "--batch_sizes", "1", "--phoneme_buckets", "16"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "aot" / "synth_b1_p16.shlo").exists()
    synth = ExportedSynthesizer(tmp_path / "aot")
    audio = synth.synthesize("hi", seed=1)
    assert audio.ndim == 1 and np.isfinite(audio).all()


def test_exported_temperature_input(pipeline, artifact_dir):
    """Temperature is a traced input of the artifact (v2 contract): 0.0
    and 1.0 give different audio, and 1.0 matches the live default."""
    synth = ExportedSynthesizer(artifact_dir,
                                text_processor=pipeline.text_processor)
    hot = synth.synthesize("hello world", seed=5, temperature=1.0)
    cold = synth.synthesize("hello world", seed=5, temperature=0.0)
    assert hot.shape == cold.shape
    assert not np.allclose(hot, cold)
    want_cold = pipeline.synthesize(
        "hello world", seed=5, temperature=0.0, fused=True
    )
    np.testing.assert_allclose(cold, want_cold, atol=1e-6, rtol=1e-6)


@pytest.fixture(scope="module")
def aot_dir_batched(pipeline, tmp_path_factory):
    out = tmp_path_factory.mktemp("aot_batched")
    export_pipeline(pipeline, out, batch_sizes=(1, 4),
                    phoneme_buckets=(16, 32))
    return out


def test_aot_pipeline_matches_live(pipeline, aot_dir_batched):
    """AotPipeline reproduces the live fused path for single and batched
    calls (same params baked in, same seeds)."""
    from iris_tts_tpu.serve import AotPipeline

    aot = AotPipeline(aot_dir_batched,
                      text_processor=pipeline.text_processor)
    got = aot.synthesize("hello world", seed=5)
    want = pipeline.synthesize("hello world", seed=5, fused=True)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)

    texts = ["first utterance", "the second one", "third"]
    got_b = aot.synthesize(texts, seed=9)
    want_b = pipeline.synthesize(texts, seed=9, fused=True)
    assert len(got_b) == 3
    for a, b in zip(got_b, want_b):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)


def test_aot_pipeline_behind_full_serving_stack(pipeline, aot_dir_batched):
    """The COMPLETE serving stack (TTSServer → DynamicBatcher) over AOT
    artifacts: wav endpoint, streaming endpoint, stats — no Python model
    code compiled (VERDICT r2 item 1)."""
    import http.client
    import io
    import json as _json
    import wave

    from iris_tts_tpu.serve import AotPipeline, TTSServer

    aot = AotPipeline(aot_dir_batched,
                      text_processor=pipeline.text_processor)
    aot.warmup()
    srv = TTSServer(aot, host="127.0.0.1", port=0, max_batch=4,
                    max_wait_ms=1.0)
    srv.start()
    try:
        host, port = srv.address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=300)
        conn.request("POST", "/synthesize",
                     body=_json.dumps({"text": "hello world", "seed": 5}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        body = resp.read()
        with wave.open(io.BytesIO(body)) as w:
            assert w.getframerate() == 22050
            assert w.getnframes() > 0
        # Streamed request works over AOT too.
        conn.request("POST", "/synthesize_stream",
                     body=_json.dumps({"text": "hello. world."}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        pcm = resp.read()
        assert len(pcm) > 0 and len(pcm) % 2 == 0
        conn.close()
        stats = srv.batcher.stats()
        assert stats["requests"] >= 2 and stats["healthy"]
    finally:
        srv.stop()


def test_serve_cli_aot_boot(pipeline, tmp_path):
    """scripts/serve.py --aot boots, serves one request, and shuts down
    (subprocess, CPU)."""
    import socket
    import subprocess
    import sys
    import time
    import urllib.request
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    export_pipeline(pipeline, tmp_path / "aot", batch_sizes=(1, 2),
                    phoneme_buckets=(16,))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {"PYTHONPATH": str(repo), "PATH": "/usr/bin:/bin:/usr/local/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root"}
    proc = subprocess.Popen(
        [sys.executable, str(repo / "scripts/serve.py"),
         "--aot", str(tmp_path / "aot"), "--host", "127.0.0.1",
         "--port", str(port), "--max_batch", "8"],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True,
    )
    try:
        deadline = time.monotonic() + 300
        last_err = None
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"server died: {proc.stderr.read()[-2000:]}"
                )
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5
                ) as r:
                    if r.status == 200:
                        break
            except Exception as e:  # noqa: BLE001
                last_err = e
                time.sleep(0.5)
        else:
            raise AssertionError(f"server never became healthy: {last_err}")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=b'{"text": "hello"}',
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            assert r.read(4) == b"RIFF"
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_progressive_warmup(pipeline, aot_dir_batched):
    """warmup(block=False) returns after the smallest bucket compiles;
    the remaining buckets warm on a daemon thread, and synthesis through
    any bucket works throughout."""
    import time

    from iris_tts_tpu.serve import AotPipeline

    aot = AotPipeline(aot_dir_batched,
                      text_processor=pipeline.text_processor)
    aot.warmup(block=False)
    # Immediately serviceable (smallest bucket is warm; others compile
    # inline if a request beats the background thread to them).
    out = aot.synthesize("hello world", seed=3)
    assert out.size > 0 and np.isfinite(out).all()
    deadline = time.time() + 60
    while not aot.warm_all_done() and time.time() < deadline:
        time.sleep(0.05)
    assert aot.warm_all_done()
    # blocking warmup on a fresh instance: done synchronously
    aot2 = AotPipeline(aot_dir_batched,
                       text_processor=pipeline.text_processor)
    aot2.warmup(block=True)
    assert aot2.warm_all_done()


def test_warmup_async_constructor_overlap(aot_dir_batched):
    """warmup_async=True starts ALL backend compiles on the warmup thread
    from inside the constructor and builds the text frontend while they
    run (the cold-start overlap, VERDICT r3 item 9); the pipeline is
    immediately usable and converges to fully warm."""
    import time

    from iris_tts_tpu.serve import AotPipeline

    aot = AotPipeline(aot_dir_batched, warmup_async=True)
    assert aot.text_processor is not None  # built after the kick-off
    out = aot.synthesize("hello world", seed=3)
    assert out.size > 0 and np.isfinite(out).all()
    deadline = time.time() + 120
    while not aot.warm_all_done() and time.time() < deadline:
        time.sleep(0.05)
    assert aot.warm_all_done()


@pytest.fixture(scope="module")
def aot_dir_vocwin(pipeline, tmp_path_factory):
    out = tmp_path_factory.mktemp("aot_vocwin")
    export_pipeline(pipeline, out, batch_sizes=(1,), phoneme_buckets=(16,),
                    vocode_chunk_frames=16)
    return out


def test_aot_vocode_streaming_matches_live(pipeline, aot_dir_vocwin):
    """The exported window executable reproduces the live streaming
    vocoder exactly: chunks concatenate to the full vocoder pass."""
    from iris_tts_tpu.serve import AotPipeline

    manifest = json.loads((aot_dir_vocwin / "manifest.json").read_text())
    vw = manifest["vocode_window"]
    assert vw["chunk_frames"] == 16
    assert (aot_dir_vocwin / vw["file"]).stat().st_size > 1000

    aot = AotPipeline(aot_dir_vocwin,
                      text_processor=pipeline.text_processor)
    aot.warmup()  # includes the vocwin executable
    assert aot.warm_all_done()
    rng = np.random.default_rng(3)
    mel = rng.normal(
        -3.0, 2.0,
        size=(70, pipeline.config.hifigan.in_channels),
    ).astype(np.float32)
    got = np.concatenate(list(aot.vocode_streaming(mel)))
    from tests.corpus_utils import assert_audio_equal

    assert_audio_equal(got, pipeline.vocode(mel))
    # PCM16 variant quantizes the same samples.
    pcm = np.concatenate(list(aot.vocode_streaming(mel, pcm16=True)))
    assert pcm.dtype == np.int16
    assert_audio_equal(
        pcm,
        (np.clip(got, -1.0, 1.0) * 32767.0).astype(np.int16),
    )


def test_aot_vocode_streaming_guards(pipeline, aot_dir_vocwin,
                                     aot_dir_batched):
    from iris_tts_tpu.serve import AotPipeline

    aot = AotPipeline(aot_dir_vocwin,
                      text_processor=pipeline.text_processor)
    short = np.zeros((10, pipeline.config.hifigan.in_channels), np.float32)
    with pytest.raises(ValueError, match="frames <= the exported window"):
        list(aot.vocode_streaming(short))

    no_win = AotPipeline(aot_dir_batched,
                         text_processor=pipeline.text_processor)
    with pytest.raises(RuntimeError, match="without a streaming-vocoder"):
        list(no_win.vocode_streaming(np.zeros((100, 80), np.float32)))
