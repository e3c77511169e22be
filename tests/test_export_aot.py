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
