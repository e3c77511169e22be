"""CLI driver smoke tests: each script runs as a real subprocess."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

SMALL_CFG = {
    "encoder": {"vocab_size": 41, "embed_dim": 16, "num_blocks": 1,
                "num_heads": 2},
    "duration": {"hidden_dim": 8, "num_layers": 1},
    "vae": {"n_mels": 16, "cond_dim": 16, "model_channels": 8,
            "latent_dim": 4, "num_wavenet_blocks": 1, "decoder_blocks": 1,
            "flow_layers": 1, "flow_hidden": 8},
    "postnet": {"n_mels": 16, "num_layers": 2, "channels": 8},
    "hifigan": {"in_channels": 16, "upsample_rates": [4, 2],
                "upsample_kernel_sizes": [8, 4],
                "upsample_initial_channel": 16,
                "resblock_kernel_sizes": [3],
                "resblock_dilations": [[1]]},
}


def _run(args, timeout=420, extra_env=None):
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root",
           # Share the persistent compile cache with conftest so subprocess
           # tests don't recompile the big graphs every suite run.
           "JAX_COMPILATION_CACHE_DIR": str(REPO / ".jax_cache_cpu"),
           "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "5"}
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture
def small_cfg_file(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(SMALL_CFG))
    return p


def test_synthesize_cli_random_weights(small_cfg_file, tmp_path):
    out = tmp_path / "out.wav"
    r = _run([
        "scripts/synthesize.py", "--random_weights",
        "--config", str(small_cfg_file),
        "--text", "hello world",
        "--output_wav", str(out),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 100

    from iris_tts_tpu.data.audio_io import read_wav

    audio, sr = read_wav(out)
    assert sr == 22050 and len(audio) > 0


def test_encoder_setup_cli(small_cfg_file):
    r = _run(["scripts/test_encoder_setup.py", "--config",
              str(small_cfg_file)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SETUP OK" in r.stdout


def test_vae_setup_cli(small_cfg_file):
    r = _run(["scripts/test_vae_setup.py", "--config", str(small_cfg_file)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SETUP OK" in r.stdout
    assert "flow invertibility" in r.stdout


def test_hifigan_integration_cli():
    r = _run(["test_hifigan_integration.py"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ALL CHECKS PASSED" in r.stdout


def test_demo_text_processing_cli():
    r = _run(["demo_text_processing.py", "--text", "Dr. Who saw 3 cats."])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "doctor who saw three cats." in r.stdout


def test_train_encoder_cli_end_to_end_with_resume(small_cfg_file, tmp_path):
    """Full CLI training path: corpus on disk → 2 epochs → checkpoints →
    resume continues from the saved step."""
    from tests.corpus_utils import build_mini_corpus

    root, align = build_mini_corpus(tmp_path, n=8)
    out = tmp_path / "outputs"
    args = [
        "scripts/train_encoder.py",
        "--config", str(small_cfg_file),
        "--data_root", str(root),
        "--alignment_dir", str(align),
        "--cache_dir", str(tmp_path / "cache"),
        "--output_dir", str(out),
        "--batch_size", "4",
        "--num_epochs", "2",
    ]
    r = _run(args)
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt_dir = out / "encoder" / "checkpoints"
    assert ckpt_dir.exists()
    assert (out / "encoder" / "config_encoder.json").exists()
    assert (out / "encoder" / "metrics.csv").exists()

    # Resume: bump epochs, rerun — must log a resume and finish.
    args[args.index("--num_epochs") + 1] = "3"
    r2 = _run(args)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed from step" in (r2.stderr + r2.stdout)


def test_bench_batch_sweep_cli(small_cfg_file):
    """bench_batch_sweep emits one JSON line per batch point with the
    marginal scaling efficiency filled in from the second point on."""
    r = _run([
        "scripts/bench_batch_sweep.py", "--config", str(small_cfg_file),
        "--batches", "1,2", "--phonemes", "8", "--frames", "32",
        "--iters", "2",
    ], timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(l) for l in r.stdout.splitlines() if l.strip()]
    assert [row["batch"] for row in rows] == [1, 2]
    assert all(row["metric"] == "synthesis_batch_sweep" for row in rows)
    assert all(row["mel_frames_per_sec"] > 0 for row in rows)
    assert rows[0]["marginal_scaling_eff"] is None
    assert rows[1]["marginal_scaling_eff"] is not None


def test_bench_train_cli_shape():
    """bench_train emits exactly one JSON line on stdout (tiny shapes)."""
    r = _run([
        "scripts/bench_train.py", "--batch_size", "2", "--frames", "32",
        "--phonemes", "8", "--iters", "2",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["metric"] == "vae_train_mel_frames_per_sec"
    assert payload["value"] > 0


def test_train_hifigan_cli_end_to_end_with_resume(tmp_path):
    """GAN fine-tune CLI: corpus → 1 epoch (EMA on) → checkpoints for BOTH
    sides → rerun resumes from the shared step instead of restarting."""
    from tests.corpus_utils import build_mini_corpus

    cfg = dict(SMALL_CFG)
    # Mel convention must match the tiny generator: hop == total upsample
    # (4*2), n_mels == in_channels.
    cfg["audio"] = {"n_fft": 64, "hop_length": 8, "win_length": 64,
                    "n_mels": 16}
    cfg["train"] = {"checkpoint_every_epochs": 1}
    cfg_file = tmp_path / "gan_cfg.json"
    cfg_file.write_text(json.dumps(cfg))

    root, align = build_mini_corpus(tmp_path, n=6)
    out = tmp_path / "outputs"
    args = [
        "scripts/train_hifigan.py",
        "--config", str(cfg_file),
        "--data_root", str(root),
        "--alignment_dir", str(align),
        "--cache_dir", str(tmp_path / "cache"),
        "--output_dir", str(out),
        "--batch_size", "2",
        "--num_epochs", "1",
        "--segment_frames", "16",
        "--disc_width", "0.05",
        "--periods", "2",
        "--num_scales", "1",
        "--ema_decay", "0.9",
    ]
    r = _run(args)
    assert r.returncode == 0, r.stderr[-2000:]
    gan_dir = out / "hifigan_gan"
    assert (gan_dir / "gen").exists() and (gan_dir / "disc").exists()
    assert (gan_dir / "metrics.csv").exists()

    args[args.index("--num_epochs") + 1] = "2"
    r2 = _run(args)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed GAN from step" in (r2.stderr + r2.stdout)


def test_roofline_cli_json():
    """scripts/roofline.py: XLA-cost-model speed-of-light analysis emits
    sane JSON (positive FLOPs/bytes, HBM-bound vocoder, finite SoL RT)."""
    r = _run(["scripts/roofline.py", "--batch", "1", "--frames", "128",
              "--phonemes", "32", "--json"], timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.loads(r.stdout.strip().splitlines()[-1])
    stages = {s["stage"]: s for s in data["stages"]}
    voc = stages["vocoder (HiFiGAN)"]
    e2e = stages["fused end-to-end"]
    assert voc["gflops"] > 0 and voc["gbytes"] > 0
    assert e2e["gflops"] >= voc["gflops"]
    assert voc["bound"] in ("HBM", "FLOPs")
    assert 0 < e2e["sol_rt_factor"] < 1e7


def test_train_encoder_cli_all_training_features(small_cfg_file, tmp_path):
    """Every training feature at once through the real CLI: --mesh (4x2
    data x model) + --model_parallel 2 + --accum_steps 2 + --bf16, on top
    of the always-on donation, prefetch thread, and async checkpointing —
    the combination is what a production run uses, and combinations are
    where aliasing/placement bugs hide (the EMA-donation bug was one)."""
    from tests.corpus_utils import build_mini_corpus

    root, align = build_mini_corpus(tmp_path, n=8)
    out = tmp_path / "outputs_all"
    r = _run([
        "scripts/train_encoder.py",
        "--config", str(small_cfg_file),
        "--data_root", str(root),
        "--alignment_dir", str(align),
        "--cache_dir", str(tmp_path / "cache_all"),
        "--output_dir", str(out),
        "--batch_size", "4",
        "--num_epochs", "2",
        "--mesh", "--model_parallel", "2",
        "--accum_steps", "2",
        "--bf16",
    ], extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out / "encoder" / "checkpoints").exists()
    assert "mesh training on" in (r.stderr + r.stdout)
    # loss is finite in the metrics CSV (long format: step,name,value,time)
    import math
    rows = (out / "encoder" / "metrics.csv").read_text().strip().splitlines()
    losses = [float(r.split(",")[2]) for r in rows[1:]
              if r.split(",")[1] == "duration_loss"]
    assert losses and all(math.isfinite(v) for v in losses), rows[:3]


def test_mem_analysis_cli_json():
    """scripts/mem_analysis.py: compiler memory analysis emits one JSON row
    per remat variant with positive temp bytes."""
    r = _run(["scripts/mem_analysis.py", "--stage", "vae",
              "--batch_size", "2", "--frames", "64", "--phonemes", "8"],
             timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(ln) for ln in r.stdout.strip().splitlines()]
    assert {row["remat"] for row in rows} == {False, True}
    assert all(row["temp_mib"] > 0 for row in rows)


def test_bench_serve_cli(small_cfg_file):
    """Serving load benchmark emits one JSON line (closed loop, tiny
    shapes) with sane counters."""
    r = _run([
        "scripts/bench_serve.py", "--config", str(small_cfg_file),
        "--clients", "2", "--requests", "2",
        "--phoneme_buckets", "16,32", "--frame_buckets", "32,64",
        "--max_batch", "2",
    ], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["metric"] == "serve_qps"
    assert payload["requests_completed"] == 4
    assert payload["latency_ms"]["p99"] is not None
    assert payload["value"] > 0


def test_bench_serve_cli_ab(small_cfg_file):
    """--ab_max_batch_limit runs the fixed baseline AND the adaptive
    batcher in one process: one JSON line per config, labelled."""
    r = _run([
        "scripts/bench_serve.py", "--config", str(small_cfg_file),
        "--clients", "2", "--requests", "2",
        "--phoneme_buckets", "16,32", "--frame_buckets", "32,64",
        "--max_batch", "2", "--ab_max_batch_limit", "4",
    ], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(l) for l in r.stdout.splitlines() if l.strip()]
    assert [row["batcher"] for row in rows] == ["fixed", "adaptive"]
    assert rows[0]["max_batch_limit"] is None
    assert rows[1]["max_batch_limit"] == 4
    assert all(row["requests_completed"] == 4 for row in rows)
    assert all(row["value"] > 0 for row in rows)


def test_make_synthetic_corpus_cli(tmp_path):
    r = _run(["scripts/make_synthetic_corpus.py", "--root",
              str(tmp_path / "c"), "--n", "3"])
    assert r.returncode == 0, r.stderr[-500:]
    root = tmp_path / "c" / "LJSpeech-1.1"
    assert (root / "metadata.csv").exists()
    assert len(list((root / "wavs").glob("*.wav"))) == 3
    assert len(list((tmp_path / "c" / "aligned").glob("*.TextGrid"))) == 3


def test_gen_normalize_corpus_cli(tmp_path):
    # property checks run on every case; audit prints samples
    r = _run(["scripts/gen_normalize_corpus.py", "--audit", "1"])
    assert r.returncode == 0, r.stderr[-500:]
    assert "== cardinal" in r.stdout


def test_train_full_pipeline_help():
    r = _run(["scripts/train_full_pipeline.py", "--help"], timeout=120)
    assert r.returncode == 0
    for flag in ("--encoder_epochs", "--gan_epochs", "--artifact_half",
                 "--skip_eval", "--evidence_dir", "--release_dir"):
        assert flag in r.stdout


@pytest.mark.integration
def test_train_full_pipeline_end_to_end(tmp_path):
    """The capstone driver end-to-end at toy scale: four stages in one
    process → held-out eval → fp16 artifact → post-export smoke-eval (the
    reloaded artifact must score within tolerance of the pre-save model) →
    per-stage evidence snapshots written AS STAGES COMPLETE."""
    from tests.corpus_utils import build_mini_corpus

    cfg = dict(SMALL_CFG)
    # hop must equal the tiny generator's total upsample (4*2)
    cfg["audio"] = {"n_fft": 64, "hop_length": 8, "win_length": 64,
                    "n_mels": 16}
    cfg["vae"] = dict(cfg["vae"], flow_prior=True)
    cfg["train"] = {"checkpoint_every_epochs": 1}
    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(json.dumps(cfg))

    root, align = build_mini_corpus(tmp_path, n=24)
    out = tmp_path / "run"
    evidence = tmp_path / "evidence"
    release = tmp_path / "release" / "pipeline_artifact"
    r = _run([
        "scripts/train_full_pipeline.py",
        "--config", str(cfg_file),
        "--data_root", str(root),
        "--alignment_dir", str(align),
        "--cache_dir", str(tmp_path / "cache"),
        "--output_dir", str(out),
        "--batch_size", "4",
        "--encoder_epochs", "1", "--vae_epochs", "1",
        "--postnet_epochs", "1", "--gan_epochs", "1",
        "--gan_batch", "2", "--segment_frames", "16",
        "--disc_width", "0.05", "--ema_decay", "0.9",
        "--eval_samples", "1",
        "--artifact_half",
        "--evidence_dir", str(evidence),
        "--release_dir", str(release),
    ], timeout=1500)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-3000:])

    # per-stage evidence: metrics + snapshot for every stage
    for stage in ("encoder", "vae", "postnet", "hifigan_gan"):
        sdir = evidence / "stages" / stage
        assert (sdir / "metrics.csv").exists(), stage
        snap = json.loads((sdir / "snapshot.json").read_text())
        assert snap["stage"] == stage and not snap["partial"]
        assert snap["seconds"] > 0 and snap["final_metrics"]

    # eval summary with the control-margin fields + the smoke verdict
    summary = json.loads((evidence / "eval" / "summary.json").read_text())
    for key in ("mcd_db", "control_mcd_db", "mcd_margin_db",
                "duration_mae_frames", "resynth_mcd_db"):
        assert key in summary, key
    smoke = summary["artifact_smoke"]
    assert smoke["ok"], smoke
    assert smoke["params_dtype"] == "float16"
    assert len(smoke["samples"]) >= 1
    assert (evidence / "timings.json").exists()

    # the released artifact loads and synthesizes through the public API
    check = (
        "from iris_tts_tpu.models.pipeline import TTSPipeline; "
        f"p = TTSPipeline.load({str(release)!r}); "
        "a = p.synthesize('hello world', seed=0); "
        "assert a.ndim == 1 and len(a) > 0; print('artifact ok')"
    )
    r2 = _run(["-c", check], timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "artifact ok" in r2.stdout


def test_plot_training_curves_cli(tmp_path):
    run = tmp_path / "run" / "encoder"
    run.mkdir(parents=True)
    (run / "metrics.csv").write_text(
        "step,name,value,wall_time\n"
        "1,loss,2.0,0\n2,loss,1.0,0\n1,val_loss,2.5,0\n"
    )
    r = _run(["scripts/plot_training_curves.py", "--run",
              str(tmp_path / "run"), "--out", str(tmp_path / "plots")])
    assert r.returncode == 0, r.stderr[-500:]
    assert (tmp_path / "plots" / "curves_encoder.png").stat().st_size > 0


def test_synthesize_cli_artifact(small_cfg_file, tmp_path):
    """--artifact loads a TTSPipeline.save directory (the shipped-release
    path) and synthesizes out of the box."""
    mk = _run(["-c", (
        "from iris_tts_tpu.models import TTSPipeline\n"
        "from iris_tts_tpu.config import load_config\n"
        f"p = TTSPipeline.initialize(load_config({str(small_cfg_file)!r}))\n"
        f"p.save({str(tmp_path / 'art')!r}, half=True)\n"
    )])
    assert mk.returncode == 0, mk.stderr[-500:]
    out = tmp_path / "o.wav"
    r = _run(["scripts/synthesize.py", "--artifact", str(tmp_path / "art"),
              "--text", "hello world", "--output_wav", str(out)])
    assert r.returncode == 0, r.stderr[-500:]
    assert out.stat().st_size > 44
