"""Dry-run of the real-artifact insurance driver (VERDICT r3 item 7):
scripts/verify_reference_artifacts.py against fixture artifacts — a seeded
torch generator checkpoint and a synthetic mini-LJSpeech corpus — must run
conversion + parity + one training epoch and append a PASS section to the
parity report."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.integration
def test_insurance_driver_dry_run(tmp_path):
    from iris_tts_tpu.config import (
        EncoderConfig,
        HiFiGANConfig,
        IrisConfig,
        PostNetConfig,
        VAEConfig,
        save_config,
    )
    from iris_tts_tpu.convert.torch_oracle import TorchGenerator
    from tests.corpus_utils import build_mini_corpus

    cfg = IrisConfig(
        encoder=EncoderConfig(vocab_size=16, embed_dim=32, num_blocks=1,
                              num_heads=2),
        vae=VAEConfig(cond_dim=32, model_channels=16, latent_dim=4,
                      num_wavenet_blocks=1, decoder_blocks=1, flow_layers=1,
                      flow_hidden=8),
        postnet=PostNetConfig(num_layers=2, channels=16),
        hifigan=HiFiGANConfig(in_channels=10, upsample_rates=(4, 2),
                              upsample_kernel_sizes=(8, 4),
                              upsample_initial_channel=32,
                              resblock_kernel_sizes=(3,),
                              resblock_dilations=((1, 3),)),
    )
    cfg_path = tmp_path / "cfg.json"
    save_config(cfg, cfg_path)

    torch.manual_seed(3)
    ckpt = tmp_path / "generator.ckpt"
    torch.save(TorchGenerator(cfg.hifigan).state_dict(), ckpt)

    corpus_root, align_dir = build_mini_corpus(tmp_path / "data", n=24)

    parity_md = tmp_path / "PARITY_dryrun.md"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" /
                             "verify_reference_artifacts.py"),
         "--hifigan_ckpt", str(ckpt),
         "--ljspeech", str(corpus_root),
         "--alignment_dir", str(align_dir),
         "--cache_dir", str(tmp_path / "cache"),
         "--config", str(cfg_path),
         "--parity_md", str(parity_md)],
        capture_output=True, text=True, timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = parity_md.read_text()
    assert "ALL PASS" in report
    assert "hifigan waveform parity" in report and "PASS" in report
    assert "LJSpeech VAE epoch" in report
    # idempotent append: a second run adds a second dated section
    meta = json.loads((tmp_path / "cfg.json").read_text())
    assert meta["hifigan"]["in_channels"] == 10
