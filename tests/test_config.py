"""Config tree JSON round-trip tests."""

import dataclasses

from iris_tts_tpu.config import (
    AudioConfig,
    HiFiGANConfig,
    IrisConfig,
    VAEConfig,
    config_from_json,
    config_to_json,
    load_config,
    save_config,
)


def test_roundtrip_default():
    cfg = IrisConfig()
    again = config_from_json(config_to_json(cfg))
    assert again == cfg


def test_roundtrip_modified(tmp_path):
    cfg = IrisConfig(
        vae=VAEConfig(model_channels=256, latent_dim=32),
        audio=AudioConfig(sample_rate=16000),
    )
    p = tmp_path / "cfg.json"
    save_config(cfg, p)
    again = load_config(p)
    assert again == cfg
    assert again.vae.model_channels == 256
    assert again.audio.sample_rate == 16000


def test_tuples_survive_roundtrip():
    cfg = IrisConfig(hifigan=HiFiGANConfig(upsample_rates=(4, 4, 2, 2)))
    again = config_from_json(config_to_json(cfg))
    assert again.hifigan.upsample_rates == (4, 4, 2, 2)
    assert isinstance(again.hifigan.resblock_dilations[0], tuple)


def test_contract_constants_match_reference():
    """Audio constants are the system contract (SURVEY.md §2.5)."""
    a = AudioConfig()
    assert (a.sample_rate, a.n_fft, a.hop_length, a.win_length) == (
        22050,
        1024,
        256,
        1024,
    )
    assert (a.n_mels, a.fmin, a.fmax) == (80, 0.0, 8000.0)
    h = HiFiGANConfig()
    assert h.total_upsample == a.hop_length  # 8*8*2*2 == 256


def test_configs_frozen():
    cfg = IrisConfig()
    try:
        cfg.audio = AudioConfig()  # type: ignore[misc]
        raised = False
    except dataclasses.FrozenInstanceError:
        raised = True
    assert raised
