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


def test_config_loader_rejects_typos_and_wrong_types():
    """A typo'd field silently training the DEFAULT architecture is the
    reference's config-drift bug class (SURVEY §2.6) — the loader must
    reject unknown fields/sections and mistyped scalars with the path."""
    import pytest

    from iris_tts_tpu.config import config_from_json

    with pytest.raises(ValueError, match="unknown field.*n_mel"):
        config_from_json('{"vae": {"n_mel": 40}}')  # typo of n_mels
    with pytest.raises(ValueError, match="unknown field.*trian"):
        config_from_json('{"trian": {}}')  # typo of train
    with pytest.raises(ValueError, match="expected int"):
        config_from_json('{"encoder": {"vocab_size": "72"}}')
    with pytest.raises(ValueError, match="expected an object"):
        config_from_json("[]")
