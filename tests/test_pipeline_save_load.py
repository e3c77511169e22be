"""Pipeline export/load round trip: one deployable directory."""

import numpy as np

from iris_tts_tpu.config import (
    DurationConfig,
    EncoderConfig,
    HiFiGANConfig,
    IrisConfig,
    PostNetConfig,
    VAEConfig,
)
from iris_tts_tpu.models import TTSPipeline


def _cfg():
    return IrisConfig(
        encoder=EncoderConfig(vocab_size=41, embed_dim=16, num_blocks=1,
                              num_heads=2),
        duration=DurationConfig(hidden_dim=8, num_layers=1),
        vae=VAEConfig(n_mels=8, cond_dim=16, model_channels=8, latent_dim=4,
                      num_wavenet_blocks=1, decoder_blocks=1, flow_layers=1,
                      flow_hidden=8),
        postnet=PostNetConfig(n_mels=8, num_layers=2, channels=8),
        hifigan=HiFiGANConfig(in_channels=8, upsample_rates=(4, 2),
                              upsample_kernel_sizes=(8, 4),
                              upsample_initial_channel=16,
                              resblock_kernel_sizes=(3,),
                              resblock_dilations=((1,),)),
    )


def test_save_load_roundtrip(tmp_path):
    pipe = TTSPipeline.initialize(_cfg(), seed=7)
    pipe.phoneme_buckets = (16,)
    pipe.frame_buckets = (32,)
    want = pipe.synthesize("hello world", seed=3)

    pipe.save(tmp_path / "deploy")
    again = TTSPipeline.load(tmp_path / "deploy")
    again.phoneme_buckets = (16,)
    again.frame_buckets = (32,)
    got = again.synthesize("hello world", seed=3)

    np.testing.assert_array_equal(got, want)
    assert again.config == pipe.config
    assert again.vocab.phoneme_to_id == pipe.vocab.phoneme_to_id
    assert again.use_postnet == pipe.use_postnet


def test_save_load_persists_tuned_serving_knobs(tmp_path):
    """fused_frames_per_phoneme and the bucket ladders survive the save/load
    round trip — reverting an operator's overflow-budget tuning on redeploy
    would silently compress speech rate again."""
    from tests.test_pipeline import _small_config
    from iris_tts_tpu.models import TTSPipeline

    pipe = TTSPipeline.initialize(_small_config(), seed=0)
    pipe.phoneme_buckets = (16, 32)
    pipe.frame_buckets = (32, 64)
    pipe.fused_frames_per_phoneme = 21
    pipe.save(tmp_path / "exp")
    loaded = TTSPipeline.load(tmp_path / "exp")
    assert loaded.fused_frames_per_phoneme == 21
    assert loaded.phoneme_buckets == (16, 32)
    assert loaded.frame_buckets == (32, 64)


def test_save_load_half_precision(tmp_path):
    """half=True artifacts are ~half the bytes, load back as float32, and
    synthesize within float16 rounding of the full-precision pipeline."""
    pipe = TTSPipeline.initialize(_cfg(), seed=7)
    pipe.phoneme_buckets = (16,)
    pipe.frame_buckets = (32,)
    want = pipe.synthesize("hello world", seed=3)

    pipe.save(tmp_path / "full")
    pipe.save(tmp_path / "half", half=True)

    def tree_bytes(d):
        return sum(p.stat().st_size for p in d.rglob("*") if p.is_file())

    assert tree_bytes(tmp_path / "half") < 0.7 * tree_bytes(tmp_path / "full")

    again = TTSPipeline.load(tmp_path / "half")
    again.phoneme_buckets = (16,)
    again.frame_buckets = (32,)
    import jax

    assert all(
        np.asarray(x).dtype == np.float32
        for x in jax.tree_util.tree_leaves(again.params)
    )
    got = again.synthesize("hello world", seed=3)
    assert got.shape == want.shape
    # float16 weight rounding: tiny waveform perturbation, same audio
    scale = float(np.abs(want).max()) or 1.0
    assert float(np.abs(got - want).max()) < 0.02 * scale
