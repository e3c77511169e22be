"""Golden parity for the Keras `.weights.h5` importer (convert/keras_h5.py).

Each test builds the REAL reference Keras model (imported read-only from
/root/reference/src), saves its weights, converts them with our importer,
and asserts our flax module reproduces the reference forward pass. Skipped
when keras or the reference checkout is unavailable.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

os.environ.setdefault("KERAS_BACKEND", "jax")
keras = pytest.importorskip("keras")
pytest.importorskip("h5py")

_REF_SRC = Path("/root/reference/src")
pytestmark = pytest.mark.skipif(
    not (_REF_SRC / "iris").is_dir(), reason="reference checkout unavailable"
)
if str(_REF_SRC) not in sys.path:
    sys.path.insert(0, str(_REF_SRC))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from iris_tts_tpu.config import (  # noqa: E402
    DurationConfig,
    EncoderConfig,
    HiFiGANConfig,
    PostNetConfig,
    VAEConfig,
)
from iris_tts_tpu.convert.keras_h5 import (  # noqa: E402
    convert_duration,
    convert_encoder,
    convert_keras_vocoder,
    convert_postnet,
    convert_vae,
    read_weights_h5,
)

RTOL = 2e-5
ATOL = 2e-5


def _save(model, tmp_path, name):
    p = tmp_path / f"{name}.weights.h5"
    model.save_weights(str(p))
    return read_weights_h5(p)


def test_encoder_parity(tmp_path):
    from iris.encoder import PhonemeEncoder as RefEncoder

    from iris_tts_tpu.models.encoder import PhonemeEncoder

    cfg = EncoderConfig(vocab_size=41, embed_dim=32, num_blocks=2,
                        num_heads=2, max_length=64)
    ref = RefEncoder(vocab_size=41, embed_dim=32, num_blocks=2, num_heads=2,
                     ffn_dim=cfg.ffn_hidden, max_length=64, dropout=0.1)
    ids = np.random.default_rng(0).integers(0, 41, (2, 9)).astype(np.int32)
    want = np.asarray(ref(ids, training=False))

    params = convert_encoder(_save(ref, tmp_path, "enc"), cfg.num_blocks)
    ours = PhonemeEncoder(cfg)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_duration_parity(tmp_path):
    from iris.encoder import DurationPredictor as RefDuration

    from iris_tts_tpu.models.encoder import DurationPredictor

    cfg = DurationConfig(hidden_dim=16, num_layers=2, kernel_size=3)
    ref = RefDuration(hidden_dim=16, num_layers=2, kernel_size=3)
    enc_out = np.random.default_rng(1).standard_normal((2, 9, 32)).astype(
        np.float32
    )
    want = np.asarray(ref(enc_out, training=False))[..., 0]  # [B, P]

    params = convert_duration(_save(ref, tmp_path, "dur"), cfg.num_layers)
    got = np.asarray(
        DurationPredictor(cfg).apply({"params": params}, jnp.asarray(enc_out))
    )
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_postnet_parity(tmp_path):
    from iris.postnet import PostNet as RefPostNet

    from iris_tts_tpu.models.postnet import PostNet

    cfg = PostNetConfig(n_mels=16, num_layers=3, channels=8, kernel_size=5)
    ref = RefPostNet(n_mels=16, num_layers=3, channels=8, kernel_size=5)
    mel_cn = np.random.default_rng(2).standard_normal((2, 16, 12)).astype(
        np.float32
    )
    _ = ref(mel_cn, training=True)  # build (primes BatchNorm)
    want = np.asarray(ref(mel_cn, training=False))  # [B, n_mels, T]

    variables = convert_postnet(_save(ref, tmp_path, "pn"), cfg.num_layers)
    mel_tc = jnp.swapaxes(jnp.asarray(mel_cn), 1, 2)  # ours is time-major
    got = np.asarray(PostNet(cfg).apply(variables, mel_tc))
    np.testing.assert_allclose(
        np.swapaxes(got, 1, 2), want, rtol=RTOL, atol=ATOL
    )


def test_vae_parity(tmp_path):
    from iris.vae import TextConditionedVAE as RefVAE

    from iris_tts_tpu.models.vae import TextConditionedVAE

    cfg = VAEConfig(n_mels=16, cond_dim=32, model_channels=16, latent_dim=4,
                    num_wavenet_blocks=2, decoder_blocks=2,
                    wavenet_kernel_size=5, down_stages=2, flow_layers=2,
                    flow_hidden=8)
    ref = RefVAE(n_mels=16, cond_dim=32, model_channels=16, latent_dim=4,
                 num_wavenet_blocks=2, decoder_blocks=2,
                 wavenet_kernel_size=5, down_stages=2, flow_layers=2,
                 flow_hidden=8)
    rng = np.random.default_rng(3)
    mel_cn = rng.standard_normal((2, 16, 8)).astype(np.float32)
    cond = rng.standard_normal((2, 8, 32)).astype(np.float32)
    ref_out = ref(mel_cn, cond, training=False)
    want_recon = np.asarray(ref_out[0])  # [B, n_mels, T]

    params = convert_vae(
        _save(ref, tmp_path, "vae"),
        cfg.num_wavenet_blocks, cfg.decoder_blocks, cfg.down_stages,
        cfg.flow_layers,
    )
    mel_tc = jnp.swapaxes(jnp.asarray(mel_cn), 1, 2)
    got = TextConditionedVAE(cfg).apply(
        {"params": params}, mel_tc, jnp.asarray(cond)
    )
    got_recon = np.swapaxes(np.asarray(got[0]), 1, 2)
    np.testing.assert_allclose(got_recon, want_recon, rtol=1e-4, atol=1e-4)
    # posterior stats too
    np.testing.assert_allclose(
        np.asarray(got[1][0]), np.asarray(ref_out[1][0]), rtol=1e-4, atol=1e-4
    )


def test_keras_vocoder_parity(tmp_path):
    from iris.vocoder import HiFiGANGenerator as RefVocoder

    from iris_tts_tpu.models.hifigan import HiFiGANGenerator

    cfg = HiFiGANConfig(in_channels=16, upsample_rates=(4, 2),
                        upsample_kernel_sizes=(8, 4),
                        upsample_initial_channel=16,
                        resblock_kernel_sizes=(3,),
                        resblock_dilations=((1, 3),))
    ref = RefVocoder(in_channels=16, upsample_rates=(4, 2),
                     upsample_kernel_sizes=(8, 4),
                     upsample_initial_channel=16,
                     resblock_kernel_sizes=(3,),
                     resblock_dilations=((1, 3),))
    # The reference Keras generator is channels-last: [B, T, in_channels]
    # (its HiFiGANVocoder.infer wrapper adapts layouts, vocoder.py:145-213).
    mel_tc = np.random.default_rng(4).standard_normal((2, 8, 16)).astype(
        np.float32
    )
    want = np.asarray(ref(mel_tc)).reshape(2, -1)  # [B, T*up]

    params = convert_keras_vocoder(
        _save(ref, tmp_path, "voc"),
        cfg.upsample_rates, cfg.resblock_kernel_sizes, cfg.resblock_dilations,
    )
    got = np.asarray(
        HiFiGANGenerator(config=cfg).apply({"params": params},
                                           jnp.asarray(mel_tc))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_load_stage_weights_drives_pipeline(tmp_path):
    """End to end: reference encoder+duration checkpoints drive our
    pipeline params layout."""
    from iris.encoder import DurationPredictor as RefDuration
    from iris.encoder import PhonemeEncoder as RefEncoder

    from iris_tts_tpu.config import IrisConfig
    from iris_tts_tpu.convert.keras_h5 import load_keras_stage_weights
    from iris_tts_tpu.models.pipeline import TTSPipeline

    cfg = IrisConfig(
        encoder=EncoderConfig(vocab_size=41, embed_dim=32, num_blocks=1,
                              num_heads=2, max_length=64),
        duration=DurationConfig(hidden_dim=16, num_layers=2),
        vae=VAEConfig(n_mels=16, cond_dim=32, model_channels=16, latent_dim=4,
                      num_wavenet_blocks=1, decoder_blocks=1, flow_layers=1,
                      flow_hidden=8),
        postnet=PostNetConfig(n_mels=16, num_layers=2, channels=8),
        hifigan=HiFiGANConfig(in_channels=16, upsample_rates=(4, 2),
                              upsample_kernel_sizes=(8, 4),
                              upsample_initial_channel=16,
                              resblock_kernel_sizes=(3,),
                              resblock_dilations=((1, 3),)),
    )
    ref_enc = RefEncoder(vocab_size=41, embed_dim=32, num_blocks=1,
                         num_heads=2, ffn_dim=cfg.encoder.ffn_hidden,
                         max_length=64)
    _ = ref_enc(np.zeros((1, 8), np.int32))
    ref_enc.save_weights(str(tmp_path / "enc.weights.h5"))
    ref_dur = RefDuration(hidden_dim=16, num_layers=2)
    _ = ref_dur(np.zeros((1, 8, 32), np.float32))
    ref_dur.save_weights(str(tmp_path / "dur.weights.h5"))

    converted = load_keras_stage_weights(
        cfg,
        encoder_path=tmp_path / "enc.weights.h5",
        duration_path=tmp_path / "dur.weights.h5",
    )
    pipe = TTSPipeline.initialize(cfg, seed=0)
    # Shape compatibility with the initialized tree, then a real synth.
    ref_shapes = jax.tree_util.tree_map(jnp.shape, pipe.params["encoder"])
    new_shapes = jax.tree_util.tree_map(np.shape, converted["encoder"])
    assert ref_shapes == new_shapes
    pipe.params["encoder"] = jax.tree_util.tree_map(
        jnp.asarray, converted["encoder"]
    )
    pipe.params["duration"] = jax.tree_util.tree_map(
        jnp.asarray, converted["duration"]
    )
    audio = pipe.synthesize("hello world", seed=0)
    assert audio.ndim == 1 and np.isfinite(audio).all()


def test_import_cli_end_to_end(tmp_path):
    """scripts/import_keras_checkpoint.py: reference .weights.h5 →
    exported pipeline dir → TTSPipeline.load → synthesize."""
    import subprocess

    from iris.encoder import DurationPredictor as RefDuration
    from iris.encoder import PhonemeEncoder as RefEncoder

    from iris_tts_tpu.config import IrisConfig, save_config
    from iris_tts_tpu.models.pipeline import TTSPipeline

    cfg = IrisConfig(
        encoder=EncoderConfig(vocab_size=41, embed_dim=32, num_blocks=1,
                              num_heads=2, max_length=64),
        duration=DurationConfig(hidden_dim=16, num_layers=2),
        vae=VAEConfig(n_mels=16, cond_dim=32, model_channels=16, latent_dim=4,
                      num_wavenet_blocks=1, decoder_blocks=1, flow_layers=1,
                      flow_hidden=8),
        postnet=PostNetConfig(n_mels=16, num_layers=2, channels=8),
        hifigan=HiFiGANConfig(in_channels=16, upsample_rates=(4, 2),
                              upsample_kernel_sizes=(8, 4),
                              upsample_initial_channel=16,
                              resblock_kernel_sizes=(3,),
                              resblock_dilations=((1, 3),)),
    )
    save_config(cfg, tmp_path / "config.json")
    ref_enc = RefEncoder(vocab_size=41, embed_dim=32, num_blocks=1,
                         num_heads=2, ffn_dim=cfg.encoder.ffn_hidden,
                         max_length=64)
    _ = ref_enc(np.zeros((1, 8), np.int32))
    ref_enc.save_weights(str(tmp_path / "enc.weights.h5"))
    ref_dur = RefDuration(hidden_dim=16, num_layers=2)
    _ = ref_dur(np.zeros((1, 8, 32), np.float32))
    ref_dur.save_weights(str(tmp_path / "dur.weights.h5"))

    repo = Path(__file__).resolve().parent.parent
    # Minimal env (same pattern as tests/test_scripts.py): dropping the
    # host sitecustomize from PYTHONPATH is what makes JAX_PLATFORMS=cpu
    # effective — inheriting os.environ would run the CLI on the TPU.
    env = {"PYTHONPATH": str(repo), "PATH": "/usr/bin:/bin:/usr/local/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root"}
    out = tmp_path / "exported"
    res = subprocess.run(
        [sys.executable, str(repo / "scripts/import_keras_checkpoint.py"),
         "--output", str(out),
         "--config", str(tmp_path / "config.json"),
         "--encoder_weights", str(tmp_path / "enc.weights.h5"),
         "--duration_weights", str(tmp_path / "dur.weights.h5")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    pipe = TTSPipeline.load(out)
    audio = pipe.synthesize("hello world", seed=0)
    assert audio.ndim == 1 and np.isfinite(audio).all()


def test_keras_vocoder_parity_multi_resblock(tmp_path):
    """Pins the /layers name-counter assumptions at a multi-stage,
    multi-resblock topology (2 upsample stages x 2 MRF kernels x 2
    dilations = the same counter structure as the production
    (8,8,2,2)x(3,7,11) config)."""
    from iris.vocoder import HiFiGANGenerator as RefVocoder

    from iris_tts_tpu.models.hifigan import HiFiGANGenerator

    kw = dict(in_channels=8, upsample_rates=(4, 2),
              upsample_kernel_sizes=(8, 4), upsample_initial_channel=16,
              resblock_kernel_sizes=(3, 5),
              resblock_dilations=((1, 3), (1, 2)))
    cfg = HiFiGANConfig(**kw)
    ref = RefVocoder(**kw)
    mel_tc = np.random.default_rng(5).standard_normal((2, 8, 8)).astype(
        np.float32
    )
    want = np.asarray(ref(mel_tc)).reshape(2, -1)

    params = convert_keras_vocoder(
        _save(ref, tmp_path, "voc2"),
        cfg.upsample_rates, cfg.resblock_kernel_sizes, cfg.resblock_dilations,
    )
    got = np.asarray(
        HiFiGANGenerator(config=cfg).apply({"params": params},
                                           jnp.asarray(mel_tc))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
