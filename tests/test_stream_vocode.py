"""Chunked streaming vocoder: exact-overlap windows vs the full pass.

The generator is fully convolutional, so a chunk computed with
receptive-field context on each side must reproduce the full-utterance
output exactly (models/hifigan.py:receptive_radius_frames,
models/pipeline.py:vocode_streaming). These tests pin that equality, the
boundary-window alignment, and the PCM16 device-transfer variant.
"""

import numpy as np
import pytest

from iris_tts_tpu.config import HiFiGANConfig
from iris_tts_tpu.models.hifigan import receptive_radius_frames

from tests.corpus_utils import assert_audio_equal
from tests.test_pipeline import _small_config


@pytest.fixture(scope="module")
def pipeline():
    from iris_tts_tpu.models import TTSPipeline

    return TTSPipeline.initialize(_small_config())


def test_receptive_radius_default_topology():
    # Hand-computed for the production ladder (8,8,2,2)/(16,16,4,4),
    # MRF k=(3,7,11) d=(1,3,5): 3699 output samples → ceil(/256) = 15.
    assert receptive_radius_frames(HiFiGANConfig()) == 15


def test_receptive_radius_small_topology():
    cfg = _small_config().hifigan
    # conv_pre 3*8 + up1 2*8 + mrf 6*2 + up2 2*2 + mrf 6*1 + conv_post 3
    # = 65 samples → ceil(/8) = 9 frames.
    assert receptive_radius_frames(cfg) == 9


def _mel(pipe, t, seed=0):
    rng = np.random.default_rng(seed)
    n = pipe.config.hifigan.in_channels
    return rng.normal(-3.0, 2.0, size=(t, n)).astype(np.float32)


def test_streaming_equals_full(pipeline):
    mel = _mel(pipeline, 70)
    full = pipeline.vocode(mel)
    chunks = list(pipeline.vocode_streaming(mel, chunk_frames=16))
    # 70 = 4*16 + 6: last chunk is the remainder.
    assert [len(c) for c in chunks] == [128, 128, 128, 128, 48]
    assert_audio_equal(np.concatenate(chunks), full)


def test_streaming_unaligned_and_chunk1(pipeline):
    mel = _mel(pipeline, 41, seed=1)
    full = pipeline.vocode(mel)
    out = np.concatenate(
        list(pipeline.vocode_streaming(mel, chunk_frames=7))
    )
    assert_audio_equal(out, full)


def test_streaming_short_mel_single_dispatch(pipeline):
    # t <= window: falls back to one exact whole-mel dispatch.
    mel = _mel(pipeline, 12, seed=2)
    chunks = list(pipeline.vocode_streaming(mel, chunk_frames=16))
    assert len(chunks) == 1
    assert_audio_equal(chunks[0], pipeline.vocode(mel))


def test_streaming_pcm16(pipeline):
    mel = _mel(pipeline, 70, seed=3)
    f32 = np.concatenate(list(pipeline.vocode_streaming(mel, chunk_frames=16)))
    i16 = np.concatenate(
        list(pipeline.vocode_streaming(mel, chunk_frames=16, pcm16=True))
    )
    assert i16.dtype == np.int16
    expect = (np.clip(f32, -1.0, 1.0) * 32767.0).astype(np.int16)
    assert_audio_equal(i16, expect)


def test_streaming_reference_layout_in(pipeline):
    mel = _mel(pipeline, 70, seed=4)
    out = np.concatenate(
        list(pipeline.vocode_streaming(mel.T, chunk_frames=16))
    )
    assert_audio_equal(out, pipeline.vocode(mel))


def test_streaming_one_executable(pipeline):
    """All interior/boundary chunk positions share one compiled window
    executable (the no-recompile contract for unbounded-length mels)."""
    mel = _mel(pipeline, 200, seed=5)
    before = pipeline._vocode_window._cache_size()
    # A fresh chunk size over many window positions (first / interior /
    # right-clamped / remainder) must add exactly ONE executable.
    list(pipeline.vocode_streaming(mel, chunk_frames=20))
    assert pipeline._vocode_window._cache_size() == before + 1
