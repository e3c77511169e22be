"""Synthetic-speech corpus generator: contracts the training run relies on.

The generator (iris_tts_tpu/data/synthetic_speech.py) replaces
LJSpeech+MFA in this environment (reference workflow:
/root/reference/scripts/train_vae.py:109-568), so its conventions must
match the data layer exactly: frame-quantized TextGrid times, mel/audio
length alignment, frontend-consistent phone labels.
"""

from pathlib import Path

import numpy as np
import pytest

from iris_tts_tpu.data.synthetic_speech import (
    HOP,
    PHONES,
    SR,
    CorpusSpec,
    build_tracks,
    generate_corpus,
    generate_sentences,
    render_audio,
    sample_durations,
)


@pytest.fixture(scope="module")
def text_processor():
    from iris_tts_tpu.text.frontend import create_text_processor

    return create_text_processor()


def test_phone_inventory_covers_stress_stripped_arpabet():
    # the 39 CMUdict phones, stress-stripped — everything the frontend
    # can emit from lexicon words must be renderable
    arpabet = {
        "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH",
        "ER", "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N",
        "NG", "OW", "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V",
        "W", "Y", "Z", "ZH",
    }
    assert arpabet == set(PHONES.keys())


def test_sentences_unique_and_numeric_fraction():
    sents = generate_sentences(200, seed=3)
    assert len(set(sents)) == 200
    numeric = sum(any(c.isdigit() for c in s) for s in sents)
    assert 10 <= numeric <= 90  # ~20% exercise the normalizer


def test_render_contract_and_determinism():
    phones = ["HH", "AH", "L", "OW", "S", "T", "AA", "P"]
    rng = np.random.default_rng(5)
    durs = sample_durations(phones, rng)
    assert durs.min() >= 2
    tracks = build_tracks(phones, durs, rng)
    assert tracks.num_frames == durs.sum()
    audio = render_audio(tracks, np.random.default_rng(9))
    # exact frame↔sample alignment: T*HOP samples
    assert audio.shape == (durs.sum() * HOP,)
    assert np.isfinite(audio).all()
    assert 0.3 < np.abs(audio).max() <= 0.65 + 1e-6
    # deterministic given the same generator states
    rng2 = np.random.default_rng(5)
    durs2 = sample_durations(phones, rng2)
    audio2 = render_audio(build_tracks(phones, durs2, rng2),
                          np.random.default_rng(9))
    np.testing.assert_array_equal(audio, audio2)


def test_spectral_structure_by_phone_class():
    """Vowels carry low-band energy, sibilants high-band — the structure
    the VAE's conditioning must be able to exploit."""
    import jax.numpy as jnp

    from iris_tts_tpu.config import AudioConfig
    from iris_tts_tpu.ops.stft import log_mel_spectrogram

    phones = ["AA", "S", "IY", "SH", "M"]
    rng = np.random.default_rng(0)
    durs = np.full(len(phones), 12, np.int64)
    audio = render_audio(build_tracks(phones, durs, rng), rng)
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(audio), AudioConfig()))
    lo = mel[:, :20].mean(axis=1)
    hi = mel[:, 55:].mean(axis=1)
    seg = lambda i: slice(i * 12 + 2, (i + 1) * 12 - 2)  # noqa: E731
    # vowels: low band dominates by a wide margin
    assert lo[seg(0)].mean() > hi[seg(0)].mean() + 3.0  # AA
    assert lo[seg(2)].mean() > hi[seg(2)].mean() + 3.0  # IY
    # sibilants: high band much stronger than in any vowel
    assert hi[seg(1)].mean() > hi[seg(0)].mean() + 2.0  # S vs AA
    assert hi[seg(3)].mean() > hi[seg(0)].mean() + 2.0  # SH vs AA
    # nasal murmur: damped highs relative to the vowel
    assert hi[seg(4)].mean() < hi[seg(0)].mean() - 0.5  # M vs AA


@pytest.mark.integration
def test_corpus_roundtrips_through_dataset_layer(tmp_path, text_processor):
    from iris_tts_tpu.data.ljspeech import LJSpeechVAEDataset
    from iris_tts_tpu.data.textgrid import durations_to_frames, load_alignments

    root, align = generate_corpus(
        tmp_path, CorpusSpec(n_utterances=8, seed=11),
        text_processor=text_processor,
    )
    assert (root / "metadata.csv").exists()
    ds = LJSpeechVAEDataset(root, align, split="train",
                            cache_dir=tmp_path / "cache")
    assert len(ds) == 8  # 5% val of 8 rounds to 0
    s = ds[0]
    # mel trimmed to Σdur exactly (the LJSpeech convention the trainers
    # depend on, ljspeech.py:268-286)
    assert s.mel.shape[0] == int(s.durations.sum())
    # TextGrid frame quantization round-trips the exact integer durations
    al = load_alignments(align)
    frames = durations_to_frames(al[s.file_id], SR, HOP)
    np.testing.assert_array_equal(frames, s.durations.astype(np.int64))
    # every phone label is in the training vocab AND still renderable
    for p in (ds.vocab.id_to_phoneme[i] for i in s.phoneme_ids):
        assert p in PHONES
    # the frontend maps the metadata text back onto the SAME vocab with
    # no <UNK> leakage (synthesis-time contract)
    ids = text_processor.text_to_ids(s.text, ds.vocab)
    assert (ids != ds.vocab.unk_id).all()


def test_unrenderable_sentences_are_skipped(tmp_path, text_processor):
    """A sentence whose phones fall outside the inventory is dropped, not
    mis-rendered (character-fallback leakage guard)."""
    from iris_tts_tpu.data.synthetic_speech import PHONES, generate_corpus

    # all generator-grammar sentences are renderable by construction; this
    # asserts the wavs/metadata stay consistent with each other
    root, align = generate_corpus(
        tmp_path, CorpusSpec(n_utterances=4, seed=2),
        text_processor=text_processor,
    )
    meta = (root / "metadata.csv").read_text().strip().splitlines()
    wavs = sorted((root / "wavs").glob("*.wav"))
    grids = sorted(Path(align).glob("*.TextGrid"))
    assert len(meta) == len(wavs) == len(grids)
