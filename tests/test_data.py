"""Dataset layer tests: TextGrid parsing, LJSpeech datasets, bucketing."""

import numpy as np
import pytest

from iris_tts_tpu.config import AudioConfig
from iris_tts_tpu.data.audio_io import write_wav
from iris_tts_tpu.data.batching import (
    BucketedBatcher,
    collate_duration_batch,
    collate_vae_batch,
)
from iris_tts_tpu.data.ljspeech import (
    LJSpeechDurationDataset,
    LJSpeechVAEDataset,
    Sample,
    read_metadata,
    train_val_split,
)
from iris_tts_tpu.data.textgrid import (
    durations_to_frames,
    load_alignment_cache,
    load_alignment_phones,
    parse_textgrid,
    save_alignment_cache,
)

_LONG_TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 2
        intervals [1]:
            xmin = 0
            xmax = 0.5
            text = "hello"
        intervals [2]:
            xmin = 0.5
            xmax = 1.0
            text = ""
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 4
        intervals [1]:
            xmin = 0
            xmax = 0.1
            text = "HH"
        intervals [2]:
            xmin = 0.1
            xmax = 0.3
            text = "AH"
        intervals [3]:
            xmin = 0.3
            xmax = 0.45
            text = "L"
        intervals [4]:
            xmin = 0.45
            xmax = 1.0
            text = ""
"""


def test_parse_long_textgrid():
    tiers = parse_textgrid(_LONG_TG)
    assert [t.name for t in tiers] == ["words", "phones"]
    assert len(tiers[1].intervals) == 4
    assert tiers[1].intervals[0].text == "HH"
    assert tiers[1].intervals[3].text == ""


def test_load_alignment_phones_skips_silence(tmp_path):
    p = tmp_path / "x.TextGrid"
    p.write_text(_LONG_TG)
    phones = load_alignment_phones(p)
    # reference contract (alignment.py:148-167): silences skipped
    assert [ph["phone"] for ph in phones] == ["HH", "AH", "L"]
    assert abs(phones[1]["duration"] - 0.2) < 1e-9


def test_durations_to_frames_convention():
    # max(1, round(sec*sr/hop)) — datasets.py:363-367
    phones = [
        {"phone": "A", "start": 0, "end": 0.001, "duration": 0.001},
        {"phone": "B", "start": 0, "end": 0.1, "duration": 0.1},
    ]
    frames = durations_to_frames(phones, 22050, 256)
    assert frames[0] == 1  # min 1 frame
    assert frames[1] == round(0.1 * 22050 / 256)


def test_alignment_cache_roundtrip(tmp_path):
    aligns = {
        "LJ001-0001": [
            {"phone": "HH", "start": 0.0, "end": 0.1, "duration": 0.1},
            {"phone": "AH", "start": 0.1, "end": 0.3, "duration": 0.2},
        ],
        "LJ001-0002": [
            {"phone": "K", "start": 0.0, "end": 0.05, "duration": 0.05},
        ],
    }
    path = tmp_path / "cache.npz"
    save_alignment_cache(aligns, path)
    again = load_alignment_cache(path)
    assert set(again) == set(aligns)
    assert [p["phone"] for p in again["LJ001-0001"]] == ["HH", "AH"]
    assert abs(again["LJ001-0001"][1]["duration"] - 0.2) < 1e-6


def test_train_val_split_reference_convention():
    ids = [f"LJ{i:03d}" for i in range(100)]
    train, val = train_val_split(ids, 0.05)
    assert len(val) == 5
    assert val == sorted(ids)[:5]  # first 5% of sorted ids
    assert not set(train) & set(val)


# ---------------------------------------------------------------------------
# Mini synthetic LJSpeech corpus
# ---------------------------------------------------------------------------


@pytest.fixture
def mini_corpus(tmp_path, rng):
    from tests.corpus_utils import build_mini_corpus

    return build_mini_corpus(tmp_path, n=10)


def test_duration_dataset(mini_corpus, tmp_path):
    root, align_dir = mini_corpus
    cache = tmp_path / "cache"
    ds = LJSpeechDurationDataset(
        root, align_dir, split="train", cache_dir=cache, val_fraction=0.2
    )
    assert len(ds) == 8  # 10 ids, first 20% → val
    s = ds[0]
    assert s.phoneme_ids.dtype == np.int32
    assert s.durations.min() >= 1
    assert (cache / "phoneme_vocab.json").exists()
    assert (cache / "alignments.npz").exists()

    val = LJSpeechDurationDataset(
        root, align_dir, split="val", cache_dir=cache, val_fraction=0.2
    )
    assert len(val) == 2
    assert val.vocab.phoneme_to_id == ds.vocab.phoneme_to_id


def test_vae_dataset_mel_cache_and_trim(mini_corpus, tmp_path):
    root, align_dir = mini_corpus
    cache = tmp_path / "cache"
    ds = LJSpeechVAEDataset(
        root, align_dir, split="train", cache_dir=cache, val_fraction=0.2
    )
    n = ds.precompute_mels()
    assert n == len(ds)
    s = ds[0]
    # mel trimmed to sum(durations) (datasets.py:621-624)
    assert s.mel.shape[0] == s.num_frames
    assert s.mel.shape[1] == 80
    # second read comes from cache (no exception, same data)
    s2 = ds[0]
    np.testing.assert_array_equal(s.mel, s2.mel)


def test_collate_static_shapes():
    samples = [
        Sample("a", "", np.array([1, 2, 3], np.int32),
               np.array([2, 2, 2], np.float32),
               mel=np.ones((6, 4), np.float32)),
        Sample("b", "", np.array([4, 5], np.int32),
               np.array([3, 1], np.float32),
               mel=np.ones((4, 4), np.float32)),
    ]
    b = collate_vae_batch(samples, phoneme_bucket=8, frame_bucket=8,
                          down_factor=4)
    assert b["phoneme_ids"].shape == (2, 8)
    assert b["mel"].shape == (2, 8, 4)
    assert b["phoneme_mask"].sum() == 5
    # durations never exceed the frame bucket
    assert b["durations"].sum(axis=1).max() <= 8


def test_collate_duration_clamp_overflow():
    s = Sample("a", "", np.array([1, 2], np.int32),
               np.array([10, 10], np.float32),
               mel=np.ones((8, 4), np.float32))
    b = collate_vae_batch([s], phoneme_bucket=4, frame_bucket=8)
    assert b["durations"][0].sum() <= 8


def test_bucketed_batcher(mini_corpus, tmp_path):
    root, align_dir = mini_corpus
    ds = LJSpeechVAEDataset(
        root, align_dir, split="train", cache_dir=tmp_path / "c",
        val_fraction=0.2,
    )
    batcher = BucketedBatcher(
        ds, batch_size=4,
        phoneme_buckets=(8, 16), frame_buckets=(16, 32, 64),
    )
    shapes = set()
    n_rows = 0
    for batch in batcher.epoch(0):
        assert batch["phoneme_ids"].shape[0] == 4  # static batch
        shapes.add(batch["mel"].shape[1:])
        n_rows += batch["phoneme_ids"].shape[0]
    assert n_rows >= len(ds)
    # small static shape set
    assert len(shapes) <= 4
    # deterministic across equal epochs
    a = [b["phoneme_ids"].tobytes() for b in batcher.epoch(3)]
    b_ = [b["phoneme_ids"].tobytes() for b in batcher.epoch(3)]
    assert a == b_


def test_read_metadata(tmp_path):
    (tmp_path / "metadata.csv").write_text(
        "LJ001-0001|Raw text 1|Normalized one\nLJ001-0002|Raw|Norm two"
    )
    meta = read_metadata(tmp_path)
    assert meta["LJ001-0001"] == "Normalized one"
    assert meta["LJ001-0002"] == "Norm two"


def test_remainder_batch_rows_are_masked_out():
    """Padding rows in flushed remainder batches must not contribute to any
    loss: zero phoneme_mask and zero durations (review fix)."""
    samples = [
        Sample(f"s{i}", "", np.array([1, 2, 3], np.int32),
               np.array([2.0, 2.0, 2.0], np.float32),
               mel=np.ones((6, 4), np.float32))
        for i in range(2)
    ]
    batcher = BucketedBatcher(
        samples, batch_size=4, phoneme_buckets=(4,), frame_buckets=(8,),
        down_factor=4,
    )
    batches = list(batcher.epoch(0))
    assert len(batches) == 1
    b = batches[0]
    assert b["phoneme_ids"].shape[0] == 4
    # rows 2..3 are padding: fully masked, zero durations
    assert b["phoneme_mask"][:2].sum() == 6
    assert b["phoneme_mask"][2:].sum() == 0
    assert b["durations"][2:].sum() == 0


def test_remainder_batch_cycles_distinct_samples():
    """Padding cycles through the bin's real samples instead of repeating
    only the first one (review fix: x % x == 0 degeneracy)."""
    samples = [
        Sample(f"s{i}", "", np.array([i + 1], np.int32),
               np.array([1.0], np.float32))
        for i in range(3)
    ]
    batcher = BucketedBatcher(
        samples, batch_size=6, phoneme_buckets=(4,), with_mel=False
    )
    b = next(iter(batcher.epoch(0)))
    real_ids = set(b["phoneme_ids"][:3, 0].tolist())
    pad_ids = b["phoneme_ids"][3:, 0].tolist()
    assert len(real_ids) == 3
    assert len(set(pad_ids)) > 1  # not all copies of one sample


def test_vocab_strips_mfa_stress_digits(tmp_path):
    """MFA phone labels carry stress digits; the training vocab and encoded
    ids must be stress-stripped to match the synthesis frontend
    (review fix)."""
    align_dir = tmp_path / "aligned"
    align_dir.mkdir()
    tg = _LONG_TG.replace('text = "AH"', 'text = "AH0"').replace(
        'text = "HH"', 'text = "HH"'
    )
    (align_dir / "LJ001-0001.TextGrid").write_text(tg)
    ds = LJSpeechDurationDataset(
        tmp_path, align_dir, split="train", val_fraction=0.0
    )
    assert "AH" in ds.vocab.phoneme_to_id
    assert "AH0" not in ds.vocab.phoneme_to_id
    s = ds[0]
    assert ds.vocab.unk_id not in s.phoneme_ids


# ---------------------------------------------------------------------------
# prefetch_to_device
# ---------------------------------------------------------------------------


def test_prefetch_to_device_order_and_values():
    """Prefetched batches arrive in order, device-placed, value-identical
    to the plain iterator (the TrainLoop input path)."""
    import jax.numpy as jnp

    from iris_tts_tpu.data.batching import prefetch_to_device

    batches = [
        {"x": np.full((2, 3), i, np.float32), "i": np.asarray([i])}
        for i in range(7)
    ]
    got = list(prefetch_to_device(iter(batches), size=2))
    assert len(got) == 7
    for i, b in enumerate(got):
        assert isinstance(b["x"], jnp.ndarray)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])
        assert int(b["i"][0]) == i


def test_prefetch_to_device_custom_place_and_early_stop():
    """A custom place fn (the mesh/microbatch hook) runs on the worker; an
    early-stopping consumer shuts the worker down promptly instead of
    draining the whole (possibly infinite) source."""
    import itertools
    import threading
    import time

    from iris_tts_tpu.data.batching import prefetch_to_device

    placed = []

    def place(b):
        placed.append(b["i"])
        return {"i": b["i"] * 10}

    def infinite():
        for i in itertools.count():
            yield {"i": i}

    gen = prefetch_to_device(infinite(), size=2, place=place)
    first = [next(gen) for _ in range(3)]
    assert [b["i"] for b in first] == [0, 10, 20]
    gen.close()  # consumer stops early
    n_before = threading.active_count()
    time.sleep(0.3)
    # worker exited: no prefetch thread lingers past close()
    names = [t.name for t in threading.enumerate()]
    assert "prefetch_to_device" not in names, (names, n_before)
    # bounded lookahead: at most consumed + queue size + 1 in-flight
    assert len(placed) <= 3 + 2 + 1


def test_prefetch_to_device_propagates_worker_exception():
    from iris_tts_tpu.data.batching import prefetch_to_device

    def bad():
        yield {"i": np.asarray([0])}
        raise RuntimeError("collate blew up")

    gen = prefetch_to_device(bad(), size=2)
    next(gen)
    with pytest.raises(RuntimeError, match="collate blew up"):
        next(gen)
