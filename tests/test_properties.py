"""Property-based tests (hypothesis) for host-side numerical contracts.

These pin the INVARIANTS behind the example-based suites: the streaming
window plan that the vocoder's bit-exactness rests on, device length
regulation's conservation laws, rule-normalization idempotence, and the
native npy reader's behavior on hostile bytes.
"""

import functools
import subprocess
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from iris_tts_tpu.models.hifigan import iter_stream_windows

SETTINGS = dict(max_examples=80, deadline=None)


@settings(**SETTINGS)
@given(
    chunk=st.integers(1, 64),
    ctx=st.integers(0, 32),
    extra=st.integers(1, 300),
)
def test_stream_window_plan_invariants(chunk, ctx, extra):
    """For every (t, chunk, ctx) with t > window: the yielded keep-regions
    tile [0, t) exactly; every window lies inside the mel; the clamped
    slice always fits; boundary windows align to the true mel edges (the
    property that makes layer zero-padding match a full pass)."""
    window = chunk + 2 * ctx
    t = window + extra
    plan = list(iter_stream_windows(t, chunk, ctx))
    # Keep-regions tile [0, t) in order without gaps or overlap.
    assert plan[0][0] == 0 and plan[-1][1] == t
    for (a, b, w0, sf, scf) in plan:
        assert 0 < b - a <= chunk
        # window inside the mel
        assert 0 <= w0 and w0 + window <= t
        # the keep region is inside the window
        assert w0 + sf == a and a + (b - a) <= w0 + window
        # the clamped fixed-size slice fits, and the host trim offset is
        # non-negative
        assert 0 <= scf <= window - chunk and sf >= scf
        # rows produced from real context wherever it exists
        if a >= ctx:
            assert w0 <= a - ctx or w0 == t - window
        if a < ctx:
            assert w0 == 0  # left-boundary window IS the true edge
        if t - b < ctx:
            assert w0 == t - window  # right-boundary window likewise
    for prev, cur in zip(plan, plan[1:]):
        assert prev[1] == cur[0]


@settings(**SETTINGS)
@given(data=st.data())
def test_length_regulate_conservation(data):
    """Device length regulation: with a sufficient frame budget, every
    phoneme occupies exactly its duration in frames, in order, and the
    frame mask counts the duration sum."""
    from iris_tts_tpu.ops.length import length_regulate

    P, T = 6, 64
    durs = data.draw(
        st.lists(st.integers(0, 8), min_size=P, max_size=P).map(np.array)
    )
    total = int(durs.sum())
    if total == 0 or total > T:
        return
    # Encoder output rows are the phoneme indices themselves, so the
    # regulated frames reveal which phoneme produced them.
    enc = jnp.arange(P, dtype=jnp.float32)[None, :, None]
    d = jnp.asarray(durs, jnp.float32)[None]
    frames, mask = jax.jit(
        lambda e, dd: length_regulate(e, dd, total_frames=T)
    )(enc, d)
    frames = np.asarray(frames)[0, :, 0]
    mask = np.asarray(mask)[0]
    assert mask.sum() == total
    want = np.repeat(np.arange(P), durs)
    np.testing.assert_array_equal(frames[:total], want)


@settings(**SETTINGS)
@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x24F),
        max_size=60,
    )
)
def test_normalize_text_idempotent_and_total(text):
    """normalize_text never raises on arbitrary input and is idempotent —
    a second pass through the rule engine changes nothing (rule engines
    drift subtly when a rule's OUTPUT matches another rule's INPUT)."""
    from iris_tts_tpu.text.normalize import normalize_text

    once = normalize_text(text)
    assert normalize_text(once) == once


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_native_npy_reader_rejects_hostile_bytes(
    pjrt_runner_bin, tmp_path_factory, data
):
    """Truncations/mutations of a valid .npy must produce a clean nonzero
    exit from the native reader — never a crash signal or a hang."""
    runner = pjrt_runner_bin
    tmp = tmp_path_factory.mktemp("fuzz")
    base = tmp / "base.npy"
    np.save(base, np.arange(24, dtype=np.float32).reshape(4, 6))
    raw = bytearray(base.read_bytes())
    mode = data.draw(st.sampled_from(["truncate", "mutate", "garbage"]))
    if mode == "truncate":
        raw = raw[: data.draw(st.integers(0, len(raw) - 1))]
    elif mode == "mutate":
        i = data.draw(st.integers(0, min(60, len(raw) - 1)))
        raw[i] = data.draw(st.integers(0, 255))
    else:
        raw = bytes(
            data.draw(
                st.lists(st.integers(0, 255), max_size=80).map(bytearray)
            )
        )
    bad = tmp / "bad.npy"
    bad.write_bytes(bytes(raw))
    r = subprocess.run(
        [str(runner), "--npy-roundtrip", str(bad), str(tmp / "out.npy")],
        # binary capture: hostile header bytes echo into the diagnostic,
        # and text=True would make the HARNESS die on a utf-8 decode
        capture_output=True, timeout=30,
    )
    # Either the mutation kept it valid (rc 0) or it failed CLEANLY:
    # returncode 1 with a message, not a signal (negative returncode).
    assert r.returncode in (0, 1), (
        r.returncode, r.stderr.decode("utf-8", "replace"),
    )


@settings(max_examples=60, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
        max_size=80,
    )
)
def test_frontend_total_on_arbitrary_unicode(text):
    """text_to_ids is total: any unicode input yields a non-empty int id
    list within the vocab, never an exception (the serving admission path
    runs this on raw client text)."""
    from iris_tts_tpu.text.phonemes import PhonemeVocab

    tp = _cached_tp()
    vocab = PhonemeVocab.default_arpabet()
    ids = tp.text_to_ids(text, vocab)
    assert len(ids) >= 1
    assert all(0 <= int(i) < len(vocab) for i in ids)


@functools.cache
def _cached_tp():
    from iris_tts_tpu.text.frontend import create_text_processor

    return create_text_processor()


@settings(max_examples=50, deadline=None)
@given(data=st.data())
def test_wav_readers_reject_hostile_bytes(tmp_path_factory, data):
    """Truncations/mutations of a valid WAV must yield a clean Python
    exception (or a successful parse) from BOTH decoders — the native C++
    codec (in-process via ctypes: a memory bug here would crash the test
    process) and the pure-Python fallback. Never a crash or a hang."""
    from iris_tts_tpu.data.audio_io import read_wav, write_wav
    from iris_tts_tpu.data import native as native_mod

    tmp = tmp_path_factory.mktemp("wavfuzz")
    base = tmp / "base.wav"
    write_wav(base, np.linspace(-1, 1, 256).astype(np.float32), 8000)
    raw = bytearray(base.read_bytes())
    mode = data.draw(st.sampled_from(["truncate", "mutate", "garbage"]))
    if mode == "truncate":
        raw = raw[: data.draw(st.integers(0, len(raw) - 1))]
    elif mode == "mutate":
        i = data.draw(st.integers(0, min(60, len(raw) - 1)))
        raw[i] = data.draw(st.integers(0, 255))
    else:
        raw = bytearray(
            data.draw(st.lists(st.integers(0, 255), max_size=64))
        )
    bad = tmp / "bad.wav"
    bad.write_bytes(bytes(raw))

    for reader in (read_wav, native_mod.read_wav_mono):
        try:
            out = reader(bad)
        except (ValueError, RuntimeError, EOFError):
            continue  # clean rejection
        audio = out[0]
        assert np.asarray(audio).dtype == np.float32
        assert np.isfinite(np.asarray(audio)).all()


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_textgrid_parser_total_on_hostile_text(tmp_path_factory, data):
    """The dependency-free TextGrid parser: mutations/truncations of a
    valid file (and pure garbage) parse to a well-formed tier list or
    raise a clean ValueError — never an unhandled IndexError/KeyError or
    a hang (MFA output is external input to the training pipeline)."""
    from iris_tts_tpu.data.textgrid import parse_textgrid

    valid = '''File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 0.3
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 0.3
        intervals: size = 2
        intervals [1]:
            xmin = 0
            xmax = 0.1
            text = "HH"
        intervals [2]:
            xmin = 0.1
            xmax = 0.3
            text = "AH"
'''
    mode = data.draw(st.sampled_from(["truncate", "mutate", "garbage"]))
    if mode == "truncate":
        text = valid[: data.draw(st.integers(0, len(valid) - 1))]
    elif mode == "mutate":
        i = data.draw(st.integers(0, len(valid) - 1))
        ch = data.draw(st.characters(min_codepoint=32, max_codepoint=0x24F))
        text = valid[:i] + ch + valid[i + 1:]
    else:
        text = data.draw(st.text(max_size=200))
    try:
        tiers = parse_textgrid(text)
    except ValueError:
        return  # clean rejection
    for tier in tiers:
        assert isinstance(tier.name, str)
        for iv in tier.intervals:
            assert isinstance(iv.text, str)
            assert np.isfinite(iv.xmin) and np.isfinite(iv.xmax)
