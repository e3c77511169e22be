"""Shared synthetic mini-LJSpeech corpus builder for tests."""

from pathlib import Path

import numpy as np

from iris_tts_tpu.data.audio_io import write_wav


def build_mini_corpus(root_dir: Path, n: int = 10, seed: int = 1337):
    """Create an LJSpeech-shaped corpus (wavs + metadata.csv) and MFA-style
    TextGrid alignments. Returns (corpus_root, alignment_dir)."""
    rng = np.random.default_rng(seed)
    root = Path(root_dir) / "LJSpeech-1.1"
    (root / "wavs").mkdir(parents=True, exist_ok=True)
    align_dir = Path(root_dir) / "aligned"
    align_dir.mkdir(parents=True, exist_ok=True)
    sr = 22050
    meta = []
    for i in range(n):
        sid = f"LJ001-{i:04d}"
        phones = ["HH", "AH", "L", "OW", "W"][: 3 + i % 3]
        dur = 0.08 + 0.01 * (i % 4)
        total = len(phones) * dur
        audio = (0.1 * rng.standard_normal(int(total * sr) + 512)).astype(
            np.float32
        )
        write_wav(root / "wavs" / f"{sid}.wav", audio, sr)
        meta.append(f"{sid}|Text {i}|Text {i}")
        intervals = "\n".join(
            f"""        intervals [{j + 1}]:
            xmin = {j * dur}
            xmax = {(j + 1) * dur}
            text = "{p}" """
            for j, p in enumerate(phones)
        )
        (align_dir / f"{sid}.TextGrid").write_text(
            f"""File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = {total}
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = {total}
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = {total}
            text = "word"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = {total}
        intervals: size = {len(phones)}
{intervals}
"""
        )
    (root / "metadata.csv").write_text("\n".join(meta))
    return root, align_dir


def assert_audio_equal(got, want, lsb: int = 1) -> None:
    """Waveform equality across two differently-shaped executables.

    On CPU the XLA executables for a full pass and a windowed pass produce
    bit-identical samples, so equality is exact. On accelerator backends a
    different executable shape may legally order float reductions
    differently (measured on the v5e tunnel backend: max-abs 5.5e-12 on a
    2.1e-5-scale waveform, ~3e-7 relative), so float audio is compared at
    1e-5 of the reference peak — still orders of magnitude below any real
    windowing/alignment bug, which shows up at O(peak) — and int16 audio
    may differ by ``lsb`` quantization steps where the underlying float
    sat on a rounding boundary.
    """
    import jax

    got = np.asarray(got)
    want = np.asarray(want)
    assert got.shape == want.shape, (got.shape, want.shape)
    assert got.dtype == want.dtype, (got.dtype, want.dtype)
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(got, want)
    elif got.dtype == np.int16:
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= lsb, f"int16 audio off by {diff.max()} LSB"
    else:
        scale = float(np.max(np.abs(want))) or 1.0
        np.testing.assert_allclose(got, want, rtol=0.0, atol=1e-5 * scale)
