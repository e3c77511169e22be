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
