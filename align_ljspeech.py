"""Offline MFA forced-alignment pipeline driver for LJSpeech.

Rebuild of /root/reference/align_ljspeech.py:86-162: build a speaker-wise
corpus of wav symlinks + .lab text files, download MFA models, and run
``mfa align`` (the external Kaldi tool stays an offline data-prep step —
SURVEY.md §2.3). Output TextGrids are then parsed + cached by the dataset
layer (iris_tts_tpu.data.textgrid).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from iris_tts_tpu.data.ljspeech import read_metadata
from iris_tts_tpu.data.textgrid import MFAAligner

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s - %(levelname)s - %(message)s")
logger = logging.getLogger(__name__)


def create_corpus(data_root: Path, corpus_dir: Path) -> int:
    """Symlink wavs + write .lab files under corpus/LJSpeech/ (MFA 3.x
    speaker-directory layout; reference align_ljspeech.py:22-46 +
    alignment.py:177-208)."""
    speaker = corpus_dir / "LJSpeech"
    speaker.mkdir(parents=True, exist_ok=True)
    metadata = read_metadata(data_root)
    n = 0
    for sid, text in metadata.items():
        wav = data_root / "wavs" / f"{sid}.wav"
        if not wav.exists():
            continue
        link = speaker / f"{sid}.wav"
        if not link.exists():
            link.symlink_to(wav.resolve())
        (speaker / f"{sid}.lab").write_text(text)
        n += 1
    logger.info("corpus: %d utterances in %s", n, speaker)
    return n


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_root", type=str, default="data/LJSpeech-1.1")
    parser.add_argument("--corpus_dir", type=str, default="data/corpus")
    parser.add_argument("--output_dir", type=str, default="data/aligned")
    parser.add_argument("--num_jobs", type=int, default=4)
    parser.add_argument("--skip_download", action="store_true")
    args = parser.parse_args()

    create_corpus(Path(args.data_root), Path(args.corpus_dir))
    aligner = MFAAligner()
    if not args.skip_download:
        logger.info("downloading MFA models (~2-3 GB first run)...")
        aligner.download_models()
    logger.info(
        "running mfa align (10-30 minutes for 13,100 files at -j %d)...",
        args.num_jobs,
    )
    aligner.align(args.corpus_dir, args.output_dir, num_jobs=args.num_jobs)
    logger.info("alignments in %s", args.output_dir)


if __name__ == "__main__":
    main()
