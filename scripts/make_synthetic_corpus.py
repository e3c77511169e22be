"""Generate the formant-synthesized training corpus (LJSpeech layout).

The environment cannot fetch LJSpeech (zero egress), so the full training
workflow (reference: scripts/train_vae.py:109-568 presumes LJSpeech + MFA
TextGrids) runs against this generator's corpus instead: real English
sentences rendered by a Klatt-style formant synthesizer with exact
ground-truth alignments (iris_tts_tpu/data/synthetic_speech.py).

Usage:
    python scripts/make_synthetic_corpus.py --root data_synth --n 600
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from iris_tts_tpu.data.synthetic_speech import CorpusSpec, generate_corpus
from scripts.common import setup_logging


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", type=str, default="data_synth")
    parser.add_argument("--n", type=int, default=600)
    parser.add_argument("--seed", type=int, default=1337)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()
    setup_logging(args.verbose)

    root, align = generate_corpus(
        args.root, CorpusSpec(n_utterances=args.n, seed=args.seed)
    )
    print(f"corpus: {root}")
    print(f"alignments: {align}")


if __name__ == "__main__":
    main()
