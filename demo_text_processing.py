"""Text frontend demo: normalization, G2P, vocabulary building.

Rebuild of /root/reference/demo_text_processing.py:40-146 on the
dependency-free frontend (rule normalizer + lexicon + rule G2P).
"""

from __future__ import annotations

import argparse

from iris_tts_tpu.text import PhonemeVocab, create_text_processor

DEMO_SENTENCES = [
    "Hello world, this is a test.",
    "Dr. Smith paid $12.50 on January 3, 1984.",
    "The meeting is at 10:30 and covers 25% of the agenda.",
    "Mr. Jones bought 1,234 apples for his co. in 2007.",
    "She said: “It's the 3rd time!”",
]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--lexicon_path", type=str, default=None)
    parser.add_argument("--text", type=str, default=None)
    args = parser.parse_args()

    tp = create_text_processor(lexicon_path=args.lexicon_path)
    sentences = [args.text] if args.text else DEMO_SENTENCES

    print("=" * 70)
    print("1. Text normalization")
    print("=" * 70)
    for s in sentences:
        print(f"  in : {s}")
        print(f"  out: {tp.normalize_text(s)}\n")

    print("=" * 70)
    print("2. Grapheme-to-phoneme")
    print("=" * 70)
    for s in sentences:
        print(f"  {s}")
        print(f"  → {tp.text_to_phonemes(s)}\n")

    print("=" * 70)
    print("3. OOV fallback (rule G2P)")
    print("=" * 70)
    for word in ["zorblax", "brillig", "slithy", "cromulent"]:
        print(f"  {word} → {' '.join(tp.word_to_phonemes(word))}")

    print()
    print("=" * 70)
    print("4. Vocabulary")
    print("=" * 70)
    p2i, i2p = tp.create_phoneme_mapping(sentences)
    print(f"  mapping size: {len(p2i)} (specials: "
          f"{[i2p[i] for i in range(4)]})")
    vocab = PhonemeVocab.default_arpabet()
    ids = tp.text_to_ids(sentences[0], vocab)
    print(f"  '{sentences[0]}' → {list(ids)}")


if __name__ == "__main__":
    main()
