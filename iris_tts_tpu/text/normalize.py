"""English text normalization (host-side frontend stage).

Replaces the reference's NeMo/pynini WFST normalizer + lowercase fallback
(/root/reference/src/iris/text.py:94-130) with a deterministic rule engine:
abbreviation expansion, number/currency/date verbalisation
(:mod:`iris_tts_tpu.text.numbers`), unicode cleanup, and whitespace collapse.
The output feeds the lexicon/G2P stage.
"""

from __future__ import annotations

import re
import unicodedata

from iris_tts_tpu.text.numbers import expand_numbers

# Title/unit abbreviations, matched case-sensitively with trailing period
# where customary. Expanded before lowercasing so "Dr." vs "dr" is unambiguous.
_ABBREVIATIONS = [
    # No trailing \b: the patterns end in a literal '.', and \b cannot match
    # between '.' and whitespace.
    (re.compile(rf"\b{abbr}", re.IGNORECASE), full)
    for abbr, full in [
        (r"mrs\.", "missus"),
        (r"mr\.", "mister"),
        (r"dr\.", "doctor"),
        (r"st\.", "saint"),
        (r"co\.", "company"),
        (r"jr\.", "junior"),
        (r"sr\.", "senior"),
        (r"maj\.", "major"),
        (r"gen\.", "general"),
        (r"drs\.", "doctors"),
        (r"rev\.", "reverend"),
        (r"lt\.", "lieutenant"),
        (r"hon\.", "honorable"),
        (r"sgt\.", "sergeant"),
        (r"capt\.", "captain"),
        (r"esq\.", "esquire"),
        (r"ltd\.", "limited"),
        (r"col\.", "colonel"),
        (r"ft\.", "fort"),
        (r"etc\.", "et cetera"),
        (r"vs\.", "versus"),
        (r"no\.\s?(?=\d)", "number "),
    ]
]

_MONTHS = (
    "january|february|march|april|may|june|july|august|september|october|"
    "november|december"
)
# "January 5" / "January 5, 1984" style dates → ordinal day reading.
_RE_MONTH_DAY = re.compile(
    rf"\b({_MONTHS})\s+(\d{{1,2}})(st|nd|rd|th)?\b", re.IGNORECASE
)

_UNICODE_MAP = {
    "‘": "'", "’": "'", "“": '"', "”": '"',
    "–": "-", "—": " - ", "…": "...", " ": " ",
}


def collapse_whitespace(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def _expand_dates(text: str) -> str:
    from iris_tts_tpu.text.numbers import ordinal_to_words

    def repl(m: re.Match) -> str:
        day = int(m.group(2))
        if not 1 <= day <= 31:
            return m.group(0)
        return f"{m.group(1)} {ordinal_to_words(day)}"

    return _RE_MONTH_DAY.sub(repl, text)


def normalize_text(text: str) -> str:
    """Full normalization: unicode cleanup → abbreviations → dates →
    numbers/currency → lowercase → whitespace collapse.

    The contract matches the reference's ``TextProcessor.normalize_text``
    (text.py:94-130): output is lowercase with collapsed whitespace, with all
    numeric constructs verbalised.
    """
    for src, dst in _UNICODE_MAP.items():
        text = text.replace(src, dst)
    text = unicodedata.normalize("NFKC", text)
    for pattern, full in _ABBREVIATIONS:
        text = pattern.sub(full, text)
    text = _expand_dates(text)
    text = expand_numbers(text)
    text = text.lower()
    return collapse_whitespace(text)
