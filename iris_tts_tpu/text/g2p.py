"""Rule-based grapheme-to-phoneme fallback for out-of-lexicon words.

The reference uses the g2p_en neural G2P package for OOV words
(/root/reference/src/iris/text.py:186-190) with a character fallback. g2p_en
is not available here, so this module implements a deterministic
letter-to-sound rule engine (longest-match contextual rules in the spirit of
the classic NRL ruleset). It is a *fallback* — lexicon entries always win —
so coverage beats elegance; every output symbol is valid ARPABET.
"""

from __future__ import annotations

import re
from typing import List

# Rules are (pattern, phones) tried longest-first at each position, with a
# few context-sensitive special cases handled in code. Patterns are on
# lowercase letters.
_DIGRAPHS = [
    ("tion", ["SH", "AH", "N"]),
    ("sion", ["ZH", "AH", "N"]),
    ("ough", ["AO"]),
    ("augh", ["AE", "F"]),
    ("eigh", ["EY"]),
    ("igh", ["AY"]),
    ("tch", ["CH"]),
    ("dge", ["JH"]),
    ("sch", ["S", "K"]),
    ("ai", ["EY"]),
    ("ay", ["EY"]),
    ("au", ["AO"]),
    ("aw", ["AO"]),
    ("ea", ["IY"]),
    ("ee", ["IY"]),
    ("ei", ["EY"]),
    ("eu", ["UW"]),
    ("ew", ["UW"]),
    ("ey", ["IY"]),
    ("ie", ["IY"]),
    ("oa", ["OW"]),
    ("oe", ["OW"]),
    ("oi", ["OY"]),
    ("oy", ["OY"]),
    ("oo", ["UW"]),
    ("ou", ["AW"]),
    ("ow", ["OW"]),
    ("ue", ["UW"]),
    ("ui", ["UW"]),
    ("ch", ["CH"]),
    ("ck", ["K"]),
    ("gh", ["G"]),
    ("ng", ["NG"]),
    ("ph", ["F"]),
    ("qu", ["K", "W"]),
    ("sh", ["SH"]),
    ("th", ["TH"]),
    ("wh", ["W"]),
    ("wr", ["R"]),
    ("kn", ["N"]),
    ("mb$", ["M"]),
    ("ps", ["S"]),
]

_SINGLE = {
    "a": ["AE"],
    "b": ["B"],
    "c": ["K"],
    "d": ["D"],
    "e": ["EH"],
    "f": ["F"],
    "g": ["G"],
    "h": ["HH"],
    "i": ["IH"],
    "j": ["JH"],
    "k": ["K"],
    "l": ["L"],
    "m": ["M"],
    "n": ["N"],
    "o": ["AA"],
    "p": ["P"],
    "q": ["K"],
    "r": ["R"],
    "s": ["S"],
    "t": ["T"],
    "u": ["AH"],
    "v": ["V"],
    "w": ["W"],
    "x": ["K", "S"],
    "y": ["Y"],
    "z": ["Z"],
}

# Long-vowel variants used for magic-e ("make" → M EY K).
_LONG_VOWEL = {"a": "EY", "e": "IY", "i": "AY", "o": "OW", "u": "UW"}
_VOWELS = set("aeiou")

# Letter names for acronym spelling.
_LETTER_NAMES = {
    "a": ["EY"], "b": ["B", "IY"], "c": ["S", "IY"], "d": ["D", "IY"],
    "e": ["IY"], "f": ["EH", "F"], "g": ["JH", "IY"], "h": ["EY", "CH"],
    "i": ["AY"], "j": ["JH", "EY"], "k": ["K", "EY"], "l": ["EH", "L"],
    "m": ["EH", "M"], "n": ["EH", "N"], "o": ["OW"], "p": ["P", "IY"],
    "q": ["K", "Y", "UW"], "r": ["AA", "R"], "s": ["EH", "S"],
    "t": ["T", "IY"], "u": ["Y", "UW"], "v": ["V", "IY"],
    "w": ["D", "AH", "B", "AH", "L", "Y", "UW"], "x": ["EH", "K", "S"],
    "y": ["W", "AY"], "z": ["Z", "IY"],
}


def spell_out(word: str) -> List[str]:
    """Acronym reading: each letter by name ('tpu' → T IY . P IY . Y UW)."""
    phones: List[str] = []
    for ch in word.lower():
        phones.extend(_LETTER_NAMES.get(ch, []))
    return phones


def g2p(word: str) -> List[str]:
    """Convert one lowercase word to ARPABET phonemes by rule."""
    word = re.sub(r"[^a-z]", "", word.lower())
    if not word:
        return []

    phones: List[str] = []
    i = 0
    n = len(word)
    while i < n:
        matched = False

        # Final magic-e: C V C e$ → long vowel, silent e.
        if (
            i + 2 < n
            and word[i] in _VOWELS
            and word[i + 1] not in _VOWELS
            and i + 3 == n
            and word[i + 2] == "e"
            and word[i + 1] not in "wxy"
        ):
            phones.append(_LONG_VOWEL[word[i]])
            phones.extend(_SINGLE[word[i + 1]])
            i += 3
            continue

        # Silent final e.
        if word[i] == "e" and i + 1 == n and len(phones) >= 2:
            i += 1
            continue

        # Soft c/g before e/i/y: emit the soft consonant but consume ONLY
        # the c/g — the vowel still gets its own phoneme ('cent' → S EH N T,
        # not S N T).
        if word[i] == "c" and i + 1 < n and word[i + 1] in "eiy":
            phones.append("S")
            i += 1
            continue
        if word[i] == "g" and i + 1 < n and word[i + 1] in "eiy":
            phones.append("JH")
            i += 1
            continue

        # Final y is a vowel ('fancy' → ... S IY).
        if word[i] == "y" and i + 1 == n and phones:
            phones.append("IY")
            i += 1
            continue

        # r-colored vowels: ar/er/ir/or/ur.
        if i + 1 < n and word[i] in _VOWELS and word[i + 1] == "r":
            colored = {
                "a": ["AA", "R"],
                "e": ["ER"],
                "i": ["ER"],
                "o": ["AO", "R"],
                "u": ["ER"],
            }[word[i]]
            phones.extend(colored)
            i += 2
            continue

        for pat, ph in _DIGRAPHS:
            if pat.endswith("$"):
                core = pat[:-1]
                if word.startswith(core, i) and i + len(core) == n:
                    phones.extend(ph)
                    i += len(core)
                    matched = True
                    break
            elif word.startswith(pat, i):
                phones.extend(ph)
                i += len(pat)
                matched = True
                break
        if matched:
            continue

        phones.extend(_SINGLE.get(word[i], []))
        i += 1

    return phones
