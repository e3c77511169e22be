"""ARPABET pronunciation lexicon (CMUdict-format loader + built-in core).

The reference loads CMUdict through nltk (/root/reference/src/iris/text.py:
83-92) and also ships a raw ``data/cmu_dict.txt``. Here the lexicon is a plain
host-side hash table built from any CMUdict-format file (``WORD  PH1 PH2 ...``
with ``WORD(2)`` variants and ``;;;`` comments), plus a small built-in core
vocabulary so the frontend works out of the box without external downloads.
Out-of-lexicon words fall back to :mod:`iris_tts_tpu.text.g2p`.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, List, Optional

_STRESS_RE = re.compile(r"[0-2]")

# The 39 ARPABET phonemes (stress-stripped CMUdict symbol set).
ARPABET = [
    "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH", "ER",
    "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG", "OW",
    "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W", "Y", "Z",
    "ZH",
]

# Small built-in core lexicon (hand-written entries for very common words and
# the demo sentences) so the system runs with zero external data files.
_BUILTIN_ENTRIES = """
a AH
an AE N
and AE N D
are AA R
as AE Z
at AE T
be B IY
but B AH T
by B AY
can K AE N
do D UW
for F AO R
from F R AH M
had HH AE D
has HH AE Z
have HH AE V
he HH IY
hello HH AH L OW
her HH ER
his HH IH Z
how HH AW
i AY
if IH F
in IH N
is IH Z
it IH T
me M IY
my M AY
no N OW
not N AA T
of AH V
on AA N
one W AH N
or AO R
our AW ER
she SH IY
so S OW
speech S P IY CH
test T EH S T
text T EH K S T
that DH AE T
the DH AH
this DH IH S
to T UW
was W AA Z
we W IY
were W ER
what W AH T
when W EH N
which W IH CH
who HH UW
will W IH L
with W IH DH
world W ER L D
you Y UW
your Y AO R
"""


def strip_stress(phoneme: str) -> str:
    """Remove stress digits ('AH0' → 'AH'); reference text.py:196-198."""
    return _STRESS_RE.sub("", phoneme)


class Lexicon:
    """Word → ARPABET pronunciation table."""

    def __init__(self, entries: Optional[Dict[str, List[str]]] = None):
        self._table: Dict[str, List[str]] = {}
        for line in _BUILTIN_ENTRIES.strip().splitlines():
            parts = line.split()
            self._table[parts[0]] = parts[1:]
        if entries:
            self._table.update(entries)

    @classmethod
    def from_cmudict_file(
        cls, path: str | Path, keep_stress: bool = False
    ) -> "Lexicon":
        """Parse a CMUdict-format file.

        Lines look like ``WORD  P1 P2 ...`` or ``WORD(2)  P1 ...`` for
        alternate pronunciations (first pronunciation wins, matching the
        reference's ``cmudict[word][0]`` at text.py:177-183). Comment lines
        start with ``;;;``.
        """
        lex = cls()
        raw = Path(path).read_text(encoding="latin-1")
        for line in raw.splitlines():
            line = line.strip()
            if not line or line.startswith(";;;") or line.startswith("##"):
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            word = parts[0].lower()
            if "(" in word:  # alternate pronunciation — first one wins
                continue
            phones = parts[1:]
            if not keep_stress:
                phones = [strip_stress(p) for p in phones]
            # Keep only plausible ARPABET symbols.
            if all(strip_stress(p) in _ARPABET_SET for p in phones):
                lex._table.setdefault(word, phones)
        return lex

    def lookup(self, word: str) -> Optional[List[str]]:
        return self._table.get(word.lower())

    def add(self, word: str, phones: List[str]) -> None:
        self._table[word.lower()] = list(phones)

    def __contains__(self, word: str) -> bool:
        return word.lower() in self._table

    def __len__(self) -> int:
        return len(self._table)


_ARPABET_SET = frozenset(ARPABET)
