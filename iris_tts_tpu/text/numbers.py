"""Deterministic number → words expansion for text normalization.

The reference delegates number/date/currency verbalisation to NeMo's
pynini/OpenFst WFST grammars (/root/reference/src/iris/text.py:69-77,111-117),
a C++ dependency that cannot run here. This module is a deterministic
rule-based verbaliser covering the classes LJSpeech-style English text needs:
cardinals, ordinals, decimals, negative numbers, currency ($, £, €), percents,
years, and clock times. It is pure host-side Python (normalization is
inherently a host stage — SURVEY.md §2.3).
"""

from __future__ import annotations

import re

_ONES = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = [
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
]
_SCALE = [
    (10**12, "trillion"),
    (10**9, "billion"),
    (10**6, "million"),
    (10**3, "thousand"),
    (10**2, "hundred"),
]

_ORDINAL_SPECIAL = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def number_to_words(n: int) -> str:
    """Cardinal verbalisation of a non-negative integer."""
    if n < 0:
        return "minus " + number_to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        tens, rem = divmod(n, 10)
        return _TENS[tens] + (" " + _ONES[rem] if rem else "")
    for value, name in _SCALE:
        if n >= value:
            major, rem = divmod(n, value)
            out = number_to_words(major) + " " + name
            if rem:
                out += " " + number_to_words(rem)
            return out
    return _ONES[0]  # unreachable


def ordinal_to_words(n: int) -> str:
    """Ordinal verbalisation ('3rd' → 'third', '21st' → 'twenty first')."""
    words = number_to_words(n)
    parts = words.split(" ")
    last = parts[-1]
    if last in _ORDINAL_SPECIAL:
        parts[-1] = _ORDINAL_SPECIAL[last]
    elif last.endswith("y"):
        parts[-1] = last[:-1] + "ieth"
    else:
        parts[-1] = last + "th"
    return " ".join(parts)


def year_to_words(n: int) -> str:
    """Year-style reading: 1984 → 'nineteen eighty four', 2007 → 'two
    thousand seven', 1900 → 'nineteen hundred'."""
    if 1000 <= n <= 9999:
        high, low = divmod(n, 100)
        if high % 10 == 0:
            # 2000/2007-style: read as a full cardinal ("two thousand
            # seven") — checked before the "X hundred" form so 2000 is not
            # "twenty hundred".
            return number_to_words(n)
        if low == 0:
            return number_to_words(high) + " hundred"
        if low < 10:
            return number_to_words(high) + " oh " + number_to_words(low)
        return number_to_words(high) + " " + number_to_words(low)
    return number_to_words(n)


def digits_to_words(s: str) -> str:
    """Digit-by-digit reading ('007' → 'zero zero seven')."""
    return " ".join(_ONES[int(c)] for c in s if c.isdigit())


def decimal_to_words(whole: str, frac: str) -> str:
    head = number_to_words(int(whole)) if whole else "zero"
    return head + " point " + digits_to_words(frac)


def _money_words(amount: str, unit: str, cent_unit: str) -> str:
    if "." in amount:
        whole, frac = amount.split(".")
        frac = (frac + "00")[:2]
    else:
        whole, frac = amount, ""
    whole_n = int(whole.replace(",", "")) if whole else 0
    out = number_to_words(whole_n) + " " + (unit if whole_n == 1 else unit + "s")
    cents = int(frac) if frac else 0
    if cents:
        out += (
            " and "
            + number_to_words(cents)
            + " "
            + (cent_unit if cents == 1 else cent_unit + "s")
        )
    return out


def time_to_words(h: int, m: int) -> str:
    if m == 0:
        return number_to_words(h) + " o'clock"
    if m < 10:
        return number_to_words(h) + " oh " + number_to_words(m)
    return number_to_words(h) + " " + number_to_words(m)


_CURRENCIES = {"$": ("dollar", "cent"), "£": ("pound", "penny"), "€": ("euro", "cent")}

_RE_CURRENCY = re.compile(r"([$£€])\s?(\d[\d,]*(?:\.\d+)?)")
_RE_PERCENT = re.compile(r"(\d[\d,]*(?:\.\d+)?)\s?%")
_RE_TIME = re.compile(r"\b(\d{1,2}):(\d{2})\b")
_RE_ORDINAL = re.compile(r"\b(\d+)(st|nd|rd|th)\b")
_RE_DECIMAL = re.compile(r"\b(\d+)\.(\d+)\b")
_RE_YEAR = re.compile(r"\b(1[1-9]\d\d|20\d\d)s?\b")
_RE_INT = re.compile(r"\b\d[\d,]*\b")


def expand_numbers(text: str) -> str:
    """Expand all supported numeric constructs in ``text`` to words."""

    def _currency(m: re.Match) -> str:
        unit, cent = _CURRENCIES[m.group(1)]
        return _money_words(m.group(2).replace(",", ""), unit, cent)

    def _percent(m: re.Match) -> str:
        amount = m.group(1).replace(",", "")
        if "." in amount:
            w, f = amount.split(".")
            return decimal_to_words(w, f) + " percent"
        return number_to_words(int(amount)) + " percent"

    def _time(m: re.Match) -> str:
        h, mi = int(m.group(1)), int(m.group(2))
        if h > 23 or mi > 59:
            return m.group(0)
        return time_to_words(h, mi)

    def _ordinal(m: re.Match) -> str:
        return ordinal_to_words(int(m.group(1)))

    def _decimal(m: re.Match) -> str:
        return decimal_to_words(m.group(1), m.group(2))

    def _year(m: re.Match) -> str:
        word = year_to_words(int(m.group(1)))
        if m.group(0).endswith("s"):  # decades: "1980s"
            if word.endswith("y"):
                word = word[:-1] + "ies"
            else:
                word += "s"
        return word

    def _int(m: re.Match) -> str:
        return number_to_words(int(m.group(0).replace(",", "")))

    text = _RE_CURRENCY.sub(_currency, text)
    text = _RE_PERCENT.sub(_percent, text)
    text = _RE_TIME.sub(_time, text)
    text = _RE_ORDINAL.sub(_ordinal, text)
    text = _RE_DECIMAL.sub(_decimal, text)
    text = _RE_YEAR.sub(_year, text)
    text = _RE_INT.sub(_int, text)
    return text
