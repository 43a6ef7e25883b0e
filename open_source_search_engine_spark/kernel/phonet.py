"""Phonetic spell channel — the pronunciation-match side of
Speller::getRecommendation (Speller.cpp:263 generates "phonet" keys for
the query fragments; Language::getRecommendation weights phonetic
matches above plain popularity, Language.cpp:94-100,1385).

The reference derives its phonet keys from shipped dictionary data
files this rebuild does not carry, so the channel is restated as a
SIMPLIFIED SOUNDEX over the corpus vocabulary itself: same first
letter, consonant classes b f p v→1 / c g j k q s x z→2 / d t→3 /
l→4 / m n→5 / r→6, vowels+h w y→0, adjacent equal codes collapsed,
zeros dropped, zero-padded to letter + 3 digits.  (No classic h/w
separator rule — kept out so the key is expressible as the same
translate + regexp chain in Python, Spark Columns, and DuckDB SQL,
which RE2's lack of backreferences would otherwise block.)  This file
is the authoritative spec; plans/search.phonetic_key_col and the
search_spell DuckDB oracle restate it operation-for-operation.
"""

from __future__ import annotations

import re

# a..z → soundex digit class ('0' = vowel/h/w/y, dropped after collapse)
SOUNDEX_CODES = "01230120022455012623010202"
_ALPHABET = "abcdefghijklmnopqrstuvwxyz"
_TRANS = str.maketrans(_ALPHABET, SOUNDEX_CODES)


def phonetic_key(word: str) -> str:
    """Simplified-soundex key: UPPER first letter + 3 digits.  Words not
    starting with a letter key to '' (no phonetic channel for them)."""
    w = word.lower()
    if not w or w[0] not in _ALPHABET:
        return ""
    digits = w.translate(_TRANS)
    # keep only coded characters (non a-z chars vanish, like the
    # Column twin's translate-to-nothing)
    digits = "".join(c for c in digits if c in "0123456")
    tail = digits[1:]
    # collapse adjacent equal consonant codes, then drop the vowel
    # class ('0' runs need no collapse — every 0 is removed next, so
    # collapsing them first would be a no-op; keeping the loop to
    # 1-6 keeps the DuckDB twin to six nested regexp_replace)
    for d in "123456":
        tail = re.sub(d + "{2,}", d, tail)
    tail = tail.replace("0", "")
    return (w[0].upper() + tail + "000")[:4]
