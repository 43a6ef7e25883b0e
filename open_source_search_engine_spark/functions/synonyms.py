"""Built-in English synonym dictionary for query expansion (G6).

The reference ships a dictionary-driven Speller (Speller.cpp:2251 loads
unified.txt; Synonyms.cpp expands query terms from it).  That data file
is not part of the source tree, so this rebuild ships a compact
hand-curated general-English synonym table (public-knowledge word lists,
no reference data) as the DEFAULT dictionary — callers can still pass
their own (plans/querylang.parse(synonyms=...)), which mirrors how the
reference lets collections override the dict.

Groups are symmetric: every word in a group expands to the others.  The
table is deliberately small (fits in a broadcast literal; the reference
keeps its dict memory-mapped per host for the same always-hot reason).
"""

from __future__ import annotations

# Each tuple is a mutual-synonym group.
_GROUPS: tuple[tuple[str, ...], ...] = (
    ("fast", "quick", "rapid", "speedy"),
    ("slow", "sluggish"),
    ("big", "large", "huge"),
    ("small", "little", "tiny"),
    ("data", "information"),
    ("search", "query", "lookup"),
    ("error", "fault", "bug"),
    ("begin", "start", "commence"),
    ("end", "finish", "conclude"),
    ("buy", "purchase"),
    ("sell", "vend"),
    ("car", "auto", "automobile"),
    ("house", "home", "residence"),
    ("job", "work", "employment"),
    ("movie", "film"),
    ("picture", "photo", "image"),
    ("street", "road"),
    ("doctor", "physician"),
    ("lawyer", "attorney"),
    ("shop", "store"),
    ("cheap", "inexpensive"),
    ("costly", "expensive"),
    ("happy", "glad", "joyful"),
    ("sad", "unhappy"),
    ("smart", "clever", "intelligent"),
    ("easy", "simple"),
    ("hard", "difficult"),
    ("new", "novel", "fresh"),
    ("old", "ancient"),
    ("correct", "right", "accurate"),
    ("wrong", "incorrect"),
    ("help", "assist", "aid"),
    ("make", "build", "construct"),
    ("use", "utilize"),
    ("show", "display"),
    ("find", "locate", "discover"),
    ("delete", "remove", "erase"),
    ("change", "modify", "alter"),
    ("choose", "select", "pick"),
    ("need", "require"),
    ("get", "obtain", "acquire"),
    ("keep", "retain"),
    ("stop", "halt", "cease"),
    ("talk", "speak"),
    ("answer", "reply", "response"),
    ("question", "inquiry"),
    ("world", "globe"),
    ("country", "nation"),
    ("city", "town"),
    ("kid", "child"),
    ("money", "cash", "currency"),
    ("price", "cost"),
    ("free", "gratis"),
    ("ill", "sick"),
    ("strong", "powerful"),
    ("weak", "feeble"),
    ("famous", "renowned"),
    ("often", "frequently"),
    ("near", "close", "nearby"),
    ("far", "distant"),
    ("story", "tale"),
    ("book", "volume"),
    ("song", "tune"),
    ("teacher", "instructor"),
    ("student", "pupil"),
    ("food", "cuisine"),
    ("drink", "beverage"),
    ("journey", "trip", "voyage"),
    ("weather", "climate"),
    ("ocean", "sea"),
    ("hill", "mound"),
    ("forest", "woods"),
    ("rock", "stone"),
    ("rain", "rainfall"),
    ("wind", "breeze"),
    ("fire", "blaze"),
    ("water", "aqua"),
    ("earth", "soil", "ground"),
    ("sky", "heavens"),
)


def build_dictionary() -> dict[str, list[str]]:
    """word → other members of its group(s)."""
    out: dict[str, list[str]] = {}
    for group in _GROUPS:
        for w in group:
            out.setdefault(w, [])
            for other in group:
                if other != w and other not in out[w]:
                    out[w].append(other)
    return out


DEFAULT_DICTIONARY = build_dictionary()
