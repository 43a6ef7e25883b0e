"""The reference's porn/spam URL detector with its FULL term data.

Reference: ``Url::isSpam`` (Url.cpp:1155-1184) splits the hostname (minus
TLD) on ``.`` and ``-`` and runs each segment through ``isAdult``
(Lang.cpp:467-676), a needle list with per-needle exception lists (so
"montanalinux.org" is not porn because of "anal", "sussex.ac.uk" not
because of "sex", ...).  Plus the host-level heuristics from
Url.cpp:1138-1154: ``edu``/``gov`` TLDs are exempt, and a >30-char host
with ≥4 hyphens is spam.

The term data below is the reference's live list transcribed verbatim
(Lang.cpp:472-676).  Deviation, documented: the reference additionally
runs a dictionary-based word splitter (g_speller.canSplitWords,
Url.cpp:1186-1230) to rescue hosts that split into clean dictionary words;
no dictionary ships in this container, so segments match on needles alone
(strictly more conservative — every reference-spam host is spam here).

Spark side: `functions/filters.py:is_spam_host_col` compiles the same
needle/exception table into Column expressions (contains() over the
dot/hyphen-split host) — no Python in the hot path.
"""

from __future__ import annotations

# unconditional needles (Lang.cpp:472-538)
SPAM_NEEDLES: tuple[str, ...] = (
    "upskirt", "downblouse", "adult", "shemale", "spank", "dildo",
    "shaved", "bdsm", "voyeur", "fisting", "escorts", "vibrator",
    "rgasm",  # 0rgasm
    "orgy", "orgies", "orgasm", "masturbat", "stripper", "lolita",
    "softcore", "whore", "slut", "smut", "tits", "lesbian", "swinger",
    "housewife", "housewive", "nude", "bondage", "centerfold", "incest",
    "pedophil", "pedofil", "horny", "pussy", "pussies", "penis",
    "vagina", "phuck", "blowjob", "gangbang", "xxx", "porn", "felch",
    "cunt", "bestial", "tranny", "beastial", "crotch",
)

# needle → exceptions: match needle UNLESS any exception substring present
# (Lang.cpp:540-676)
CONDITIONAL_NEEDLES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("kink", ("kinko",)),                     # the store
    ("sex", ("sext", "middlesex", "sussex", "essex", "deusex",
             "sexchange", "sexpress", "sexpert", "sexcel", "sexist",
             "sexile", "harassm", "sexperi", "transex", "sexual",
             "sexpo", "exoti", "sexclu")),
    ("anal", ("analog", "analy", "canal", "kanal", "banal")),
    ("cum", ("circum", "magn", "succu", "cumber", "docum", "cumul",
             "acumen", "cucum", "incum", "capsicum", "modicum", "locum",
             "scum", "accu")),
    ("clit", ("heraclitus",)),
    ("fuck", ("fuckedcomp",)),                # fuckedcompany.com
    ("boob", ("booboo",)),
    ("wank", ("swank",)),
    ("fick", ("fickle", "traffick")),         # german
    ("eroti", ("sclero",)),                   # sclerotic
    ("babe", ("toyland", "babel")),           # babelfish
    ("gay", ("gaylord",)),
)


def segment_is_adult(seg: str) -> bool:
    """isAdult(s) over one dot/hyphen segment (Lang.cpp:467)."""
    for n in SPAM_NEEDLES:
        if n in seg:
            return True
    for n, exceptions in CONDITIONAL_NEEDLES:
        if n in seg:
            if any(e in seg for e in exceptions):
                continue
            return True
    return False


def is_spam_host(host: str, tld: str) -> bool:
    """Url::isSpam over the hostname (Url.cpp:1138-1184).

    host minus ".tld"; edu/gov exempt; >30 chars with ≥4 hyphens → spam;
    else any dot/hyphen segment that isAdult → spam."""
    if tld.startswith("edu") or tld.startswith("gov"):
        return False
    s = host.lower()
    if tld and s.endswith("." + tld):
        s = s[: -(len(tld) + 1)]
    if len(s) > 30 and s.count("-") >= 4:
        return True
    for seg in s.replace("-", ".").split("."):
        if seg and segment_is_adult(seg):
            return True
    return False
