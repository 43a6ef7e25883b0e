"""Charset detection + UTF-8 conversion (E1: XmlDoc::getUtf8Content
XmlDoc.cpp:20110, iana_charset.cpp tables).

The reference resolves charset from (1) HTTP Content-Type header, (2) the
first 1KB of the doc's <meta http-equiv / charset=> declaration, (3) BOM,
then converts to UTF-8 via iconv over its generated IANA alias tables
(iana_charset.cpp, ~9k LoC of name→converter rows).  Python's ``codecs``
registry already carries the same IANA names and aliases, so instead of
porting the generated table we resolve any declared charset through
``codecs.lookup`` plus a small override map for web-specific spellings
Python does not alias (x-sjis, ks_c_5601-1987, windows-874, iso-8859-8-i,
…) — this covers the shift-jis/gb2312/koi8/euc-kr/iso-8859-* space real
Common-Crawl HTML declares.  Anything unresolvable falls back to latin-1
(lossless byte mapping), matching the reference's "always produce valid
utf-8" contract.
"""

from __future__ import annotations

import codecs
import re

_META_RE = re.compile(
    rb"""<meta[^>]{0,200}?charset\s*=\s*["']?\s*([A-Za-z0-9_.:\-]+)""",
    re.IGNORECASE)
_CT_RE = re.compile(rb"charset\s*=\s*([A-Za-z0-9_.:\-]+)", re.IGNORECASE)

_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "iso8859-1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "us-ascii": "ascii", "ascii": "ascii",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}

# web-specific IANA spellings the Python codec registry does not alias
# (iana_charset.cpp rows for the same names)
_OVERRIDES = {
    "x-sjis": "shift_jis", "shift-jis": "shift_jis",
    "ks_c_5601-1987": "cp949", "ksc5601": "cp949", "ks_c_5601": "cp949",
    "iso-8859-8-i": "iso-8859-8",
    "windows-874": "cp874", "dos-874": "cp874", "tis620": "tis-620",
    "x-mac-cyrillic": "mac_cyrillic", "macintosh": "mac_roman",
    "x-mac-roman": "mac_roman",
    "x-euc": "euc_jp", "x-euc-jp": "euc_jp",
    "gb_2312-80": "gb2312", "x-gbk": "gbk", "gb-2312": "gb2312",
    "iso-latin-1": "latin-1",
    "visual": "iso-8859-8", "logical": "iso-8859-8",
    "none": "latin-1", "default": "latin-1", "unknown": "latin-1",
    "8859_1": "latin-1", "8859-1": "latin-1",
}


def resolve_charset(name: str) -> str | None:
    """IANA charset name/alias → Python codec name (iana_charset.cpp
    get_iana_charset analog); None if unknown."""
    cs = name.lower().strip()
    if cs in _ALIASES:
        return _ALIASES[cs]
    if cs in _OVERRIDES:
        return _OVERRIDES[cs]
    try:
        codecs.lookup(cs)
        return cs
    except (LookupError, ValueError):
        return None


def detect_charset(raw: bytes, content_type: str | None = None) -> str:
    """Detection order: BOM → HTTP header → <meta> in first 1024 bytes →
    utf-8 heuristic → latin-1."""
    if raw[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if raw[:2] == b"\xff\xfe":
        return "utf-16-le"
    if raw[:2] == b"\xfe\xff":
        return "utf-16-be"
    if content_type:
        m = _CT_RE.search(content_type.encode("latin-1", "ignore"))
        if m:
            cs = resolve_charset(m.group(1).decode("latin-1"))
            if cs:
                return cs
    m = _META_RE.search(raw[:1024])
    if m:
        cs = resolve_charset(m.group(1).decode("latin-1"))
        if cs:
            return cs
    try:
        raw.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def to_utf8(raw: bytes, content_type: str | None = None) -> str:
    cs = detect_charset(raw, content_type)
    try:
        return raw.decode(cs)
    except (UnicodeDecodeError, LookupError):
        return raw.decode("latin-1", "replace")
