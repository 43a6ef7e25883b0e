"""Charset detection + UTF-8 conversion (E1: XmlDoc::getUtf8Content
XmlDoc.cpp:20110, iana_charset.cpp tables).

The reference resolves charset from (1) HTTP Content-Type header, (2) the
first 1KB of the doc's <meta http-equiv / charset=> declaration, (3) BOM,
then converts to UTF-8 via iconv.  This kernel covers the detection order
and the charsets the synthetic corpus + common web use (utf-8, latin-1,
windows-1252, ascii, utf-16 via BOM); anything else falls back to latin-1
(lossless byte mapping), matching the reference's "always produce valid
utf-8" contract.
"""

from __future__ import annotations

import re

_META_RE = re.compile(
    rb"""<meta[^>]{0,200}?charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""",
    re.IGNORECASE)
_CT_RE = re.compile(rb"charset\s*=\s*([A-Za-z0-9_\-]+)", re.IGNORECASE)

_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "iso8859-1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "us-ascii": "ascii", "ascii": "ascii",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}


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
            cs = m.group(1).decode("latin-1").lower()
            if cs in _ALIASES:
                return _ALIASES[cs]
    m = _META_RE.search(raw[:1024])
    if m:
        cs = m.group(1).decode("latin-1").lower()
        if cs in _ALIASES:
            return _ALIASES[cs]
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
