"""URL quality flags: link-loop and spam-substring detection + title
extraction.

- ``is_link_loop``  — Url::isLinkLoop (Url.cpp:1675-1723): count repeated
  path components; a component seen ≥3 times, or two distinct components
  each seen twice back-to-back, is a crawler trap.
- ``is_spam_url``   — Url::isSpam (Url.cpp:1138-1999) is an adult-term
  substring scan with word-boundary heuristics over host+path.  We keep
  the *mechanism* (broadcast needle list, boundary-aware scan) with a
  configurable needle list; the reference's full list is data, load your
  own for production parity.
- ``get_title``     — Title.cpp essence: first <title> text node, entity-
  decoded, whitespace-collapsed (query/serving tier E11).
- ``make_summary``  — Summary.cpp essence: best window of visible text
  around query terms, else leading text.
"""

from __future__ import annotations

from . import extract, urlnorm
from .spamwords import is_spam_host  # noqa: F401  (re-export)

DEFAULT_SPAM_NEEDLES = (
    # representative adult/spam fragments (mechanism demo; the full
    # reference term table lives in kernel/spamwords.py)
    "porn", "xxx", "sex", "viagra", "casino", "escort",
)


def is_link_loop(url: str) -> bool:
    """Repeated-path-component trap detection (Url.cpp:1675)."""
    path_start = url.find("://")
    path_start = url.find("/", path_start + 3 if path_start >= 0 else 0)
    if path_start < 0:
        return False
    counts: dict[str, int] = {}
    doubles = 0
    prev_was_double = False
    components = 0
    comps = url[path_start:].split("/")
    for comp in comps[1:-1]:  # components between slashes
        components += 1
        if components > 50:
            return False
        val = counts.get(comp, 0) + 1
        counts[comp] = val
        if val >= 3:
            return True
        if val == 2:
            doubles += 1
            if doubles >= 2 and prev_was_double:
                return True
            prev_was_double = True
        else:
            prev_was_double = False
    return False


def is_spam_url(url: str, needles=DEFAULT_SPAM_NEEDLES) -> bool:
    """Substring scan over lowercase host+path (Url::isSpam mechanism).
    For the reference's full host-segment semantics + term data use
    ``spamwords.is_spam_host(host, tld)``."""
    u = url.lower()
    return any(n in u for n in needles)


def is_permalink(url: str) -> bool:
    """isPermalinky (Url.cpp:2236-2266): the path (before ``?``) contains
    3+ consecutive digits, or 2+ hyphens/underscores within a single path
    component."""
    path = urlnorm.get_path_cgi(url)
    dcount = 0
    for ch in path:
        if ch == "?":
            break
        if ch.isdigit():
            dcount += 1
            if dcount == 3:
                return True
        else:
            dcount = 0
    hcount = 0
    for ch in path:
        if ch == "?":
            break
        if ch == "/":
            hcount = 0
            continue
        if ch in "-_":
            hcount += 1
            if hcount == 2:
                return True
    return False


def is_rss_ext(url: str) -> bool:
    """Url::isRSSFormat (Url.cpp:2268-2284): path extension is
    rss/xml/rdf, except wlwmanifest/foaf paths."""
    path = urlnorm.get_path_cgi(url).split("?")[0]
    last = path.rsplit("/", 1)[-1]
    if "." not in last:
        return False
    ext = last.rsplit(".", 1)[-1].lower()
    if ext not in ("rss", "xml", "rdf"):
        return False
    if "wlwmanifest" in path or "foaf" in path:
        return False
    return True


def is_ping_server(url: str) -> bool:
    """isPingServer (Url.cpp:2297-2305): weblogs.com-style ping endpoints
    (the reference needles rpc.weblogs.com/shortChanges.xml)."""
    return "rpc.weblogs.com/" in url


def get_title(html: str, max_len: int = 256) -> str:
    """First <title> body, entity-decoded, whitespace-collapsed."""
    nodes = extract.tokenize(html)
    for i, nd in enumerate(nodes):
        if nd.kind == "tag" and nd.name == "title" and nd.is_front:
            if i + 1 < len(nodes) and nodes[i + 1].kind == "text":
                t = html[nodes[i + 1].start: nodes[i + 1].end]
                t = extract.html_decode(t)
                return " ".join(t.split())[:max_len]
            return ""
    return ""


def best_sentence(text: str, terms: list[str]) -> tuple[int, str, int]:
    """Sentence-granularity restatement of Summary::getBestWindow
    (Summary.cpp:656): split visible text on '. ', score each sentence by
    the NUMBER OF DISTINCT query terms it contains (the reference's
    match-diversity component), pick the highest score, earliest sentence
    on ties; score 0 falls back to the leading sentence (the essence
    behaviour above).  Returns (index, sentence, score).

    This is the shared spec for the Spark serving tier
    (plans/serving.py) and its DuckDB oracle — substring containment on
    the lowercased sentence, literal '. ' split, no regex."""
    sents = text.split(". ")
    best = (0, sents[0] if sents else "", 0)
    for i, s in enumerate(sents):
        low = s.lower()
        score = sum(1 for t in terms if t.lower() in low)
        if score > best[2]:
            best = (i, s, score)
    return best


WINDOW_TOKENS = 12


def best_window(text: str, terms: list[str],
                w: int = WINDOW_TOKENS) -> tuple[int, str, int]:
    """TOKEN-window restatement of Summary::getBestWindow
    (Summary.cpp:656) — the round-5 upgrade of :func:`best_sentence`:
    slide a ``w``-token window over the whitespace token array, score
    each window by the NUMBER OF DISTINCT query terms it contains (the
    reference's match-diversity component), highest score wins,
    earliest window on ties; score 0 falls back to the leading window.
    Unlike the sentence form, a best region spanning a sentence
    boundary — or buried mid-sentence in a long sentence — is found.
    Returns (start_index, window_text, score); start_index is 0-based.

    Shared spec for the Spark serving tier (plans/serving.py
    best_windows: split(' ') + sequence + slice + concat_ws) and the
    DuckDB oracle (string_split + generate_series + list slicing) —
    substring containment on the lowercased window, literal ' ' split,
    no regex."""
    toks = text.split(" ")
    best = (0, " ".join(toks[:w]), 0)
    for i in range(max(1, len(toks) - w + 1)):
        win = " ".join(toks[i:i + w])
        low = win.lower()
        score = sum(1 for t in terms if t.lower() in low)
        if score > best[2]:
            best = (i, win, score)
    return best


def highlight(text: str, terms: list[str]) -> str:
    """Highlight::set analog (Highlight.cpp:359): wrap every
    word-boundary occurrence of a query term in <b></b>, case preserved,
    case-insensitive match."""
    import re as _re
    if not terms:
        return text
    pat = "(?i)\\b(" + "|".join(_re.escape(t) for t in terms) + ")\\b"
    return _re.sub(pat, r"<b>\1</b>", text)


def make_summary(html: str, query_terms: list[str] | None = None,
                 max_len: int = 200) -> str:
    """Snippet: window of visible text around the first query-term hit,
    else the leading visible text (Summary.cpp essence)."""
    text = " ".join(extract.get_text(html).split())
    if not text:
        return ""
    if query_terms:
        low = text.lower()
        for term in query_terms:
            pos = low.find(term.lower())
            if pos >= 0:
                start = max(0, pos - max_len // 3)
                return text[start: start + max_len]
    return text[:max_len]
