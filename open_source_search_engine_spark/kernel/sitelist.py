"""Site-list membership — the ``insitelist`` url-filter predicate.

Reference semantics (PageBasic.cpp:471-620 getMatchingUrlPattern +
updateSiteListBuf PageBasic.cpp:60-330, declared Spider.h:48):

The site list is a newline-separated pattern file driving every curated /
custom crawl.  Line forms handled (same directives as updateSiteListBuf):

- ``# comment`` / blank            → ignored
- ``contains:SUBSTR``              → url must contain SUBSTR
- ``-contains:SUBSTR``             → url must NOT contain SUBSTR (negative
                                     substrings are checked FIRST and veto
                                     everything, PageBasic.cpp:486-492)
- ``seed:URL``                     → seed-only, no filter entry
- ``site:`` prefix                 → same as a bare url pattern (no seed)
- ``tag:xyz `` prefix              → tag ignored for membership (tags only
                                     matter for tag-lookup calls)
- ``http://host/path`` (scheme'd)  → whole-url prefix match
                                     (PageBasic.cpp:545-570)
- ``host.dom.tld[/path/]``         → domain-table entry: url's domain must
                                     equal the line's domain AND (line host
                                     == url host OR line host == url
                                     domain); a path restricts to that path
                                     prefix (PageBasic.cpp:575-600)

Empty list ⇒ every url matches (getUrlFilterNum2 treats an empty site list
as a dummy row match — "user is spidering the whole internet",
Spider.cpp:12003-12009).

Both the oracle crawler (per-row ``matches``) and the Spark compiler
(functions/filters.py:in_site_list_col — a constant map literal +
``F.exists`` lambda, pure codegen) consume the same ``SiteList`` parse.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import urlnorm


@dataclass(frozen=True)
class UrlPattern:
    line_domain: str      # domain of the line's url (dom-table key)
    thing_host: str       # full host of the line's url (m_thingHash32)
    path: str             # "" = no path restriction
    url_prefix: str       # non-"" for scheme'd lines: whole-url prefix
    tag: str = ""         # tag:xyz prefix on the line (rule `tag:` lookup,
    # Spider.cpp:12563-12590 → getMatchingUrlPattern with a tag arg)


@dataclass(frozen=True)
class SiteList:
    neg_substrings: tuple[str, ...]
    pos_substrings: tuple[str, ...]
    patterns: tuple[UrlPattern, ...]
    empty: bool
    # contains: lines that carried a tag:xyz prefix, as (substr, tag)
    tagged_substrings: tuple[tuple[str, str], ...] = ()


def parse(text: str | None) -> SiteList:
    neg: list[str] = []
    pos: list[str] = []
    pats: list[UrlPattern] = []
    tagged_subs: list[tuple[str, str]] = []
    empty = True
    for raw in (text or "").split("\n"):
        s = raw.strip()
        if not s or s.startswith("#"):
            continue
        tag = ""
        if s.startswith("tag:"):
            # tag:xyz <pattern> — the tag names the line for rule-level
            # `tag:xyz` lookups; membership semantics are unchanged
            parts = s.split(None, 1)
            if len(parts) < 2:
                continue
            tag = parts[0][4:]
            s = parts[1].strip()
        is_neg = False
        if s.startswith("-"):
            is_neg = True
            s = s[1:]
        if s.startswith("seed:"):
            continue  # seed-only line, not a filter entry
        if s.startswith("site:"):
            s = s[5:].strip()
        if s.startswith("contains:"):
            sub = s[9:]
            if not sub:
                continue
            empty = False
            (neg if is_neg else pos).append(sub)
            if tag and not is_neg:
                tagged_subs.append((sub, tag))
            continue
        if not s:
            continue
        empty = False
        has_scheme = s.lower().startswith(("http://", "https://"))
        # Url::set on the line to get host/domain/path
        canon = urlnorm.canonicalize(s if has_scheme else "http://" + s)
        if not canon:
            continue
        host = urlnorm.get_host(canon)
        dom = urlnorm.get_domain(host) or host
        path = urlnorm.get_path_cgi(canon).split("?")[0]
        if path == "/":
            path = ""
        pats.append(UrlPattern(
            line_domain=dom, thing_host=host, path=path,
            url_prefix=s if has_scheme else "", tag=tag))
    return SiteList(tuple(neg), tuple(pos), tuple(pats), empty,
                    tuple(tagged_subs))


def matches(sl: SiteList, url: str, host: str, domain: str) -> bool:
    """getMatchingUrlPattern + the empty-list dummy match."""
    if sl.empty:
        return True
    for sub in sl.neg_substrings:
        if sub in url:
            return False
    path = urlnorm.get_path_cgi(url)
    dom = domain or host
    for pd in sl.patterns:
        if pd.line_domain != dom:
            continue
        if pd.path and not path.startswith(pd.path):
            continue
        if pd.url_prefix:
            if url.startswith(pd.url_prefix):
                return True
            continue
        if pd.thing_host == dom or pd.thing_host == host:
            return True
    for sub in sl.pos_substrings:
        if sub in url:
            return True
    return False


def all_tags(sl: SiteList) -> frozenset[str]:
    """Every tag named by a tag:xyz line."""
    return frozenset(
        [pd.tag for pd in sl.patterns if pd.tag] +
        [t for _, t in sl.tagged_substrings])


def matches_tag(sl: SiteList, url: str, host: str, domain: str,
                tag: str) -> bool:
    """Rule-level ``tag:xyz`` lookup (Spider.cpp:12563-12590): true iff a
    matching site-list line carries the tag.  Empty list ⇒ no row ⇒
    False (the reference sets row=NULL when the site list is empty).
    The negative-substring veto applies, as in getMatchingUrlPattern."""
    if sl.empty:
        return False
    for sub in sl.neg_substrings:
        if sub in url:
            return False
    path = urlnorm.get_path_cgi(url)
    dom = domain or host
    for pd in sl.patterns:
        if pd.tag != tag or pd.line_domain != dom:
            continue
        if pd.path and not path.startswith(pd.path):
            continue
        if pd.url_prefix:
            if url.startswith(pd.url_prefix):
                return True
            continue
        if pd.thing_host == dom or pd.thing_host == host:
            return True
    for sub, t in sl.tagged_substrings:
        if t == tag and sub in url:
            return True
    return False
