"""The URL-filter rule language: first-match-wins rule table evaluated per
frontier request, mirroring ``getUrlFilterNum2`` (Spider.cpp:11577-13510) and
the default "web" profile (Collectiondb.cpp:2309-2624).

Each rule is a ``&&``-conjunction of predicates (optionally ``!``-negated)
over (request, latest-reply, now); the first matching rule supplies the
scheduling outputs: priority (0-127), respider frequency (days), max spiders
per rule, per-IP max spiders, per-IP wait ms, harvest-links, force-delete.

Two consumers share this table:
- the pure-Python oracle crawler (kernel-side ``evaluate``)
- the Spark pipeline (functions/filters.py compiles the same table into one
  chained ``F.when`` Column expression — no per-row Python)

Predicates implemented (the web-profile set plus the common extras from
Spider.cpp keyword scan): isreindex ismedia isaddurl isinjected ismanualadd
isdocidbased isindexed isnew isnewoutlink isonsamedomain isonsamesubdomain
isparentrss isparentsitemap ispingserver isparentpingserver isrss isroot
iswww insitelist tag:<name> ingoogle newinlinks
hascontactinfo hasaddress (reply-backed bits with the reference's
valid-bit RULE-SKIP semantics — kernel/contact.py predicates)
isnewrequest hasreply hastmperror errorcount errorcode httpstatus hopcount
sitenuminlinks numinlinks pagenuminlinks lang parentlang tld (lang/tld honor
the != op) urlage age lastspidertime spiderwaited percentchangedperday
default.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# symbolic error codes for the simulated fetch tier; the reference's
# temporary-error set is EDNSTIMEDOUT/ETCPTIMEDOUT/EDNSDEAD/EBADIP
# (Spider.cpp:11863-11876)
ERR_OK = 0
ERR_DNS_TIMEDOUT = 1
ERR_TCP_TIMEDOUT = 2
ERR_DNS_DEAD = 3
ERR_BAD_IP = 4
ERR_NOT_FOUND = 10  # 404-ish, NOT temporary
TMP_ERRORS = frozenset([ERR_DNS_TIMEDOUT, ERR_TCP_TIMEDOUT, ERR_DNS_DEAD,
                        ERR_BAD_IP])

# Url::hasMediaExtension (Url.cpp:2470-2549): 3-char-prefix matches + two
# 4-char ones
MEDIA_EXT3 = frozenset(["css", "mpg", "png", "wmv", "wav", "jpg", "gif",
                        "ico", "mp3", "mp4", "mov", "avi"])
MEDIA_EXT4 = frozenset(["mpeg", "jpeg"])


@dataclass(frozen=True)
class Rule:
    expression: str
    priority: int
    spider_freq_days: float
    max_spiders: int
    ip_max_spiders: int
    ip_wait_ms: int
    harvest_links: bool = True
    force_delete: bool = False


# default "web" profile, Collectiondb.cpp:2309-2624 (ipms=7)
DEFAULT_WEB_PROFILE: tuple[Rule, ...] = (
    Rule("isreindex", 80, 0, 99, 1, 1000),
    Rule("ismedia", 100, 0, 99, 1, 1000, True, True),
    Rule("!ismanualadd && !insitelist", 100, 0, 99, 1, 1000, True, True),
    Rule("errorcount>=3 && hastmperror", 100, 1, 1, 1, 1000, True, True),
    Rule("errorcount>=1 && hastmperror", 45, 1, 1, 1, 1000),
    Rule("errorcount>=1", 2, 5, 1, 1, 1000, True, True),
    Rule("isaddurl", 85, 7, 99, 7, 1000),
    Rule("numinlinks>7 && isnew", 52, 7, 9, 7, 1000),
    Rule("numinlinks>7", 51, 7, 9, 7, 1000),
    Rule("hopcount==0 && iswww && isnew", 50, 7, 9, 7, 1000),
    Rule("hopcount==0 && iswww", 48, 7.0, 9, 7, 1000),
    Rule("hopcount==0 && isnew", 49, 7.0, 9, 7, 1000),
    Rule("hopcount==0", 47, 10.0, 9, 7, 1000),
    Rule("isparentrss && isnew", 45, 7, 9, 7, 1000),
    Rule("isparentsitemap && isnew", 44, 7, 9, 7, 1000),
    Rule("isparentrss", 43, 20.0, 9, 7, 1000),
    Rule("isparentsitemap", 42, 20.0, 9, 7, 1000),
    Rule("hopcount==1 && isnew", 40, 20.0, 9, 7, 1000),
    Rule("hopcount==1", 39, 20.0, 9, 7, 1000),
    Rule("hopcount==2 && isnew", 30, 40, 9, 7, 1000),
    Rule("hopcount==2", 29, 40, 9, 7, 1000),
    Rule("hopcount>=3 && isnew", 20, 60, 9, 7, 1000),
    Rule("hopcount>=3", 19, 60, 9, 7, 1000),
    Rule("default", 1, 60, 9, 7, 1000),
)

_TERM_RE = re.compile(
    r"^\s*(!?)\s*([a-z_]+)\s*(==|!=|>=|<=|>|<)?\s*([^\s]+)?\s*$"
)


@dataclass(frozen=True)
class Term:
    negate: bool
    keyword: str
    op: str | None       # ==, !=, >=, <=, >, <
    value: str | None


def parse_expression(expr: str) -> list[Term]:
    """Split a rule expression into conjunct terms."""
    if expr.strip() == "default":
        return []
    terms = []
    for part in expr.split("&&"):
        m = _TERM_RE.match(part)
        if not m:
            raise ValueError(f"unparseable url-filter term: {part!r}")
        neg, kw, op, val = m.groups()
        if kw == "tag" and val and val.startswith(":"):
            # tag:name — the colon is part of the keyword syntax
            # (Spider.cpp:12563 matches "tag:" then the name)
            val = val[1:]
        terms.append(Term(bool(neg), kw, op, val))
    return terms


def is_media_url(url: str) -> bool:
    """Url::hasMediaExtension prefix semantics."""
    path = url.split("?")[0]
    fname = path.rsplit("/", 1)[-1]
    if "." not in fname:
        return False
    ext = fname.rsplit(".", 1)[-1].lower()
    if not ext or not ext.isalnum():
        return False
    return ext[:4] in MEDIA_EXT4 or ext[:3] in MEDIA_EXT3


# context keys expected by evaluate(); the oracle + Spark sides both
# materialize exactly these (see plans/schema.py)
_NUMERIC_KEYS = {
    "errorcount": "err_count",
    "errorcode": "err_code",
    "httpstatus": "http_status",
    "hopcount": "hop_count",
    "sitenuminlinks": "site_num_inlinks",
    "numinlinks": "page_num_inlinks",
    "pagenuminlinks": "page_num_inlinks",
    "percentchangedperday": "percent_changed_per_day",
    "urlage": "url_age",            # now - discovery_time (s)
    "age": "url_age",
    "lastspidertime": "last_spider_time",
    "spiderwaited": "spider_waited",  # now - last_spider_time (s)
    "retrynum": "err_count",
    "sitepages": "site_pages",        # F2 quotas (Spider.cpp:12712-12790)
    "domainpages": "domain_pages",
    "seedcount": "seed_count",
}

_BOOL_KEYS = {
    "isreindex": "is_reindex",
    "isaddurl": "is_addurl",
    "isinjected": "is_injected",
    "ismanualadd": "is_manualadd",   # isaddurl|isinjected in the reference
    "isdocidbased": "is_docid_based",
    "isindexed": "is_indexed",
    "isnewoutlink": "is_new_outlink",
    "isonsamedomain": "same_dom",
    "isonsamesubdomain": "same_host",
    "isparentindexed": "was_parent_indexed",
    "isparentrss": "parent_is_rss",
    "isparentsitemap": "parent_is_sitemap",
    "ispermalink": "is_permalink",
    "isrss": "is_rss",
    "isrssext": "is_rss_ext",
    "iswww": "is_www",
    "isroot": "is_root",
    "ispingserver": "is_ping_server",
    "insitelist": "in_site_list",
    "hasauthorityinlink": "has_authority_inlink",
    "isparentpingserver": "parent_is_pingserver",  # Spider.cpp:12207
}
# "ingoogle" is handled explicitly in evaluate_term: the bit comes from
# the site's TagRec (Spider.cpp:12182-12205) and carries a valid bit —
# a site with NO tag (in_google=None) SKIPS the rule, like
# hascontactinfo without a reply.


def evaluate_term(term: Term, ctx: dict) -> bool:
    kw = term.keyword
    if kw == "default":
        result = True
    elif kw == "ismedia":
        result = bool(ctx.get("is_media"))
    elif kw == "isnew":
        result = not ctx.get("has_reply")
    elif kw == "isnewrequest":
        result = bool(ctx.get("is_new_request", True))
    elif kw == "hasreply":
        result = bool(ctx.get("has_reply"))
    elif kw == "hastmperror":
        result = bool(ctx.get("has_reply")) and \
            ctx.get("err_code", 0) in TMP_ERRORS
    elif kw == "lang" or kw == "parentlang":
        field = "lang" if kw == "lang" else "parent_lang"
        vals = set((term.value or "").split(","))
        result = ctx.get(field, "") in vals
    elif kw == "tld":
        vals = set((term.value or "").split(","))
        result = ctx.get("tld", "") in vals
    elif kw == "tag":
        # tag:xyz (Spider.cpp:12563-12590): the url's matching site-list
        # line carries the tag; build_context precomputes the tag set
        result = (term.value or "") in ctx.get("site_list_tags", ())
    elif kw == "newinlinks":
        # # of new SpiderRequests the latest reply's fetch added
        # (Spider.cpp:13339-13368, srep->m_newRequests); needs a reply
        lhs = ctx.get("new_requests", 0) or 0
        rhs = float(term.value)  # type: ignore[arg-type]
        op = term.op or "=="
        result = bool(ctx.get("has_reply")) and {
            "==": lhs == rhs, "!=": lhs != rhs, ">=": lhs >= rhs,
            "<=": lhs <= rhs, ">": lhs > rhs, "<": lhs < rhs,
        }[op]
    elif kw == "ingoogle":
        # Spider.cpp:12182-12205: tagdb-backed bit; no site tag ⇒ valid
        # bit off ⇒ skip the RULE even for the negated form
        v = ctx.get("in_google")
        if v is None:
            return None
        result = bool(v)
    elif kw in ("hascontactinfo", "hasaddress"):
        # Spider.cpp:11770,11787: reply-backed bits with the valid-bit
        # skip — without a reply the whole RULE is skipped, even for the
        # negated form (`if (!srep) continue` / valid-bit continue), so
        # return the skip sentinel BEFORE the generic negate flip
        if not ctx.get("has_reply"):
            return None
        field = {"hascontactinfo": "has_contact_info",
                 "hasaddress": "has_address"}[kw]
        result = bool(ctx.get(field))
    elif kw in ("matchesucp", "matchesupr", "matchesucr"):
        # per-collection URL regex rows: ucr/upr are the compiled-regex
        # twins of the ucp/upp pattern lists (Spider.cpp:11687-11757,
        # m_ucr/m_upr Collectiondb.h); value is the regex
        import re as _re
        result = bool(_re.search(term.value or "", ctx.get("url", "")))
    elif kw in _BOOL_KEYS:
        result = bool(ctx.get(_BOOL_KEYS[kw]))
    elif kw in _NUMERIC_KEYS:
        lhs = ctx.get(_NUMERIC_KEYS[kw], 0) or 0
        rhs = float(term.value)  # type: ignore[arg-type]
        op = term.op or "=="
        result = {
            "==": lhs == rhs, "!=": lhs != rhs, ">=": lhs >= rhs,
            "<=": lhs <= rhs, ">": lhs > rhs, "<": lhs < rhs,
        }[op]
    else:
        raise ValueError(f"unsupported url-filter keyword: {kw}")
    if kw in ("lang", "parentlang", "tld") and term.op == "!=":
        result = not result
    return (not result) if term.negate else result


def evaluate(rules: tuple[Rule, ...], ctx: dict) -> int:
    """First-match-wins rule index (getUrlFilterNum semantics).  A term
    may return the ``None`` sentinel ("skip this rule", the reference's
    valid-bit continue) — falsy, so ``all`` rejects the rule."""
    for idx, rule in enumerate(rules):
        terms = parse_expression(rule.expression)
        if all(evaluate_term(t, ctx) for t in terms):
            return idx
    return len(rules) - 1  # default is always last


def build_context(request: dict, reply: dict | None, now: int,
                  site_list=None) -> dict:
    """Assemble the evaluation context from a request row + latest reply.
    ``site_list`` is a parsed kernel.sitelist.SiteList (None ⇒ empty ⇒
    every url matches, Spider.cpp:12003-12009)."""
    from . import sitelist as _sitelist
    from . import urlflags as _urlflags
    ctx = dict(request)
    url = request["url"]
    ctx["is_media"] = is_media_url(url)
    ctx["has_reply"] = reply is not None
    host = ctx.get("host", "")
    ctx["is_www"] = host.startswith("www.")
    path = url.split("://", 1)[-1]
    slash = path.find("/")
    ctx["is_root"] = slash >= 0 and path[slash:] == "/"
    ctx.setdefault("is_manualadd",
                   bool(ctx.get("is_addurl")) or bool(ctx.get("is_injected")))
    ctx.setdefault("is_permalink", _urlflags.is_permalink(url))
    ctx.setdefault("is_rss_ext", _urlflags.is_rss_ext(url))
    ctx.setdefault("is_ping_server", _urlflags.is_ping_server(url))
    if site_list is None or site_list.empty:
        ctx.setdefault("in_site_list", True)
    else:
        ctx["in_site_list"] = _sitelist.matches(
            site_list, url, host, ctx.get("domain", ""))
    if site_list is not None and not site_list.empty:
        ctx["site_list_tags"] = frozenset(
            t for t in _sitelist.all_tags(site_list)
            if _sitelist.matches_tag(site_list, url, host,
                                     ctx.get("domain", ""), t))
    if reply is not None:
        ctx["err_code"] = reply.get("err_code", 0)
        ctx["err_count"] = reply.get("err_count", 0)
        ctx["http_status"] = reply.get("http_status", 0)
        ctx["is_indexed"] = reply.get("is_indexed", False)
        ctx["percent_changed_per_day"] = reply.get(
            "percent_changed_per_day", 0.0)
        ctx["last_spider_time"] = reply.get("spidered_time", 0)
        ctx["spider_waited"] = max(0, now - ctx["last_spider_time"])
        ctx["lang"] = reply.get("lang", ctx.get("lang", ""))
        ctx["new_requests"] = reply.get("new_requests", 0)
        ctx["has_contact_info"] = reply.get("has_contact_info", False)
        ctx["has_address"] = reply.get("has_address", False)
        # isnewrequest (Spider.cpp:12484-12506): request (re)added after
        # the last reply was spidered
        ctx["is_new_request"] = \
            ctx.get("added_time", 0) > ctx["last_spider_time"]
    else:
        ctx.setdefault("err_count", 0)
        ctx["last_spider_time"] = 0
        ctx["is_new_request"] = True
    ctx["url_age"] = max(
        0, now - (request.get("discovery_time") or
                  request.get("added_time") or now))
    return ctx


def outputs(rules: tuple[Rule, ...], idx: int) -> Rule:
    return rules[idx]
