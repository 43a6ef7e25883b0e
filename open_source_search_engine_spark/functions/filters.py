"""Compile the URL-filter rule table into a single vectorized Column
expression — the Spark restatement of ``getUrlFilterNum2``
(Spider.cpp:11577-13510).

The whole 96-row-max rule language becomes ONE chained
``F.when(cond_0, 0).when(cond_1, 1)...`` expression evaluated inside
whole-stage codegen: first-match-wins short-circuits exactly like the
reference's rule loop (Spider.cpp:11667), and no per-row Python runs.

Expected input columns (see plans/schema.py): url, host, tld, hop_count,
is_addurl, is_injected, is_reindex, page_num_inlinks, parent_is_rss,
parent_is_sitemap, same_dom, same_host, has_reply, err_count, err_code,
http_status, is_indexed, spidered_time_ms, lang.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernel.spamwords import CONDITIONAL_NEEDLES, SPAM_NEEDLES
from ..kernel.urlfilter import (
    MEDIA_EXT3, MEDIA_EXT4, TMP_ERRORS, Rule, parse_expression,
)


def has_contact_info_col(text: Column) -> Column:
    """Column twin of kernel.contact.has_contact_info — SAME pattern
    strings (kernel/contact.py pins them to the Python/Java-identical
    regex subset)."""
    from ..kernel import contact
    t = F.coalesce(text, F.lit(""))
    return (t.rlike(contact.EMAIL_RE) | t.rlike(contact.MAILTO_RE)
            | t.rlike(contact.PHONE_RE))


def has_address_col(text: Column) -> Column:
    """Column twin of kernel.contact.has_address."""
    from ..kernel import contact
    return F.coalesce(text, F.lit("")).rlike(contact.ADDRESS_RE)


def is_media_col(url: Column) -> Column:
    """Url::hasMediaExtension as a pure column expression
    (Url.cpp:2470-2549): 3/4-char extension prefix match."""
    path = F.substring_index(url, "?", 1)
    fname = F.element_at(F.split(path, "/"), -1)
    ext = F.lower(F.regexp_extract(fname, r"\.([A-Za-z0-9]+)$", 1))
    return (F.substring(ext, 1, 4).isin(list(MEDIA_EXT4)) |
            ((F.length(ext) >= 3) &
             F.substring(ext, 1, 3).isin(list(MEDIA_EXT3))))


def path_nq_col(url: Column) -> Column:
    """Path (no query) of a canonical url as a Column."""
    return F.substring_index(
        F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/]*(/[^?]*)", 1),
        "?", 1)


def is_permalink_col(url: Column) -> Column:
    """isPermalinky (Url.cpp:2236-2266) as Column regexes: 3+ consecutive
    digits in the path, or 2+ [-_] in one path component (components are
    '/'-separated; the path always starts with '/')."""
    p = path_nq_col(url)
    return p.rlike(r"[0-9]{3}") | p.rlike(r"/[^/]*[-_][^/]*[-_]")


def is_rss_ext_col(url: Column) -> Column:
    """Url::isRSSFormat (Url.cpp:2268-2284): rss/xml/rdf extension, minus
    wlwmanifest/foaf paths."""
    p = path_nq_col(url)
    ext = F.lower(F.regexp_extract(
        F.element_at(F.split(p, "/"), -1), r"\.([A-Za-z0-9]+)$", 1))
    return (ext.isin("rss", "xml", "rdf") &
            ~F.contains(p, F.lit("wlwmanifest")) &
            ~F.contains(p, F.lit("foaf")))


def is_ping_server_col(url: Column) -> Column:
    """isPingServer (Url.cpp:2297-2305)."""
    return F.contains(url, F.lit("rpc.weblogs.com/"))


def tld_col(host: Column) -> Column:
    """JVM twin of kernel/urlnorm.get_tld (Domains.cpp:51-93): last
    label if pure alpha; two-label if in the two-level table; longest
    suffix wins.  A Column expression (not a pandas UDF) so the
    candidate hot path keeps the bucketed scan's reported partitioning
    — Python eval nodes drop outputPartitioning and force the winner
    window to re-shuffle the frontier."""
    from ..kernel.urlnorm import TWO_LEVEL_TLDS
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last = F.get(labels, n - 1)
    two = F.concat_ws(".", F.get(labels, n - 2), last)
    three = F.concat_ws(".", F.get(labels, n - 3), two)
    alpha = r"^\p{L}+$"
    t2 = sorted(TWO_LEVEL_TLDS)
    return (
        F.when(n == 1,
               F.when(host.rlike(alpha), host).otherwise(F.lit("")))
        .when((n >= 3) & F.lower(three).isin(*t2), three)
        .when(F.lower(two).isin(*t2), two)
        .when(last.rlike(alpha), last)
        .otherwise(F.lit("")))


def robots_allowed_col(disallow: Column, path_cgi: Column) -> Column:
    """JVM twin of kernel/robots.match_path (isAllowed2 match step,
    XmlDoc.cpp:14920-14975): allowed unless some effective Disallow
    prefix matches — case-insensitive, a pattern not starting with '/'
    matches against the path minus its leading '/'.  Null / empty
    pattern list ⇒ allowed.  Expression form for the same plan-shape
    reason as tld_col."""
    def hits(v: Column) -> Column:
        subject = F.when(v.startswith("/"), path_cgi) \
            .otherwise(F.substring(path_cgi, 2, 2_147_483_646))
        return F.lower(subject).startswith(F.lower(v))

    return F.coalesce(~F.exists(disallow, hits), F.lit(True))


def is_spam_host_col(host: Column, tld: Column) -> Column:
    """Url::isSpam (Url.cpp:1138-1184) + the full isAdult needle table
    (Lang.cpp:467-676, kernel/spamwords.py) compiled to Column
    expressions: split the host-minus-tld on [.-], any segment matching a
    needle (modulo its exception list) is spam.  Pure codegen — the
    needle scan is exists() over the split array with contains()."""
    s = F.lower(host)
    s = F.when((tld != "") & s.endswith(F.concat(F.lit("."), F.lower(tld))),
               s.substr(F.lit(1), F.length(s) - F.length(tld) - 1)
               ).otherwise(s)
    hyphen_spam = (F.length(s) > 30) & \
        (F.size(F.split(s, "-")) - 1 >= 4)

    def seg_is_adult(seg: Column) -> Column:
        cond = F.lit(False)
        for n in SPAM_NEEDLES:
            cond = cond | F.contains(seg, F.lit(n))
        for n, exceptions in CONDITIONAL_NEEDLES:
            hit = F.contains(seg, F.lit(n))
            for e in exceptions:
                hit = hit & ~F.contains(seg, F.lit(e))
            cond = cond | hit
        return cond

    segs = F.split(F.translate(s, "-", "."), r"\.")
    seg_spam = F.exists(segs, lambda g: (F.length(g) > 0) & seg_is_adult(g))
    exempt = tld.startswith("edu") | tld.startswith("gov")
    return ~exempt & (hyphen_spam | seg_spam)


def in_site_list_col(sl, url: Column, host: Column,
                     domain: Column) -> Column:
    """getMatchingUrlPattern (PageBasic.cpp:471-620) compiled to Column
    expressions: a constant map literal domain → array<pattern struct> +
    ``F.exists`` — the whole membership check stays in codegen.  For site
    lists beyond ~10^5 lines, swap the map literal for a broadcast-joined
    pattern table keyed by domain (same shape).  Empty list ⇒ always True
    (Spider.cpp:12003-12009)."""
    if sl.empty:
        return F.lit(True)
    neg = F.lit(False)
    for sub in sl.neg_substrings:
        neg = neg | F.contains(url, F.lit(sub))
    pos = F.lit(False)
    for sub in sl.pos_substrings:
        pos = pos | F.contains(url, F.lit(sub))
    dom_c = F.when(domain == "", host).otherwise(domain)
    hit = _patterns_hit_col(sl.patterns, url, host, dom_c)
    return ~neg & (hit | pos)


def _patterns_hit_col(patterns, url: Column, host: Column,
                      dom_c: Column) -> Column:
    """Shared pattern-table membership: constant map literal domain →
    array<pattern struct> + F.exists (see in_site_list_col)."""
    if not patterns:
        return F.lit(False)
    by_dom: dict[str, list] = {}
    for pd in patterns:
        by_dom.setdefault(pd.line_domain, []).append(pd)
    entries = []
    for dom, pds in by_dom.items():
        arr = F.array(*[
            F.struct(F.lit(pd.thing_host).alias("thing_host"),
                     F.lit(pd.path).alias("path"),
                     F.lit(pd.url_prefix).alias("url_prefix"))
            for pd in pds])
        entries.extend([F.lit(dom), arr])
    pat_map = F.create_map(*entries)
    pats = pat_map[dom_c]
    path_c = F.regexp_extract(
        url, r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)$", 1)

    def one(p):
        path_ok = (p["path"] == "") | path_c.startswith(p["path"])
        url_pat = F.when(p["url_prefix"] != "",
                         url.startswith(p["url_prefix"])) \
            .otherwise((p["thing_host"] == dom_c) |
                       (p["thing_host"] == host))
        return path_ok & url_pat

    return pats.isNotNull() & F.exists(pats, one)


def tag_matches_col(sl, tag: str, url: Column, host: Column,
                    domain: Column) -> Column:
    """Rule-level ``tag:xyz`` (Spider.cpp:12563-12590) as a Column: true
    iff a matching site-list line carries the tag.  Twin of
    kernel.sitelist.matches_tag; empty list ⇒ no row ⇒ False."""
    if sl.empty:
        return F.lit(False)
    neg = F.lit(False)
    for sub in sl.neg_substrings:
        neg = neg | F.contains(url, F.lit(sub))
    dom_c = F.when(domain == "", host).otherwise(domain)
    hit = _patterns_hit_col(
        tuple(pd for pd in sl.patterns if pd.tag == tag),
        url, host, dom_c)
    sub_hit = F.lit(False)
    for sub, t in sl.tagged_substrings:
        if t == tag:
            sub_hit = sub_hit | F.contains(url, F.lit(sub))
    return ~neg & (hit | sub_hit)


_NUM_COLS = {
    "errorcount": "err_count",
    "errorcode": "err_code",
    "httpstatus": "http_status",
    "hopcount": "hop_count",
    "sitenuminlinks": "site_num_inlinks",
    "numinlinks": "page_num_inlinks",
    "pagenuminlinks": "page_num_inlinks",
    "lastspidertime": "last_spider_time",
    "percentchangedperday": "percent_changed_per_day",
    "urlage": "url_age",
    "age": "url_age",
    "spiderwaited": "spider_waited",
    "retrynum": "err_count",
    "sitepages": "site_pages",
    "domainpages": "domain_pages",
    "seedcount": "seed_count",
}

_BOOL_COLS = {
    "isreindex": "is_reindex",
    "isaddurl": "is_addurl",
    "isinjected": "is_injected",
    "isindexed": "is_indexed",
    "isparentrss": "parent_is_rss",
    "isparentsitemap": "parent_is_sitemap",
    "isonsamedomain": "same_dom",
    "isonsamesubdomain": "same_host",
    "isdocidbased": "is_docid_based",
    "isnewoutlink": "is_new_outlink",
    "isparentindexed": "was_parent_indexed",
    "hasauthorityinlink": "has_authority_inlink",
    "isrss": "is_rss",
    # m_parentIsPingServer (Spider.cpp:12207-12211), set at harvest
    "isparentpingserver": "parent_is_pingserver",
}
# NOTE: "ingoogle" is NOT in FLAG_COLS — it carries the reference's
# valid-bit RULE-SKIP semantics (Spider.cpp:12182-12205: the bit comes
# from the site TagRec; no tag ⇒ m_inGoogleValid off ⇒ the rule row is
# skipped), handled explicitly in _term_col like hascontactinfo.


def _term_col(term) -> Column:
    kw = term.keyword
    if kw == "default":
        col = F.lit(True)
    elif kw == "ismedia":
        col = is_media_col(F.col("url"))
    elif kw == "isnew":
        col = ~F.col("has_reply")
    elif kw == "hasreply":
        col = F.col("has_reply")
    elif kw == "iswww":
        col = F.col("host").startswith("www.")
    elif kw == "isroot":
        # path == "/" and no query (Url::isRoot, Url.cpp:2577)
        col = F.col("url").rlike(r"^[a-z]+://[^/]+/$")
    elif kw == "ismanualadd":
        col = F.col("is_addurl") | F.col("is_injected")
    elif kw == "insitelist":
        # fast path (_term_col_fast) reads the attached _p_insitelist
        # column before reaching here; standalone rule_condition/
        # compile_rules have no site list to compile, so they use the
        # empty-list semantics: every url matches (Spider.cpp:12003-12009)
        col = F.lit(True)
    elif kw == "isnewrequest":
        # no reply yet, or the request was (re)added after the last reply
        # (Spider.cpp:12484-12506: sreq->m_addedTime > srep->m_spideredTime)
        # — second granularity on both sides (oracle build_context)
        col = (~F.col("has_reply")) | \
            (F.floor(F.col("added_time_ms") / 1000) >
             F.col("last_spider_time"))
    elif kw == "ispermalink":
        col = is_permalink_col(F.col("url"))
    elif kw == "isrssext":
        col = is_rss_ext_col(F.col("url"))
    elif kw == "ispingserver":
        col = is_ping_server_col(F.col("url"))
    elif kw == "hastmperror":
        col = F.col("has_reply") & F.col("err_code").isin(list(TMP_ERRORS))
    elif kw in ("lang", "parentlang", "tld"):
        # list-valued keywords honor the != op by flipping the membership
        # result, exactly like the oracle (kernel/urlfilter.py evaluate_term
        # flips for op == "!="); missing values compare as ""
        field = {"lang": "lang", "parentlang": "parent_lang",
                 "tld": "tld"}[kw]
        col = F.coalesce(F.col(field), F.lit("")) \
            .isin((term.value or "").split(","))
        if term.op == "!=":
            col = ~col
    elif kw in ("matchesucp", "matchesupr", "matchesucr"):
        # Spider.cpp:11687-11757 (ucp + the ucr/upr regex twins)
        col = F.col("url").rlike(term.value or "")
    elif kw == "tag":
        # tag:xyz (Spider.cpp:12563-12590): attach_url_predicates
        # compiles each referenced tag to a _p_tag_<name> column via
        # tag_matches_col; standalone compile without the attach step
        # fails loudly at analysis (no site list to look in)
        col = F.col(f"_p_tag_{term.value}")
    elif kw == "ingoogle":
        # Spider.cpp:12182-12205: tagdb-backed bit with the valid-bit
        # skip — a NULL in_google (site has no tag) skips the RULE
        # regardless of '!', exactly like hascontactinfo without a
        # reply (kernel/urlfilter.py evaluate_term's None sentinel)
        bit = F.coalesce(F.col("in_google").cast("boolean"),
                         F.lit(False))
        return F.col("in_google").isNotNull() & \
            ((~bit) if term.negate else bit)
    elif kw in ("hascontactinfo", "hasaddress"):
        # Spider.cpp:11770,11787: REPLY-backed bits with the valid-bit
        # skip — no reply ⇒ the RULE is skipped regardless of '!', so
        # negation applies to the bit, not to the has_reply guard
        # (mirrors kernel/urlfilter.py evaluate_term's None sentinel)
        bit = F.coalesce(
            F.col({"hascontactinfo": "has_contact_info",
                   "hasaddress": "has_address"}[kw]).cast("boolean"),
            F.lit(False))
        return F.col("has_reply") & ((~bit) if term.negate else bit)
    elif kw == "newinlinks":
        # newinlinks (Spider.cpp:13339-13368): # of new SpiderRequests
        # the LATEST reply's fetch added; requires a reply
        lhs = F.coalesce(F.col("new_requests"), F.lit(0))
        rhs = F.lit(float(term.value))
        op = term.op or "=="
        cmp = {
            "==": lhs == rhs, "!=": lhs != rhs, ">=": lhs >= rhs,
            "<=": lhs <= rhs, ">": lhs > rhs, "<": lhs < rhs,
        }[op]
        col = F.col("has_reply") & cmp
    elif kw in _BOOL_COLS:
        col = F.col(_BOOL_COLS[kw]).cast("boolean")
        col = F.coalesce(col, F.lit(False))
    elif kw in _NUM_COLS:
        lhs = F.coalesce(F.col(_NUM_COLS[kw]), F.lit(0))
        rhs = F.lit(float(term.value))
        op = term.op or "=="
        col = {
            "==": lhs == rhs, "!=": lhs != rhs, ">=": lhs >= rhs,
            "<=": lhs <= rhs, ">": lhs > rhs, "<": lhs < rhs,
        }[op]
    else:
        raise ValueError(f"unsupported url-filter keyword: {kw}")
    return (~col) if term.negate else col


def rule_condition(rule: Rule) -> Column:
    terms = parse_expression(rule.expression)
    if not terms:
        return F.lit(True)
    cond = _term_col(terms[0])
    for t in terms[1:]:
        cond = cond & _term_col(t)
    return cond


def compile_rules(rules: tuple[Rule, ...]) -> Column:
    """→ struct(rule_idx, priority, spider_freq_days, ip_wait_ms,
    ip_max_spiders, max_spiders, harvest_links, force_delete).

    NOTE: prefer ``with_rule_outputs`` below — it factors the shared
    predicates into columns once and joins a broadcast 24-row dimension
    for the outputs, keeping the expression small enough for whole-stage
    codegen.  This struct variant is kept for small inputs / tests.
    """
    def out_struct(idx: int, r: Rule) -> Column:
        return F.struct(
            F.lit(idx).alias("rule_idx"),
            F.lit(r.priority).alias("priority"),
            F.lit(float(r.spider_freq_days)).alias("spider_freq_days"),
            F.lit(r.ip_wait_ms).alias("ip_wait_ms"),
            F.lit(r.ip_max_spiders).alias("ip_max_spiders"),
            F.lit(r.max_spiders).alias("max_spiders"),
            F.lit(bool(r.harvest_links)).alias("harvest_links"),
            F.lit(bool(r.force_delete)).alias("force_delete"),
        )

    expr = None
    for idx, r in enumerate(rules):
        cond = rule_condition(r)
        if expr is None:
            expr = F.when(cond, out_struct(idx, r))
        else:
            expr = expr.when(cond, out_struct(idx, r))
    return expr.otherwise(out_struct(len(rules) - 1, rules[-1]))


# ---------------------------------------------------------------------------
# fast path: factored predicates + rule_idx when-chain + broadcast dim join
# ---------------------------------------------------------------------------

_SHARED_PRED_COLS = {
    "ismedia": "_p_ismedia",
    "isnew": "_p_isnew",
    "hastmperror": "_p_tmperr",
    "iswww": "_p_iswww",
    "isroot": "_p_isroot",
    "ismanualadd": "_p_manual",
    "insitelist": "_p_insitelist",
    "ispermalink": "_p_permalink",
    "isrssext": "_p_rssext",
    "ispingserver": "_p_pingsrv",
}


def regex_pred_cols(rules: tuple[Rule, ...] | None) -> dict:
    """Distinct url-regex terms (matchesucp/upr/ucr) → precomputed
    predicate column names, so the regexes run ONCE per stored row at
    the scan (beside the other url-derived bits) instead of per
    candidate per rule term.  attach_url_predicates writes these
    columns; rule_idx_expr reads them — both derive the same map from
    the rule table, so the contract needs no shared state."""
    if rules is None:
        return {}
    terms = sorted({(t.keyword, t.value or "") for r in rules
                    for t in parse_expression(r.expression)
                    if t.keyword in ("matchesucp", "matchesupr",
                                     "matchesucr")})
    return {t: f"_p_re_{i}" for i, t in enumerate(terms)}


def used_keywords(rules: tuple[Rule, ...]) -> set[str]:
    """All keywords referenced by a rule table — the reference's
    m_countingPagesIndexed-style pre-scan (Spider.cpp:3596) so expensive
    inputs (quota aggregations, site-list compile) are only built when a
    rule actually reads them."""
    kws: set[str] = set()
    for r in rules:
        for t in parse_expression(r.expression):
            kws.add(t.keyword)
    return kws


def _term_col_fast(term, re_cols: dict | None = None) -> Column:
    """Like _term_col but reads the precomputed shared-predicate columns."""
    kw = term.keyword
    if kw in _SHARED_PRED_COLS:
        col = F.col(_SHARED_PRED_COLS[kw])
        return (~col) if term.negate else col
    if re_cols:
        name = re_cols.get((kw, term.value or ""))
        if name is not None:
            col = F.col(name)
            return (~col) if term.negate else col
    return _term_col(term)


def rule_idx_expr(rules: tuple[Rule, ...]) -> Column:
    """First-match-wins rule index over the factored predicate columns."""
    re_cols = regex_pred_cols(rules)
    expr = None
    for idx, r in enumerate(rules):
        terms = parse_expression(r.expression)
        if not terms:
            cond = F.lit(True)
        else:
            cond = _term_col_fast(terms[0], re_cols)
            for t in terms[1:]:
                cond = cond & _term_col_fast(t, re_cols)
        expr = F.when(cond, F.lit(idx)) if expr is None \
            else expr.when(cond, F.lit(idx))
    return expr.otherwise(F.lit(len(rules) - 1))


def rules_dim(spark, rules: tuple[Rule, ...]):
    """The rule table as a 1-row-per-rule broadcastable dimension."""
    rows = [
        (idx, r.priority, float(r.spider_freq_days), r.ip_wait_ms,
         r.ip_max_spiders, r.max_spiders, bool(r.harvest_links),
         bool(r.force_delete))
        for idx, r in enumerate(rules)
    ]
    return spark.createDataFrame(
        rows,
        "rule_idx int, priority int, spider_freq_days double, "
        "ip_wait_ms int, ip_max_spiders int, max_spiders int, "
        "harvest_links boolean, force_delete boolean")


_OUTPUT_FIELDS = ("priority", "spider_freq_days", "ip_wait_ms",
                  "ip_max_spiders", "max_spiders", "harvest_links",
                  "force_delete")


def rule_outputs_array(rules: tuple[Rule, ...]) -> Column:
    """The rule table as a constant array-of-structs literal indexed by
    rule_idx — measured 3.5x cheaper than a broadcast hash join against
    the 24-row dimension (the join added ~5µs/row; element_at over a
    constant-folded array is pure codegen)."""
    structs = []
    for r in rules:
        structs.append(F.struct(
            F.lit(r.priority).alias("priority"),
            F.lit(float(r.spider_freq_days)).alias("spider_freq_days"),
            F.lit(r.ip_wait_ms).alias("ip_wait_ms"),
            F.lit(r.ip_max_spiders).alias("ip_max_spiders"),
            F.lit(r.max_spiders).alias("max_spiders"),
            F.lit(bool(r.harvest_links)).alias("harvest_links"),
            F.lit(bool(r.force_delete)).alias("force_delete")))
    return F.array(*structs)


def attach_url_predicates(df, rules: tuple[Rule, ...] | None = None,
                          site_list=None):
    """Request-intrinsic predicate flags derived from the url/host
    strings.  The reference stores exactly these as SpiderRequest flag
    bits at request-build time (m_hasMediaExtension, m_isWWWSubdomain —
    Spider.h:592-698), so downstream scheduling never touches the url
    string — we do the same to keep the shuffle rows narrow.

    ``_p_insitelist`` is always attached: compiled site-list membership
    when a parsed non-empty ``site_list`` (kernel/sitelist.SiteList) is
    given, else lit(True) (empty list ⇒ dummy match,
    Spider.cpp:12003-12009; constant-folded, free).  The permalink/rssext/
    pingserver flags are attached only when a rule reads them."""
    kws = used_keywords(rules) if rules is not None else set()
    out = (df
           .withColumn("_p_ismedia", is_media_col(F.col("url")))
           .withColumn("_p_iswww", F.col("host").startswith("www."))
           .withColumn("_p_isroot",
                       F.col("url").rlike(r"^[a-z]+://[^/]+/$")))
    if site_list is not None and not site_list.empty:
        dom = (F.col("domain") if "domain" in df.columns
               else F.lit(""))
        out = out.withColumn("_p_insitelist", in_site_list_col(
            site_list, F.col("url"), F.col("host"), dom))
    else:
        out = out.withColumn("_p_insitelist", F.lit(True))
    if rules is not None:
        tag_vals = {t.value for r in rules
                    for t in parse_expression(r.expression)
                    if t.keyword == "tag" and t.value}
        for tv in sorted(tag_vals):
            if site_list is None or site_list.empty:
                out = out.withColumn(f"_p_tag_{tv}", F.lit(False))
            else:
                dom = (F.col("domain") if "domain" in df.columns
                       else F.lit(""))
                out = out.withColumn(
                    f"_p_tag_{tv}",
                    tag_matches_col(site_list, tv, F.col("url"),
                                    F.col("host"), dom))
    if "ispermalink" in kws:
        out = out.withColumn("_p_permalink",
                             is_permalink_col(F.col("url")))
    if "isrssext" in kws:
        out = out.withColumn("_p_rssext", is_rss_ext_col(F.col("url")))
    if "ispingserver" in kws:
        out = out.withColumn("_p_pingsrv",
                             is_ping_server_col(F.col("url")))
    # url-regex terms evaluated once per row here; rule_idx_expr reads
    # the columns (same map derivation on both sides)
    for (kw, val), name in regex_pred_cols(rules).items():
        _ = kw
        out = out.withColumn(name, F.col("url").rlike(val))
    return out


def attach_reply_predicates(df):
    """Reply-dependent predicate flags (evaluated after the latest-reply
    join)."""
    return (df
            .withColumn("_p_isnew", ~F.col("has_reply"))
            .withColumn("_p_tmperr",
                        F.col("has_reply") &
                        F.coalesce(F.col("err_code"), F.lit(0))
                        .isin(list(TMP_ERRORS)))
            .withColumn("_p_manual",
                        F.col("is_addurl") | F.col("is_injected")))


def finish_rule_outputs(df, rules: tuple[Rule, ...]):
    """rule_idx when-chain over the _p_* columns + array-literal outputs.
    Requires attach_url_predicates + attach_reply_predicates upstream."""
    out = df.withColumn("rule_idx", rule_idx_expr(rules))
    out = (out
           .drop(*[c for c in out.columns if c.startswith("_p_")])
           .withColumn("_ro", F.element_at(rule_outputs_array(rules),
                                           F.col("rule_idx") + 1)))
    for f in _OUTPUT_FIELDS:
        out = out.withColumn(f, F.col(f"_ro.{f}"))
    return out.drop("_ro")


def with_rule_outputs(df, spark, rules: tuple[Rule, ...], site_list=None):
    """Attach rule_idx + all rule outputs: shared predicates evaluated
    once per row, one small codegen'd when-chain for the index, constant
    array-literal lookup for the outputs."""
    _ = spark  # kept for signature stability
    return finish_rule_outputs(
        attach_reply_predicates(
            attach_url_predicates(df, rules, site_list)), rules)
