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

from ..kernel.urlfilter import (
    MEDIA_EXT3, MEDIA_EXT4, TMP_ERRORS, Rule, parse_expression,
)


def is_media_col(url: Column) -> Column:
    """Url::hasMediaExtension as a pure column expression
    (Url.cpp:2470-2549): 3/4-char extension prefix match."""
    path = F.substring_index(url, "?", 1)
    fname = F.element_at(F.split(path, "/"), -1)
    ext = F.lower(F.regexp_extract(fname, r"\.([A-Za-z0-9]+)$", 1))
    return (F.substring(ext, 1, 4).isin(list(MEDIA_EXT4)) |
            ((F.length(ext) >= 3) &
             F.substring(ext, 1, 3).isin(list(MEDIA_EXT3))))


_NUM_COLS = {
    "errorcount": "err_count",
    "errorcode": "err_code",
    "httpstatus": "http_status",
    "hopcount": "hop_count",
    "sitenuminlinks": "site_num_inlinks",
    "numinlinks": "page_num_inlinks",
    "pagenuminlinks": "page_num_inlinks",
    "lastspidertime": "last_spider_time",
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
}


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
        col = F.lit(True)  # site list empty in the web profile
    elif kw == "hastmperror":
        col = F.col("has_reply") & F.col("err_code").isin(list(TMP_ERRORS))
    elif kw in ("lang", "parentlang"):
        field = "lang" if kw == "lang" else "parent_lang"
        col = F.col(field).isin((term.value or "").split(","))
    elif kw == "tld":
        col = F.col("tld").isin((term.value or "").split(","))
    elif kw == "matchesucp":
        col = F.col("url").rlike(term.value or "")
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
}


def _term_col_fast(term) -> Column:
    """Like _term_col but reads the precomputed shared-predicate columns."""
    kw = term.keyword
    if kw in _SHARED_PRED_COLS:
        col = F.col(_SHARED_PRED_COLS[kw])
        return (~col) if term.negate else col
    return _term_col(term)


def rule_idx_expr(rules: tuple[Rule, ...]) -> Column:
    """First-match-wins rule index over the factored predicate columns."""
    expr = None
    for idx, r in enumerate(rules):
        terms = parse_expression(r.expression)
        if not terms:
            cond = F.lit(True)
        else:
            cond = _term_col_fast(terms[0])
            for t in terms[1:]:
                cond = cond & _term_col_fast(t)
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


def attach_url_predicates(df):
    """Request-intrinsic predicate flags derived from the url/host
    strings.  The reference stores exactly these as SpiderRequest flag
    bits at request-build time (m_hasMediaExtension, m_isWWWSubdomain —
    Spider.h:592-698), so downstream scheduling never touches the url
    string — we do the same to keep the shuffle rows narrow."""
    return (df
            .withColumn("_p_ismedia", is_media_col(F.col("url")))
            .withColumn("_p_iswww", F.col("host").startswith("www."))
            .withColumn("_p_isroot",
                        F.col("url").rlike(r"^[a-z]+://[^/]+/$")))


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
    out = (df
           .withColumn("rule_idx", rule_idx_expr(rules))
           .drop(*_SHARED_PRED_COLS.values())
           .withColumn("_ro", F.element_at(rule_outputs_array(rules),
                                           F.col("rule_idx") + 1)))
    for f in _OUTPUT_FIELDS:
        out = out.withColumn(f, F.col(f"_ro.{f}"))
    return out.drop("_ro")


def with_rule_outputs(df, spark, rules: tuple[Rule, ...]):
    """Attach rule_idx + all rule outputs: shared predicates evaluated
    once per row, one small codegen'd when-chain for the index, constant
    array-literal lookup for the outputs."""
    _ = spark  # kept for signature stability
    return finish_rule_outputs(
        attach_reply_predicates(attach_url_predicates(df)), rules)
