"""The query language: Gigablast's search-syntax surface compiled onto the
search plans.

Reference: Query.cpp (5,751 LoC parser), field table Query.h:69-110, boolean
ops OP_AND/OP_OR/OP_NOT Query.h:182-184, special operators
``gbsortby:/gbsortbyint:/gbfacetstr:/gbmin:/gbmax:`` Query.cpp:2555-2613.

Grammar (subset matching the reference's default behaviour):
- bare terms           → AND-ed (default AND semantics)
- ``"quoted phrase"``  → consecutive-position phrase match
- ``-term``            → NOT
- ``term1 OR term2``   → union groups
- ``lang:xx``          → document-field restriction (also site: ip:
  country: type: and any doc column; url: substring; ext: url extension;
  suburl: url component; title: title word; urlhash: uh48 equality —
  Query.h:69-110 field table)
- ``link:url`` / ``links:url`` / ``sitelink:site`` → link-graph
  restriction served from the linkdb index (Query.h:80-83, Linkdb.cpp)
- ``gbfacetint:/gbfacetfloat:`` → numeric facet counts (gbfacetstr twins)
- ``gbsortby:field``   → sort override
- ``gbfacetstr:field`` → return facet counts instead of results
- ``~term``            → synonym expansion via a broadcast dictionary (G6)

``compile_query`` parses to a ``ParsedQuery``; ``run_query`` executes it
against (docs, postings) with the plans in plans/search.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import search as S

FIELD_RE = re.compile(r"^([a-z]+):(.+)$")

# built-in dictionary (G6): the reference ships a dictionary-driven
# Speller (Speller.cpp:2251); this rebuild ships a compact curated table
# (functions/synonyms.py) as the default, overridable per call — the
# per-collection dict override analog
from ..functions.synonyms import DEFAULT_DICTIONARY as DEFAULT_SYNONYMS


@dataclass
class ParsedQuery:
    and_groups: list[list[str]] = field(default_factory=list)
    # each group is OR-ed internally; groups AND-ed together
    not_terms: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)
    fields: dict[str, str] = field(default_factory=dict)
    sort_by: str | None = None
    sort_asc: bool = True      # gbsortby sorts low→high (Query.cpp:2556);
    # gbrevsortby[int] flips it
    facet_by: str | None = None
    facet_cast: str | None = None  # gbfacetint → long, gbfacetfloat →
    # double (FIELD_GBFACETINT/FLOAT twins of gbfacetstr,
    # Query.cpp:2555-2613)
    # gbmin:/gbmax:/gbequal: numeric range constraints on the sort field
    # termlist (FIELD_GBNUMBERMIN/MAX/EQUALFLOAT + INT twins,
    # Query.cpp:2557-2573): list of (field, op, value)
    num_filters: list = field(default_factory=list)


def parse(q: str, synonyms: dict[str, list[str]] | None = None
          ) -> ParsedQuery:
    syn = DEFAULT_SYNONYMS if synonyms is None else synonyms
    pq = ParsedQuery()
    # phrases first
    for m in re.finditer(r'"([^"]+)"', q):
        pq.phrases.append(m.group(1).lower().split())
    q = re.sub(r'"[^"]+"', " ", q)
    tokens = q.split()
    i = 0
    pending_or: list[str] | None = None
    while i < len(tokens):
        tok = tokens[i]
        low = tok.lower()
        if low == "or":
            i += 1
            continue
        if tok.startswith("-") and len(tok) > 1:
            pq.not_terms.append(tok[1:].lower())
            i += 1
            continue
        fm = FIELD_RE.match(low)
        if fm:
            key, val = fm.groups()
            if key in ("gbsortby", "gbsortbyint"):
                pq.sort_by, pq.sort_asc = val, True
            elif key in ("gbrevsortby", "gbrevsortbyint"):
                pq.sort_by, pq.sort_asc = val, False
            elif key in ("gbmin", "gbminint", "gbmax", "gbmaxint",
                         "gbequal", "gbequalint"):
                # gbmin:price:1.23 (Query.cpp:2614 firstColon split)
                fld, _, num = val.partition(":")
                if num:
                    op = {"gbmin": ">=", "gbmax": "<=",
                          "gbequal": "=="}[key.replace("int", "")]
                    pq.num_filters.append((fld, op, float(num)))
            elif key in ("gbfacetstr", "gbfacetint", "gbfacetfloat"):
                pq.facet_by = val
                pq.facet_cast = {"gbfacetstr": None,
                                 "gbfacetint": "long",
                                 "gbfacetfloat": "double"}[key]
            else:
                pq.fields[key] = val
            i += 1
            continue
        terms = [low]
        if tok.startswith("~"):
            base = low[1:]
            terms = [base] + syn.get(base, [])
        # OR-chaining: a OR b OR c into one group
        if i + 1 < len(tokens) and tokens[i + 1].lower() == "or":
            if pending_or is None:
                pending_or = []
            pending_or.extend(terms)
            i += 2
            # continue collecting into the same group
            if i < len(tokens):
                continue
            pq.and_groups.append(pending_or)
            pending_or = None
            continue
        if pending_or is not None:
            pending_or.extend(terms)
            pq.and_groups.append(pending_or)
            pending_or = None
            i += 1
            continue
        pq.and_groups.append(terms)
        i += 1
    if pending_or:
        pq.and_groups.append(pending_or)
    return pq


def _phrase_match(postings: DataFrame, docs: DataFrame,
                  phrase: list[str],
                  split_pattern: str = " ",
                  postings_pos: DataFrame | None = None) -> DataFrame:
    """Docs containing the exact phrase: cheap candidate prune via AND on
    the terms, then POSITIONAL verification — consecutive positions from
    the positional postings (the reference verifies phrases with
    position pairs, Posdb.cpp:5437+; round 2 used a substring check).

    With a PREBUILT ``postings_pos`` (the serving-tier state — posdb is
    built once per index generation, Posdb.cpp), verification is a
    left-semi prune of that table: no per-query re-tokenization."""
    cand = S.and_query(postings, phrase).select("doc_id")
    if postings_pos is not None:
        pp = postings_pos.join(cand, "doc_id", "left_semi")
    else:
        cand_docs = docs.join(cand, "doc_id", "left_semi")
        pp = S.build_postings_positional(cand_docs,
                                         split_pattern=split_pattern)
    return S.phrase_match_positional(pp, phrase).select("doc_id")


LINK_FIELDS = ("link", "links", "sitelink")


def run_query(q: str, docs: DataFrame, postings: DataFrame, k: int = 10,
              synonyms: dict[str, list[str]] | None = None,
              linkdb: DataFrame | None = None,
              n_docs: int | None = None,
              postings_pos: DataFrame | None = None) -> DataFrame:
    """Compile + execute one query.

    Serving-tier state is PASSED IN, not rebuilt per query: ``n_docs``
    (corpus size — changes per index build; without it a per-query
    ``docs.count()`` action fires), ``postings_pos`` (prebuilt positional
    posdb for phrase verification), and ``linkdb`` (the link-graph index
    from plans/search.py:build_linkdb, required by
    ``link:``/``links:``/``sitelink:`` — Query.h:80-83, served from
    Linkdb in the reference)."""
    pq = parse(q, synonyms)
    link_restricts = [(key, pq.fields.pop(key))
                      for key in LINK_FIELDS if key in pq.fields]
    if link_restricts and linkdb is None:
        raise ValueError(
            "link:/links:/sitelink: queries need a linkdb "
            "(plans/search.py:build_linkdb) — Query.h:80-83")
    matched: DataFrame | None = None
    all_terms: list[str] = []
    for group in pq.and_groups:
        all_terms.extend(group)
        g = S.or_query(postings, group).select("doc_id")
        matched = g if matched is None else matched.join(g, "doc_id")
    for phrase in pq.phrases:
        all_terms.extend(phrase)
        ph = _phrase_match(postings, docs, phrase,
                           postings_pos=postings_pos)
        matched = ph if matched is None else matched.join(ph, "doc_id")
    # link:/links:/sitelink: restrictions — pure linkdb lookups
    # (plans/search.py:link_query/sitelink_query; Linkdb.cpp range scan)
    for key, val in link_restricts:
        lk = (S.sitelink_query(linkdb, val) if key == "sitelink"
              else S.link_query(linkdb, val))
        matched = lk if matched is None else matched.join(lk, "doc_id")
    if matched is None:
        matched = docs.select("doc_id")
    if pq.not_terms:
        matched = S.not_filter(matched, postings, pq.not_terms)
    # field restrictions on the doc table (Query.h:69-110 field table:
    # site/ip/lang/country/type resolve to plain column equality when the
    # doc table carries the column; ext/suburl/title/urlhash derive from
    # the url/title columns)
    enriched = matched.join(docs, "doc_id")
    for key, val in pq.fields.items():
        if key == "url" and "url" in docs.columns:
            enriched = enriched.filter(F.col("url").contains(val))
        elif key == "ext" and "url" in docs.columns:
            # FIELD_EXT: url filename extension equality
            fname = F.element_at(
                F.split(F.substring_index(F.col("url"), "?", 1), "/"), -1)
            ext = F.lower(F.regexp_extract(fname,
                                           r"\.([A-Za-z0-9]+)$", 1))
            enriched = enriched.filter(ext == val)
        elif key == "suburl" and "url" in docs.columns:
            # FIELD_SUBURL: any url component (split on punctuation)
            # equals the value — the indexed-url-word analog
            comps = F.split(F.lower(F.col("url")), r"[:/?.=&_\-]+")
            enriched = enriched.filter(F.array_contains(comps, val))
        elif key == "title" and "title" in docs.columns:
            # FIELD_TITLE: word match within the title
            enriched = enriched.filter(F.array_contains(
                F.split(F.lower(F.col("title")), r"\s+"), val))
        elif key == "urlhash" and "url" in docs.columns:
            # FIELD_URLHASH: canonical 48-bit url hash equality
            from ..functions import udfs
            enriched = enriched.filter(
                udfs.uh48_udf(F.col("url")) == int(val))
        elif key in docs.columns:
            # site:/ip:/lang:/country:/type:/any generic column
            enriched = enriched.filter(
                F.lower(F.col(key).cast("string")) == val)
    # gbmin:/gbmax:/gbequal: numeric constraints (Query.cpp:2557-2573)
    for fld, op, num in pq.num_filters:
        if fld not in docs.columns:
            continue
        c = F.col(fld).cast("double")
        enriched = enriched.filter(
            c >= num if op == ">=" else (c <= num if op == "<="
                                         else c == num))
    if pq.facet_by:
        fc = F.col(pq.facet_by)
        if pq.facet_cast:
            fc = fc.cast(pq.facet_cast)
        return (enriched.groupBy(fc.alias(pq.facet_by))
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.desc("n"), F.asc(pq.facet_by)))
    # scoring
    matched2 = enriched.select("doc_id").distinct()
    if all_terms:
        if n_docs is None:
            n_docs = docs.count()
        base = (postings.filter(F.col("term").isin(all_terms))
                .groupBy("doc_id")
                .agg(F.sum("tf").alias("sum_tf"),
                     F.min("first_pos").alias("best_pos")))
        scored = S.score(matched2.join(base, "doc_id"), postings,
                         all_terms, n_docs)
    else:
        scored = matched2.withColumn("score", F.lit(0.0)) \
            .withColumn("best_pos", F.lit(0))
    out = scored.join(docs, "doc_id")
    if pq.sort_by and pq.sort_by in docs.columns:
        order = (F.asc(pq.sort_by) if pq.sort_asc
                 else F.desc(pq.sort_by))
        return out.orderBy(order, F.asc("doc_id")).limit(k)
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
