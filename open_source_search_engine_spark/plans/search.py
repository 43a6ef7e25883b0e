"""The query-serving tier (SURVEY §3.2): posdb-style postings + the
/search pipeline re-expressed as DataFrame plans.

Reference lifecycle (PageResults → Msg40 → Msg3a → per-shard Msg39 →
PosdbTable::intersectLists10_r → TopTree → Msg20 summaries):

- postings build  : docs → (term, doc_id, tf, first_pos) rows — the posdb
                    key space (<termId><docId><pos>, Posdb.h:1-50) as a
                    table bucketed by term (shard-by-termid, like the
                    reference's "index stripe" layout)
- boolean query   : AND = groupBy(doc) HAVING count(distinct term)=N
                    (the zipper intersection, Posdb.cpp:5437), OR = union,
                    NOT = anti-join (Query.h:182 OP_AND/OR/NOT)
- scoring         : tf-idf-ish (the reference scores positional/density;
                    we score tf * log(N/df) + early-position bonus — the
                    same monotone shape without positional pairs)
- top-k           : ORDER BY score LIMIT k = TopTree + Msg3a merge
                    (partial per-partition top-k then final, automatic)
- site clustering : ≤2 results per site (Msg39 m_doSiteClustering)
- dup removal     : content-hash dedup (Msg39 m_doDupContentRemoval)
- field operators : lang:xx site:host url-substring — column predicates
                    (Query.h:69-110 field table)
- gbsortby/gbfacet: numeric sort override / facet counts
                    (Query.cpp:2555-2613)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_postings(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   split_pattern: str = r"\s+") -> DataFrame:
    """Positional postings: one row per (term, doc) with tf + first
    position. Bucket/shuffle key = term (posdb shards by termid)."""
    toks = (docs
            .select(id_col,
                    F.posexplode(F.split(F.lower(F.col(text_col)),
                                         split_pattern))
                    .alias("pos", "term"))
            .filter(F.length("term") > 0))
    return (toks.groupBy("term", id_col)
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.min("pos").alias("first_pos")))


def term_stats(postings: DataFrame) -> DataFrame:
    """df per term (Msg37 termFreq analog)."""
    return postings.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"))


def phonetic_key_col(word) -> "F.Column":
    """Column twin of kernel/phonet.phonetic_key (the simplified-soundex
    restatement of Speller.cpp:263's phonet channel) — translate +
    per-digit run collapse + zero drop, byte-identical to the kernel and
    to the DuckDB oracle's SQL form."""
    from ..kernel.phonet import SOUNDEX_CODES, _ALPHABET
    w = F.lower(word)
    first = F.substring(w, 1, 1)
    digits = F.regexp_replace(
        F.translate(w, _ALPHABET, SOUNDEX_CODES), "[^0-6]", "")
    tail = F.substring(digits, 2, 2_147_483_646)
    for d in "123456":
        tail = F.regexp_replace(tail, d + "{2,}", d)
    tail = F.regexp_replace(tail, "0", "")
    return F.when(
        first.rlike("^[a-z]$"),
        F.substring(F.concat(F.upper(first), tail, F.lit("000")), 1, 4)
    ).otherwise(F.lit(""))


def spell_suggest(postings: DataFrame, terms: list[str],
                  max_dist: int = 2, k: int = 5,
                  phonetic: bool = True) -> DataFrame:
    """Spell recommendation: Speller::getRecommendation fragments the
    query (Speller.cpp:263,387) and Language::getRecommendation picks
    the "highest popularity recommendation" among edit-distance
    candidates from the dictionary (Language.cpp:1385-1386, weights at
    Language.cpp:94-100).  Restated over the corpus itself: the
    vocabulary with df as the popularity score; candidates are vocab
    terms within ``levenshtein <= max_dist`` of a query term OR (round
    5) sharing its phonetic key (kernel/phonet.py — the soundslike
    channel, so a same-pronunciation candidate like colour→callar
    surfaces even past the edit-distance band); top-k per term by
    (phonetic-match desc, df desc, dist asc, term asc — the reference's
    pronunciation-above-popularity weighting, fully deterministic).

    Scale shape: the query terms are a tiny exploded literal crossed
    against the DISTINCT-term table (|vocab| << |postings|); the
    length band and the equal-phonetic-key test are both cheap map-side
    prunes BEFORE the quadratic-in-length levenshtein, and no join
    shuffle exists — the only exchange is the per-term top-k over the
    few surviving candidates."""
    from ..operators.windows import topk_per_key
    vocab = term_stats(postings)
    cand = (vocab
            .select("term", "df",
                    F.explode(F.array(*[F.lit(t.lower()) for t in terms]))
                    .alias("qterm")))
    if phonetic:
        cand = (cand
                .withColumn("phon",
                            (phonetic_key_col(F.col("term")) ==
                             phonetic_key_col(F.col("qterm"))) &
                            (phonetic_key_col(F.col("qterm")) != ""))
                .filter(F.col("phon") |
                        (F.abs(F.length("term") - F.length("qterm"))
                         <= max_dist))
                .withColumn("dist", F.levenshtein("term", "qterm"))
                .filter((F.col("phon") | (F.col("dist") <= max_dist))
                        & (F.col("term") != F.col("qterm"))))
        order = [F.desc("phon"), F.desc("df"), F.asc("dist"),
                 F.asc("term")]
        cols = ["qterm", "term", "df", "dist", "phon"]
    else:
        cand = (cand
                .filter(F.abs(F.length("term") - F.length("qterm"))
                        <= max_dist)
                .withColumn("dist", F.levenshtein("term", "qterm"))
                .filter((F.col("dist") <= max_dist)
                        & (F.col("term") != F.col("qterm"))))
        order = [F.desc("df"), F.asc("dist"), F.asc("term")]
        cols = ["qterm", "term", "df", "dist"]
    return (topk_per_key(cand, "qterm", order, k)
            .select(*cols, F.col("rank").cast("int").alias("rank")))


def and_query(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Posting-list intersection: docs containing ALL terms
    (intersectLists10_r zipper → groupBy HAVING)."""
    n = len(terms)
    return (postings.filter(F.col("term").isin(terms))
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("n_terms"),
                 F.sum("tf").alias("sum_tf"),
                 F.min("first_pos").alias("best_pos"))
            .filter(F.col("n_terms") == n)
            .drop("n_terms"))


def or_query(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Union: docs containing ANY term."""
    return (postings.filter(F.col("term").isin(terms))
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("n_terms"),
                 F.sum("tf").alias("sum_tf"),
                 F.min("first_pos").alias("best_pos")))


def not_filter(matched: DataFrame, postings: DataFrame,
               neg_terms: list[str]) -> DataFrame:
    """OP_NOT: anti-join against the negative termlists."""
    neg = postings.filter(F.col("term").isin(neg_terms)) \
        .select("doc_id").distinct()
    return matched.join(neg, "doc_id", "left_anti")


def score(matched: DataFrame, postings: DataFrame, terms: list[str],
          n_docs: int) -> DataFrame:
    """tf-idf + early-position bonus, deterministic and integer-free-tie
    ordered by (score desc, doc_id asc)."""
    stats = F.broadcast(
        term_stats(postings.filter(F.col("term").isin(terms))))
    per_term = (postings.filter(F.col("term").isin(terms))
                .join(stats, "term")
                .withColumn("w",
                            F.col("tf") *
                            F.log(F.lit(float(n_docs)) / F.col("df"))))
    doc_scores = per_term.groupBy("doc_id").agg(
        F.sum("w").alias("tfidf"))
    return (matched.join(doc_scores, "doc_id")
            .withColumn(
                "score",
                F.col("tfidf") + 1.0 / (1.0 + F.col("best_pos"))))


def build_postings_positional(docs: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text",
                              split_pattern: str = r"\s+") -> DataFrame:
    """Full positional postings: (term, doc_id, tf, positions sorted
    array<int>) — the complete posdb key space <termId><docId><pos>
    (Posdb.h:1-50), needed for proximity scoring."""
    toks = (docs
            .select(id_col,
                    F.posexplode(F.split(F.lower(F.col(text_col)),
                                         split_pattern))
                    .alias("pos", "term"))
            .filter(F.length("term") > 0))
    return (toks.groupBy("term", id_col)
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.sort_array(F.collect_list("pos")).alias("positions")))


def build_linkdb(links: DataFrame, id_col: str = "doc_id",
                 target_col: str = "target_url") -> DataFrame:
    """Linkdb build (Linkdb.cpp: keys are <linkeeUrlHash><linkerDocId>,
    written at INDEX time so `link:` queries are a pure key lookup,
    Linkdb.h:28-90): from (linker doc_id, target_url) edges, stamp the
    canonical 48-bit hash and host of each TARGET once.  Query-time
    `link:`/`sitelink:` filters then compare against a driver-computed
    constant — no per-query UDF, no per-query scan of anything but this
    table.  Returns (doc_id, target_url, target_uh48, target_host)."""
    from ..functions import udfs
    return (links
            .select(F.col(id_col).alias("doc_id"),
                    udfs.canonicalize_udf(F.col(target_col))
                    .alias("target_url"))
            .filter(F.length("target_url") > 0)
            .withColumn("target_uh48", udfs.uh48_udf(F.col("target_url")))
            .withColumn("target_host", udfs.host_udf(F.col("target_url"))))


def link_query(linkdb: DataFrame, url: str) -> DataFrame:
    """`link:url` / `links:url` (Query.h:80-82 FIELD_LINK/FIELD_LINKS):
    docs containing a link to the given url — Linkdb range scan on
    uh48(linkee) (Linkdb.cpp getListSize key range).  The hash is
    computed driver-side from the query literal; the plan is a JVM-only
    equality filter."""
    from ..kernel import gbhash, urlnorm
    canon = urlnorm.canonicalize(url)
    target = gbhash.uh48(canon) if canon else -1
    return (linkdb.filter(F.col("target_uh48") == F.lit(target))
            .select("doc_id").distinct())


def sitelink_query(linkdb: DataFrame, site: str) -> DataFrame:
    """`sitelink:site` (Query.h:83 FIELD_SITELINK): docs linking to ANY
    page on the site — Linkdb stores the linkee SITE hash in the key
    prefix for exactly this scan (Linkdb.h:35 linkeeSiteHash32)."""
    s = site.lower().rstrip("/")
    s = s.split("://", 1)[-1]
    return (linkdb.filter(F.col("target_host") == F.lit(s))
            .select("doc_id").distinct())


def _min_cross_gap(pa: Column, pb: Column) -> Column:
    """min |x - y| over two SORTED int arrays as a single linear scan:
    tag-merge the arrays, then one F.aggregate pass tracking the last
    position seen from each side — the gap to the most recent
    opposite-tag element in sorted order IS the minimum (the r2 plan
    materialized the full tf_a x tf_b cross product per doc; this is
    O((tf_a+tf_b) log) for the merge-sort + O(tf_a+tf_b) for the scan,
    and survives a hot term pair with tf~10^3 each)."""
    big = 1 << 30
    merged = F.array_sort(F.concat(
        F.transform(pa, lambda x: F.struct(x.alias("p"),
                                           F.lit(0).alias("t"))),
        F.transform(pb, lambda y: F.struct(y.alias("p"),
                                           F.lit(1).alias("t")))))
    acc0 = F.struct(F.lit(-1).alias("la"), F.lit(-1).alias("lb"),
                    F.lit(big).alias("best"))

    def step(acc, e):
        is_a = e["t"] == 0
        gap = F.when(is_a & (acc["lb"] >= 0), e["p"] - acc["lb"]) \
            .when(~is_a & (acc["la"] >= 0), e["p"] - acc["la"]) \
            .otherwise(F.lit(big))
        return F.struct(
            F.when(is_a, e["p"]).otherwise(acc["la"]).alias("la"),
            F.when(is_a, acc["lb"]).otherwise(e["p"]).alias("lb"),
            F.least(acc["best"], gap).alias("best"))

    return F.aggregate(merged, acc0, step, lambda acc: acc["best"])


def proximity_pairs(postings_pos: DataFrame, term_a: str, term_b: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Term-pair proximity per doc (the positional half of
    PosdbTable::intersectLists10_r, Posdb.cpp:5437+): for docs containing
    BOTH terms, min |pos_a - pos_b| via a linear sorted-merge scan over
    the two (already sorted) position lists — all JVM-side codegen.
    Returns (doc_id, min_gap)."""
    a = (postings_pos.filter(F.col("term") == term_a)
         .select(id_col, F.col("positions").alias("pa")))
    b = (postings_pos.filter(F.col("term") == term_b)
         .select(id_col, F.col("positions").alias("pb")))
    return (a.join(b, id_col)
            .withColumn("min_gap", _min_cross_gap(F.col("pa"),
                                                  F.col("pb")))
            .select(id_col, "min_gap"))


def phrase_match_positional(postings_pos: DataFrame, phrase: list[str],
                            id_col: str = "doc_id") -> DataFrame:
    """Docs containing the EXACT phrase, verified with position
    arithmetic like the reference's positional pair scoring
    (Posdb.cpp:5437+), not substring search: term i of the phrase must
    appear at (start + i) — intersect each term's position list shifted
    by -i; survivors with a non-empty intersection contain the phrase.
    One narrow join per phrase term, each pruned to that term's postings.
    Returns (doc_id, n_occurrences)."""
    out = None
    for i, term in enumerate(phrase):
        t = (postings_pos.filter(F.col("term") == term)
             .select(id_col,
                     F.transform("positions",
                                 lambda p: p - F.lit(i)).alias("_s")))
        if out is None:
            out = t.withColumnRenamed("_s", "_starts")
        else:
            out = (out.join(t, id_col)
                   .withColumn("_starts",
                               F.array_intersect("_starts", "_s"))
                   .drop("_s")
                   .filter(F.size("_starts") > 0))
    return (out.filter(F.size("_starts") > 0)
            .select(id_col, F.size("_starts").alias("n_occurrences")))


def proximity_score(postings_pos: DataFrame, terms: list[str],
                    id_col: str = "doc_id") -> DataFrame:
    """Pairwise proximity bonus summed over all query-term pairs:
    sum over pairs of 1/(1+min_gap).  The reference maps pair distance
    through a fixed score table (Posdb.cpp modifier arrays); we use the
    same monotone inverse-distance shape.  Returns (doc_id, prox)."""
    out = None
    for i in range(len(terms)):
        for j in range(i + 1, len(terms)):
            pg = (proximity_pairs(postings_pos, terms[i], terms[j],
                                  id_col)
                  .withColumn("_p", 1.0 / (1.0 + F.col("min_gap")))
                  .select(id_col, "_p"))
            out = pg if out is None else out.unionByName(pg)
    if out is None:
        raise ValueError("proximity_score needs >= 2 terms")
    return out.groupBy(id_col).agg(F.sum("_p").alias("prox"))


def search(docs: DataFrame, postings: DataFrame, terms: list[str], k: int = 10,
           site_col: str | None = None, cluster_per_site: int = 2,
           dedup_content: bool = False,
           lang: str | None = None,
           proximity_weight: float = 0.0,
           postings_pos: DataFrame | None = None,
           split_pattern: str = " ",
           n_docs: int | None = None) -> DataFrame:
    """Full pipeline: AND match → score (+ optional positional proximity
    bonus, the Posdb.cpp:5437+ pair scoring) → (lang: filter) → site
    clustering → top-k → titlerec join (docid→doc broadcast lookup).

    ``proximity_weight`` > 0 adds proximity_weight * sum over term pairs
    of 1/(1+min_gap) to the score, computed with the linear sorted-merge
    scan; pass ``postings_pos`` to reuse a prebuilt positional table.

    A serving tier passes ``n_docs`` (corpus size changes per index
    build, not per query) so a query plan triggers ZERO driver actions —
    the reference reads its doc count off Titledb metadata, not by
    scanning (Titledb.cpp)."""
    if n_docs is None:
        n_docs = docs.count()
    matched = and_query(postings, terms)
    scored = score(matched, postings, terms, n_docs)
    if proximity_weight > 0 and len(terms) >= 2:
        if postings_pos is None:
            postings_pos = build_postings_positional(
                docs, split_pattern=split_pattern)
        prox = proximity_score(postings_pos, terms)
        scored = (scored.join(prox, "doc_id", "left")
                  .withColumn(
                      "score",
                      F.col("score") + F.lit(proximity_weight) *
                      F.coalesce(F.col("prox"), F.lit(0.0)))
                  .drop("prox"))
    enriched = scored.join(docs, "doc_id")
    if lang is not None:
        enriched = enriched.filter(F.col("lang") == lang)
    if dedup_content:
        w_dup = Window.partitionBy(
            F.md5(F.col("text"))).orderBy(F.asc("doc_id"))
        enriched = (enriched.withColumn("_d", F.row_number().over(w_dup))
                    .filter(F.col("_d") == 1).drop("_d"))
    if site_col is not None:
        w_site = Window.partitionBy(site_col).orderBy(
            F.desc("score"), F.asc("doc_id"))
        enriched = (enriched
                    .withColumn("site_rank", F.row_number().over(w_site))
                    .filter(F.col("site_rank") <= cluster_per_site))
    return (enriched
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))


def facet_counts(matched_docs: DataFrame, docs: DataFrame,
                 facet_col: str) -> DataFrame:
    """gbfacetstr: facet-value counts over the result set."""
    return (matched_docs.join(docs, "doc_id")
            .groupBy(facet_col)
            .agg(F.count(F.lit(1)).alias("n")))
