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


def proximity_pairs(postings_pos: DataFrame, term_a: str, term_b: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Term-pair proximity per doc (the positional half of
    PosdbTable::intersectLists10_r, Posdb.cpp:5437+): for docs containing
    BOTH terms, min |pos_a - pos_b| over the two position lists via a
    codegen nested array transform — O(tf_a * tf_b) per doc, all
    JVM-side.  Returns (doc_id, min_gap)."""
    a = (postings_pos.filter(F.col("term") == term_a)
         .select(id_col, F.col("positions").alias("pa")))
    b = (postings_pos.filter(F.col("term") == term_b)
         .select(id_col, F.col("positions").alias("pb")))
    return (a.join(b, id_col)
            .withColumn(
                "min_gap",
                F.array_min(F.flatten(F.transform(
                    "pa", lambda x: F.transform(
                        "pb", lambda y: F.abs(x - y))))))
            .select(id_col, "min_gap"))


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
           lang: str | None = None) -> DataFrame:
    """Full pipeline: AND match → score → (lang: filter) → site clustering
    → top-k → titlerec join (docid→doc broadcast lookup)."""
    n_docs = docs.count()
    matched = and_query(postings, terms)
    scored = score(matched, postings, terms, n_docs)
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
