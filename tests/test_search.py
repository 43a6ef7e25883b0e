"""Query-serving tier tests (plans/search.py): boolean ops, scoring,
clustering, dedup — SURVEY §3.2."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark data query engine fast data", "en", "siteA"),
        (1, "data query planner", "en", "siteA"),
        (2, "data only here", "en", "siteB"),
        (3, "query only here", "de", "siteB"),
        (4, "nothing relevant", "en", "siteC"),
        (5, "data query data query data query", "de", "siteC"),
        (6, "data query planner", "en", "siteD"),  # content dup of 1
    ]
    return spark.createDataFrame(rows,
                                 ["doc_id", "text", "lang", "site"])


@pytest.fixture(scope="module")
def postings(corpus):
    from open_source_search_engine_spark.plans.search import build_postings
    return build_postings(corpus, split_pattern=" ").cache()


def test_postings_positions(postings):
    rows = {(r.term, r.doc_id): (r.tf, r.first_pos)
            for r in postings.collect()}
    assert rows[("data", 0)] == (2, 1)
    assert rows[("spark", 0)] == (1, 0)
    assert rows[("query", 5)] == (3, 1)


def test_and_query(postings):
    from open_source_search_engine_spark.plans.search import and_query
    got = {r.doc_id for r in and_query(postings,
                                       ["data", "query"]).collect()}
    assert got == {0, 1, 5, 6}


def test_or_and_not(postings):
    from open_source_search_engine_spark.plans.search import (
        and_query, not_filter, or_query,
    )
    got = {r.doc_id for r in or_query(postings,
                                      ["data", "query"]).collect()}
    assert got == {0, 1, 2, 3, 5, 6}
    m = and_query(postings, ["data", "query"])
    got2 = {r.doc_id for r in
            not_filter(m, postings, ["planner"]).collect()}
    assert got2 == {0, 5}


def test_scoring_orders_by_tf(corpus, postings):
    from open_source_search_engine_spark.plans.search import (
        and_query, score,
    )
    m = and_query(postings, ["data", "query"])
    s = score(m, postings, ["data", "query"], corpus.count())
    ranked = [r.doc_id for r in
              s.orderBy(F.desc("score"), F.asc("doc_id")).collect()]
    assert ranked[0] == 5  # highest combined tf


def test_search_pipeline_clustering_and_dedup(corpus, postings):
    from open_source_search_engine_spark.plans.search import search
    out = search(corpus, postings, ["data", "query"], k=10,
                 site_col="site", cluster_per_site=1,
                 dedup_content=True)
    rows = out.collect()
    # content dup (1 vs 6) collapsed; one per site
    sites = [r.site for r in rows]
    assert len(sites) == len(set(sites))
    ids = {r.doc_id for r in rows}
    assert not {1, 6} <= ids  # dup pair collapsed to one


def test_lang_filter(corpus, postings):
    from open_source_search_engine_spark.plans.search import search
    out = search(corpus, postings, ["data", "query"], k=10, lang="de")
    assert {r.doc_id for r in out.collect()} == {5}


def test_facets(corpus, postings):
    from open_source_search_engine_spark.plans.search import (
        and_query, facet_counts,
    )
    m = and_query(postings, ["data", "query"]).select("doc_id")
    out = {r.lang: r.n for r in facet_counts(m, corpus, "lang").collect()}
    assert out == {"en": 3, "de": 1}


def test_proximity_pairs_and_score(spark):
    """Positional proximity (Posdb.cpp:5437 positional half): min gap per
    doc + pairwise inverse-distance score."""
    from open_source_search_engine_spark.plans.search import (
        build_postings_positional, proximity_pairs, proximity_score,
    )
    docs = spark.createDataFrame([
        (0, "alpha beta gamma"),            # gap(alpha,gamma)=2
        (1, "alpha x y z gamma alpha"),     # min gap = 1 (gamma,alpha@5)
        (2, "alpha only here"),             # no gamma → excluded
        (3, "gamma alpha"),                 # gap 1
    ], ["doc_id", "text"])
    pp = build_postings_positional(docs, split_pattern=" ")
    gaps = {r.doc_id: r.min_gap for r in
            proximity_pairs(pp, "alpha", "gamma").collect()}
    assert gaps == {0: 2, 1: 1, 3: 1}
    prox = {r.doc_id: r.prox for r in
            proximity_score(pp, ["alpha", "gamma"]).collect()}
    assert abs(prox[0] - 1.0 / 3) < 1e-9
    assert abs(prox[1] - 0.5) < 1e-9


def test_phrase_match_positional(spark):
    """Phrase verify via consecutive positions, not substring: 'beta
    gamma' must NOT match a doc with beta..x..gamma, and repeated
    occurrences are counted."""
    from open_source_search_engine_spark.plans.search import (
        build_postings_positional, phrase_match_positional,
    )
    docs = spark.createDataFrame([
        (0, "alpha beta gamma delta"),       # 1 occurrence
        (1, "beta x gamma"),                 # terms present, not adjacent
        (2, "beta gamma beta gamma"),        # 2 occurrences
        (3, "gamma beta"),                   # wrong order
        (4, "beta gamma"),                   # 1 occurrence
    ], ["doc_id", "text"])
    pp = build_postings_positional(docs, split_pattern=" ")
    got = {r.doc_id: r.n_occurrences for r in
           phrase_match_positional(pp, ["beta", "gamma"]).collect()}
    assert got == {0: 1, 2: 2, 4: 1}
    # 3-term phrase
    got3 = {r.doc_id: r.n_occurrences for r in
            phrase_match_positional(
                pp, ["alpha", "beta", "gamma"]).collect()}
    assert got3 == {0: 1}


def test_search_proximity_fold(spark):
    """proximity_weight folds the positional pair bonus into search()
    scoring: the doc with adjacent query terms outranks the doc where
    they are far apart (equal tf-idf otherwise)."""
    from pyspark.sql import functions as F  # noqa: F401
    from open_source_search_engine_spark.plans.search import (
        build_postings, search,
    )
    docs = spark.createDataFrame([
        (0, "alpha gamma pad1 pad2 pad3 pad4", "en"),
        (1, "alpha pad1 pad2 pad3 pad4 gamma", "en"),
    ], ["doc_id", "text", "lang"])
    p = build_postings(docs, split_pattern=" ")
    base = search(docs, p, ["alpha", "gamma"], k=2)
    s0 = {r.doc_id: r.score for r in base.collect()}
    # same tf/positions-agnostic score without proximity... best_pos
    # differs only via the 1/(1+best_pos) bonus, equal here (both pos 0)
    assert abs(s0[0] - s0[1]) < 1e-9
    prox = search(docs, p, ["alpha", "gamma"], k=2, proximity_weight=1.0)
    rows = sorted(prox.collect(), key=lambda r: -r.score)
    assert rows[0].doc_id == 0  # adjacent pair wins
    assert rows[0].score > rows[1].score


def test_spell_suggest(spark):
    """Speller::getRecommendation restated (Language.cpp:1385): the
    highest-df edit-distance candidate wins; ties break by (dist, term).
    Pinned golden on a tiny corpus."""
    from open_source_search_engine_spark.plans.search import (
        build_postings, spell_suggest,
    )
    docs = spark.createDataFrame([
        (0, "spark spar scan span spawn", "en"),
        (1, "spark scan span", "en"),
        (2, "spark scan", "en"),
    ], ["doc_id", "text", "lang"])
    p = build_postings(docs, split_pattern=" ")
    got = [(r.qterm, r.term, r.df, r.dist, r.rank)
           for r in spell_suggest(p, ["spak"], max_dist=2, k=3)
           .orderBy("rank").collect()]
    # df: spark=3 scan=3 spar=1 span=2 spawn=1
    # dist to 'spak': spark=1 spar=1 span=1 spawn=2 scan=2
    # order: (df desc, dist asc, term asc) -> spark(3,1) scan(3,2) span(2,1)
    assert got == [("spak", "spark", 3, 1, 1),
                   ("spak", "scan", 3, 2, 2),
                   ("spak", "span", 2, 1, 3)]


def test_phonetic_key_kernel_column_parity(spark):
    """kernel/phonet.phonetic_key == plans/search.phonetic_key_col on a
    word set covering vowels-only tails, run collapse, non-letter
    leads, and short words."""
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.kernel.phonet import phonetic_key
    from open_source_search_engine_spark.plans.search import (
        phonetic_key_col,
    )
    words = ["robert", "rupert", "ashcraft", "colour", "callar", "query",
             "quary", "quart", "a", "aeiou", "b", "bbbb", "night",
             "nite", "1word", "", "x9z", "mississippi", "pfister"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {r.w: r.k for r in
           df.select("w", phonetic_key_col(F.col("w")).alias("k"))
           .collect()}
    for w in words:
        assert got[w] == phonetic_key(w), (w, got[w], phonetic_key(w))
    # the classic sanity pair
    assert phonetic_key("robert") == phonetic_key("rupert") == "R163"


def test_spell_phonetic_channel_beats_popularity(spark):
    """VERDICT r4 Next #6: (1) a same-pronunciation candidate OUTRANKS a
    more popular edit-distance candidate (Language.cpp:94-100 weights
    pronunciation above popularity); (2) a phonetic-only candidate past
    the levenshtein band still surfaces."""
    from open_source_search_engine_spark.plans.search import (
        build_postings, spell_suggest,
    )
    rows = []
    did = 0
    for text, n in (("query one", 1), ("quart two", 5),
                    ("callar three", 3)):
        for _ in range(n):
            rows.append((did, text))
            did += 1
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    p = build_postings(docs, split_pattern=" ")
    out = spell_suggest(p, ["quary", "colour"]).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qterm, []).append(r)
    # quary: 'query' (phon, df=1) must beat 'quart' (no phon, df=5)
    quary = sorted(by_q["quary"], key=lambda r: r.rank)
    assert quary[0].term == "query" and quary[0].phon
    assert any(r.term == "quart" and not r.phon for r in quary)
    # colour: 'callar' is levenshtein 3 — edit channel alone would miss
    # it; the phonetic key (C460) surfaces it
    colour = {r.term: r for r in by_q["colour"]}
    assert "callar" in colour
    assert colour["callar"].phon and colour["callar"].dist == 3
    # and with the channel off it is absent (the r4 behavior)
    off = spell_suggest(p, ["colour"], phonetic=False).collect()
    assert all(r.term != "callar" for r in off)
