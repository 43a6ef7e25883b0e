"""Query-language tests (plans/querylang.py): parsing + execution of the
Query.h operator surface."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.plans.querylang import parse, run_query


def test_parse_basics():
    pq = parse('data query -spam lang:de gbsortby:n_chars "fast engine"')
    assert pq.and_groups == [["data"], ["query"]]
    assert pq.not_terms == ["spam"]
    assert pq.fields == {"lang": "de"}
    assert pq.sort_by == "n_chars"
    assert pq.phrases == [["fast", "engine"]]


def test_parse_or_and_synonyms():
    pq = parse("alpha OR beta gamma")
    assert pq.and_groups == [["alpha", "beta"], ["gamma"]]
    pq2 = parse("~fast engine")
    # built-in dictionary (functions/synonyms.py) drives the expansion
    assert pq2.and_groups[0][0] == "fast"
    assert {"quick", "rapid"} <= set(pq2.and_groups[0])


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the fast engine runs data pipelines", "en", 36),
        (1, "a quick engine processes data", "en", 29),
        (2, "slow data processing spam", "en", 25),
        (3, "fast engine fast engine", "de", 23),
        (4, "unrelated words entirely", "en", 24),
    ]
    return spark.createDataFrame(rows,
                                 ["doc_id", "text", "lang", "n_chars"])


@pytest.fixture(scope="module")
def postings(corpus):
    from open_source_search_engine_spark.plans.search import build_postings
    return build_postings(corpus, split_pattern=" ").cache()


def test_and_with_not(corpus, postings):
    out = run_query("data -spam", corpus, postings)
    assert {r.doc_id for r in out.collect()} == {0, 1}


def test_or_groups(corpus, postings):
    out = run_query("fast OR quick engine", corpus, postings)
    assert {r.doc_id for r in out.collect()} == {0, 1, 3}


def test_synonym_expansion(corpus, postings):
    out = run_query("~fast engine", corpus, postings)
    # 'fast' expands to quick/rapid → doc 1 matches too
    assert {r.doc_id for r in out.collect()} == {0, 1, 3}


def test_field_restriction(corpus, postings):
    out = run_query("fast engine lang:de", corpus, postings)
    assert {r.doc_id for r in out.collect()} == {3}


def test_phrase(corpus, postings):
    out = run_query('"fast engine"', corpus, postings)
    assert {r.doc_id for r in out.collect()} == {0, 3}
    # "engine fast" occurs consecutively only in doc 3
    # ("fast engine fast engine")
    out2 = run_query('"engine fast"', corpus, postings)
    assert {r.doc_id for r in out2.collect()} == {3}
    out3 = run_query('"runs quick"', corpus, postings)
    assert {r.doc_id for r in out3.collect()} == set()


def test_gbsortby(corpus, postings):
    # gbsortby sorts the field low→high (Query.cpp:2556 "sorts numbers in
    # a field from low to high"); gbrevsortby flips it
    rows = run_query("engine gbsortby:n_chars", corpus, postings).collect()
    vals = [r.n_chars for r in rows]
    assert vals == sorted(vals)
    rows = run_query("engine gbrevsortby:n_chars", corpus,
                     postings).collect()
    assert [r.doc_id for r in rows][0] == 0  # longest n_chars first


def test_gbmin_gbmax(corpus, postings):
    all_rows = run_query("engine", corpus, postings).collect()
    lo = min(r.n_chars for r in all_rows)
    hi = max(r.n_chars for r in all_rows)
    got = run_query(f"engine gbmin:n_chars:{lo + 1}", corpus,
                    postings).collect()
    assert got and all(r.n_chars >= lo + 1 for r in got)
    got = run_query(f"engine gbmax:n_chars:{hi - 1}", corpus,
                    postings).collect()
    assert got and all(r.n_chars <= hi - 1 for r in got)
    got = run_query(f"engine gbequal:n_chars:{hi}", corpus,
                    postings).collect()
    assert got and all(r.n_chars == hi for r in got)


def test_gbfacetstr(corpus, postings):
    out = {r.lang: r.n for r in
           run_query("engine gbfacetstr:lang", corpus,
                     postings).collect()}
    assert out == {"en": 2, "de": 1}


@pytest.fixture(scope="module")
def url_corpus(spark):
    rows = [
        (0, "fast data engine", "en", 16,
         "http://www.a.com/posts/story-1.html", "Fast Data"),
        (1, "data engine slow", "en", 16,
         "http://www.a.com/feed1.xml", "Slow Feed"),
        (2, "data engine quick", "de", 17,
         "http://b.com/story/page.html", "Quick Data"),
        (3, "unrelated text here", "en", 19,
         "http://b.com/x.html", "Other Title"),
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "n_chars", "url", "title"])


@pytest.fixture(scope="module")
def url_postings(url_corpus):
    from open_source_search_engine_spark.plans.search import build_postings
    return build_postings(url_corpus, split_pattern=" ").cache()


def test_field_ext(url_corpus, url_postings):
    out = run_query("data ext:xml", url_corpus, url_postings)
    assert {r.doc_id for r in out.collect()} == {1}
    out2 = run_query("data ext:html", url_corpus, url_postings)
    assert {r.doc_id for r in out2.collect()} == {0, 2}


def test_field_suburl(url_corpus, url_postings):
    out = run_query("data suburl:story", url_corpus, url_postings)
    assert {r.doc_id for r in out.collect()} == {0, 2}
    # component match, not substring: 'stor' matches nothing
    out2 = run_query("data suburl:stor", url_corpus, url_postings)
    assert out2.count() == 0


def test_field_title(url_corpus, url_postings):
    out = run_query("data title:quick", url_corpus, url_postings)
    assert {r.doc_id for r in out.collect()} == {2}


def test_field_urlhash(url_corpus, url_postings):
    from open_source_search_engine_spark.kernel import gbhash
    h = gbhash.uh48("http://www.a.com/feed1.xml")
    out = run_query(f"data urlhash:{h}", url_corpus, url_postings)
    assert {r.doc_id for r in out.collect()} == {1}


def test_gbfacetint(url_corpus, url_postings):
    out = run_query("data gbfacetint:n_chars", url_corpus, url_postings)
    got = {r.n_chars: r.n for r in out.collect()}
    assert got == {16: 2, 17: 1}


# ---------------------------------------------------------------------------
# link:/links:/sitelink: (Query.h:80-83, served from linkdb — round 4)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def link_corpus(spark):
    rows = [
        (0, "data home page", "http://www.alpha.com/"),
        (1, "data about page", "http://www.alpha.com/about.html"),
        (2, "data news page", "http://www.beta.org/news.html"),
        (3, "data misc page", "http://www.gamma.net/x.html"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "url"])
    edges = spark.createDataFrame(
        [(1, "http://www.alpha.com/"),           # 1 → alpha root
         (2, "http://www.alpha.com/"),           # 2 → alpha root
         (2, "http://www.alpha.com/about.html"),  # 2 → alpha/about
         (3, "http://www.beta.org/news.html"),   # 3 → beta
         (0, "http://www.gamma.net/x.html")],    # 0 → gamma
        ["doc_id", "target_url"])
    from open_source_search_engine_spark.plans.search import (
        build_linkdb, build_postings,
    )
    return (docs, build_postings(docs, split_pattern=" "),
            build_linkdb(edges))


def test_link_field(link_corpus):
    docs, postings, linkdb = link_corpus
    out = run_query("data link:http://www.alpha.com/", docs, postings,
                    linkdb=linkdb, n_docs=4)
    assert {r.doc_id for r in out.collect()} == {1, 2}
    # links: is an alias (FIELD_LINKS)
    out2 = run_query("data links:http://www.alpha.com/about.html", docs,
                     postings, linkdb=linkdb, n_docs=4)
    assert {r.doc_id for r in out2.collect()} == {2}


def test_sitelink_field(link_corpus):
    docs, postings, linkdb = link_corpus
    # anyone linking to ANY page on www.alpha.com
    out = run_query("data sitelink:www.alpha.com", docs, postings,
                    linkdb=linkdb, n_docs=4)
    assert {r.doc_id for r in out.collect()} == {1, 2}
    # scheme prefix is stripped from the site value
    out2 = run_query("data sitelink:http://www.beta.org", docs, postings,
                     linkdb=linkdb, n_docs=4)
    assert {r.doc_id for r in out2.collect()} == {3}


def test_link_canonicalization(link_corpus):
    """The query literal goes through the same Url::set canonicalization
    as the indexed targets — session-id junk doesn't break the lookup."""
    docs, postings, linkdb = link_corpus
    out = run_query(
        "data link:http://www.alpha.com/?PHPSESSID=737aec14eb7b3609",
        docs, postings, linkdb=linkdb, n_docs=4)
    assert {r.doc_id for r in out.collect()} == {1, 2}


def test_link_requires_linkdb(link_corpus):
    docs, postings, _ = link_corpus
    with pytest.raises(ValueError, match="linkdb"):
        run_query("data link:http://www.alpha.com/", docs, postings)


def test_query_plan_fires_zero_jobs(link_corpus):
    """Serving-tier contract (VERDICT r3 item 6): with n_docs +
    postings_pos + linkdb passed in, BUILDING a query plan fires zero
    Spark jobs — no hidden docs.count(), no per-query positional
    rebuild action."""
    from open_source_search_engine_spark.plans.search import (
        build_postings_positional,
    )
    docs, postings, linkdb = link_corpus
    spark = docs.sparkSession
    pp = build_postings_positional(docs, split_pattern=" ")
    tracker = spark.sparkContext.statusTracker()
    n_before = max(tracker.getJobIdsForGroup(None) or [-1])
    _ = run_query('data "about page" link:http://www.alpha.com/',
                  docs, postings, linkdb=linkdb, n_docs=4,
                  postings_pos=pp)
    n_after = max(tracker.getJobIdsForGroup(None) or [-1])
    assert n_after == n_before, \
        f"query plan construction fired jobs {n_before}..{n_after}"
