"""Serving tier E11 full form (round 4): best-sentence summary +
highlighting — plans/serving.py vs the kernel spec
(kernel/urlflags.py best_sentence/highlight), plus the end-to-end
serve_results pipeline and title extraction from real html."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.kernel import urlflags
from open_source_search_engine_spark.plans.serving import (
    best_sentences, highlight_col, serve_results,
)

TEXTS = [
    (0, "intro words here. the data engine answers a query fast. tail."),
    (1, "no hits at all. still no hits. none."),
    (2, "data only here. query only there. data meets query here."),
    (3, "data. data again. data and data still"),
    (4, "single sentence with data and query"),
]
TERMS = ["data", "query"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, ["doc_id", "text"])


def test_best_sentence_kernel_column_parity(docs):
    got = {r.doc_id: (r.summary, r.summary_score)
           for r in best_sentences(docs, TERMS).collect()}
    for doc_id, text in TEXTS:
        _, sent, score = urlflags.best_sentence(text, TERMS)
        assert got[doc_id] == (sent, score), \
            f"doc {doc_id}: {got[doc_id]} != {(sent, score)}"
    # diversity beats repetition: doc 2 picks the 2-term sentence
    assert got[2][0] == "data meets query here."
    # zero hits fall back to the leading sentence
    assert got[1] == ("no hits at all", 0)


def test_highlight_kernel_column_parity(docs):
    out = {r.doc_id: r.h for r in docs.select(
        "doc_id", highlight_col(F.col("text"), TERMS).alias("h"))
        .collect()}
    for doc_id, text in TEXTS:
        assert out[doc_id] == urlflags.highlight(text, TERMS)
    assert "<b>data</b>" in out[0] and "<b>query</b>" in out[0]
    # case preserved, word-boundary only
    assert urlflags.highlight("Data databank", ["data"]) == \
        "<b>Data</b> databank"


def test_serve_results_pipeline(docs, spark):
    from open_source_search_engine_spark.plans.search import build_postings
    p = build_postings(docs, split_pattern=" ")
    out = serve_results(docs, p, TERMS, k=3, n_docs=len(TEXTS))
    rows = out.collect()
    assert 0 < len(rows) <= 3
    for r in rows:
        assert "<b>" in r.snippet or r.summary_score == 0
        assert r.summary in dict(TEXTS)[r.doc_id]


def test_title_from_html():
    html = ("<html><head><title>The &amp; Title</title></head>"
            "<body><h1>h</h1>data</body></html>")
    assert urlflags.get_title(html) == "The & Title"
