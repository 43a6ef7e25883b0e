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


def test_best_window_kernel_column_parity(docs):
    """Round-5 token-window form (Summary.cpp:656 at true word-window
    granularity): Spark best_windows == kernel best_window on every
    doc."""
    from open_source_search_engine_spark.plans.serving import best_windows
    got = {r.doc_id: (r.summary_start, r.summary, r.summary_score)
           for r in best_windows(docs, TERMS).collect()}
    for doc_id, text in TEXTS:
        assert got[doc_id] == urlflags.best_window(text, TERMS), \
            f"doc {doc_id}: {got[doc_id]}"


def test_best_window_finds_mid_sentence_region(spark):
    """The fixture the sentence form gets WRONG: one very long sentence
    whose best 12-token region sits mid-sentence.  The sentence form
    returns the whole 40-token sentence; the window form returns the
    12-token region holding both terms (and scores it 2)."""
    from open_source_search_engine_spark.plans.serving import (
        best_sentences, best_windows,
    )
    filler = " ".join(f"w{i}" for i in range(20))
    tail = " ".join(f"v{i}" for i in range(16))
    text = f"{filler} the data engine answers the query fast {tail}"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    win = best_windows(df, TERMS).collect()[0]
    assert win.summary_score == 2
    assert "data" in win.summary and "query" in win.summary
    assert len(win.summary.split(" ")) == 12
    assert win.summary_start > 0, "best region is mid-sentence"
    # kernel twin agrees exactly
    assert (win.summary_start, win.summary, win.summary_score) == \
        urlflags.best_window(text, TERMS)
    # the sentence form cannot isolate it: one giant sentence comes back
    sent = best_sentences(df, TERMS).collect()[0]
    assert len(sent.summary.split(" ")) > 12


def test_best_window_spans_sentence_boundary(spark):
    """A match pair split across '. ' is invisible to the sentence form
    (each sentence scores 1) but the token window captures both."""
    from open_source_search_engine_spark.plans.serving import (
        best_sentences, best_windows,
    )
    text = ("aa bb cc dd ee ff gg hh the data ends. query starts here "
            "and then continues with more words after that")
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    sent = best_sentences(df, TERMS).collect()[0]
    assert sent.summary_score == 1
    win = best_windows(df, TERMS).collect()[0]
    assert win.summary_score == 2
    assert (win.summary_start, win.summary, win.summary_score) == \
        urlflags.best_window(text, TERMS)
