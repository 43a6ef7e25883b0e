"""Result-serving tier: title + best-sentence summary + highlighted
snippet (SURVEY §2.E11 full form).

Reference: Title::setTitle (Title.cpp:230,1940) picks the <title> body;
Summary::getBestWindow (Summary.cpp:656) scores windows around query-term
matches favouring match diversity; Highlight::set (Highlight.cpp:359)
wraps query terms in bold tags.  This rebuild restates window selection
at SENTENCE granularity — score = number of DISTINCT query terms in the
sentence, earliest sentence wins ties, score 0 falls back to the leading
sentence — the shared spec with the Python kernel
(kernel/urlflags.py:best_sentence) and the DuckDB oracle
(__spark_entry__.search_summary).

Everything is built-in Column expressions (split/posexplode/instr/
max_by/regexp_replace) — no Python in the serving hot path; titles from
raw html use the tokenizer UDF only at INDEX time (the reference also
materializes titlerecs at index time, Titledb.cpp)."""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sentence_split(text: Column) -> Column:
    """Literal '. ' split — identical in the Python kernel (str.split),
    Spark (regex-escaped), and DuckDB (string_split)."""
    return F.split(text, r"\. ")


def _sent_score(sent: Column, terms: list[str]) -> Column:
    """# of DISTINCT query terms contained in the lowercased sentence
    (the match-diversity component of Summary::getBestWindow)."""
    low = F.lower(sent)
    score = F.lit(0)
    for t in terms:
        score = score + F.when(F.instr(low, t.lower()) > 0,
                               1).otherwise(0)
    return score


def best_sentences(docs: DataFrame, terms: list[str],
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(id, summary, summary_score) — the best-scoring sentence per doc.
    One posexplode + one map-side-combining max_by aggregation; no
    window sort."""
    sents = docs.select(
        F.col(id_col),
        F.posexplode(sentence_split(F.col(text_col)))
        .alias("_idx", "_sent"))
    scored = sents.withColumn("_score", _sent_score(F.col("_sent"), terms))
    # argmax by (score desc, idx asc): max_by over (score, -idx)
    return (scored.groupBy(id_col)
            .agg(F.max_by(
                F.struct(F.col("_sent"), F.col("_score")),
                F.struct(F.col("_score"), (-F.col("_idx")).alias("_n")))
                .alias("_b"))
            .select(id_col, F.col("_b._sent").alias("summary"),
                    F.col("_b._score").alias("summary_score")))


def highlight_col(text: Column, terms: list[str]) -> Column:
    """Highlight::set analog: case-insensitive word-boundary wrap in
    <b></b>, case preserved (kernel twin: urlflags.highlight)."""
    if not terms:
        return text
    pat = "(?i)\\b(" + "|".join(_re.escape(t) for t in terms) + ")\\b"
    return F.regexp_replace(text, pat, "<b>$1</b>")


def serve_results(docs: DataFrame, postings: DataFrame,
                  terms: list[str], k: int = 10,
                  n_docs: int | None = None,
                  text_col: str = "text",
                  title_col: str | None = "title") -> DataFrame:
    """Full serving pipeline: search top-k → best-sentence summary →
    highlighted snippet (+ title passthrough when the doc table carries
    one).  State (postings, n_docs) is passed in — zero driver actions
    per query."""
    from . import search as S
    top = S.search(docs, postings, terms, k=k, n_docs=n_docs)
    summ = best_sentences(top.select("doc_id", text_col), terms,
                          text_col=text_col)
    out = (top.join(summ, "doc_id")
           .withColumn("snippet",
                       highlight_col(F.col("summary"), terms)))
    cols = ["doc_id", "score", "summary", "summary_score", "snippet"]
    if title_col and title_col in top.columns:
        cols.insert(1, title_col)
    return out.select(*cols)
