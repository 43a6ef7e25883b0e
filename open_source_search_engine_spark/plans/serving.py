"""Result-serving tier: title + best-sentence summary + highlighted
snippet (SURVEY §2.E11 full form).

Reference: Title::setTitle (Title.cpp:230,1940) picks the <title> body;
Summary::getBestWindow (Summary.cpp:656) scores windows around query-term
matches favouring match diversity; Highlight::set (Highlight.cpp:359)
wraps query terms in bold tags.  Window selection runs at true TOKEN
granularity (round 5, :func:`best_windows`): a sliding w-token window
scored by the number of DISTINCT query terms it contains, earliest
window wins ties, score 0 falls back to the leading window — the shared
spec with the Python kernel (kernel/urlflags.py:best_window) and the
DuckDB oracle (__spark_entry__.search_summary).  The earlier
sentence-granularity form (:func:`best_sentences`,
urlflags.best_sentence) is kept: it is the cheaper shape when sentence
bounds suffice, and its tests pin the shared scoring spec.

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


WINDOW_TOKENS = 12


def best_windows(docs: DataFrame, terms: list[str],
                 w: int = WINDOW_TOKENS,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, summary, summary_start, summary_score) — the best-scoring
    ``w``-token sliding window per doc (Summary::getBestWindow,
    Summary.cpp:656, at true token granularity — round-5 upgrade of
    :func:`best_sentences`; kernel twin urlflags.best_window).  A best
    region buried mid-sentence or spanning a sentence boundary is found,
    which the sentence form missed.  One posexplode of window starts +
    slice/concat_ws + one map-side-combining max_by — no window sort,
    no Python; runs on the ≤k matched docs, so the explode is bounded
    by k × doc tokens."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    wins = (docs.select(
        F.col(id_col), toks.alias("_toks"),
        F.explode(F.sequence(
            F.lit(1), F.greatest(F.lit(1), n - F.lit(w - 1))))
        .alias("_start"))
        .select(id_col, "_start",
                F.concat_ws(" ", F.slice(F.col("_toks"),
                                         F.col("_start"), w))
                .alias("_win")))
    scored = wins.withColumn("_score", _sent_score(F.col("_win"), terms))
    # argmax by (score desc, start asc): max_by over (score, -start)
    return (scored.groupBy(id_col)
            .agg(F.max_by(
                F.struct(F.col("_win"), F.col("_start"), F.col("_score")),
                F.struct(F.col("_score"), (-F.col("_start")).alias("_n")))
                .alias("_b"))
            .select(id_col, F.col("_b._win").alias("summary"),
                    (F.col("_b._start") - 1).alias("summary_start"),
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
    summ = best_windows(top.select("doc_id", text_col), terms,
                        text_col=text_col).drop("summary_start")
    out = (top.join(summ, "doc_id")
           .withColumn("snippet",
                       highlight_col(F.col("summary"), terms)))
    cols = ["doc_id", "score", "summary", "summary_score", "snippet"]
    if title_col and title_col in top.columns:
        cols.insert(1, title_col)
    return out.select(*cols)
