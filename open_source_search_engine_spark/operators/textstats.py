"""Text analysis operators: language-ID heuristic, quality scoring, token
counting, document fingerprinting.

The reference computes langId per doc (XmlDoc::getLangId, XmlDoc.cpp:7186)
from word/charset evidence; quality-ish signals feed the url-filter
(percentchangedperday etc.).  These corpus-scale analogs are all pure
Column expressions so the same logic is expressible in the DuckDB oracle
SQL (driver correctness gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword marker sets per language (heuristic lang-id):
# counts of ' the ' vs ' der ' vs ' le ' etc. over the lowercased text
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "de", "que"],
    "it": ["il", "che", "di"],
}


def _marker_count(text: Column, words: list[str]) -> Column:
    """Occurrences of any marker word (space-delimited) in the text."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), 1))


def langid_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language marker counts + argmax guess."""
    out = df
    for lang, words in LANG_MARKERS.items():
        out = out.withColumn(f"score_{lang}",
                             _marker_count(F.col(text_col), words))
    # argmax with deterministic tie-break on language code order
    best = None
    for lang in sorted(LANG_MARKERS):
        cand = F.struct(F.col(f"score_{lang}").alias("s"),
                        F.lit(lang).alias("l"))
        best = cand if best is None else F.when(
            (cand["s"] > best["s"]), cand).otherwise(best)
    return out.withColumn("lang_guess",
                          F.when(best["s"] > 0, best["l"])
                          .otherwise(F.lit("und")))


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish regex token count: word pieces + digits + punctuation, the
    common pre-tokenizer shape."""
    return F.size(F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    quality signals (the usual pretraining-filter features)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_stop = _marker_count(t, ["the", "and", "of", "to", "a", "in"])
    return (df
            .withColumn("n_chars2", n_chars)
            .withColumn("n_tokens", n_tokens)
            .withColumn("punct_ratio",
                        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6))
            .withColumn("stopword_ratio",
                        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6))
            .withColumn("mean_word_len",
                        F.round(n_chars / F.greatest(n_tokens, F.lit(1)),
                                6)))


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints: md5 of normalized text (exact)
    + xxhash64 (cheap 64-bit)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return (df
            .withColumn("fp_md5", F.md5(norm))
            .withColumn("fp_xx64", F.xxhash64(norm)))
