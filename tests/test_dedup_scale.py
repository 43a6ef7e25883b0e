"""Dedup-tier scale guards (VERDICT r1 item 8): degenerate LSH buckets
must stay linear (star pairs), and SimHash Hamming-band candidates must
find exactly the pairs brute force finds."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.dedup import (
    minhash_lsh_candidates, simhash64, simhash_candidates,
)


def test_degenerate_bucket_is_linear(spark):
    """1000 identical docs share every band bucket: without the cap the
    self-join emits ~500k pairs/band; with it, star pairs → exactly 999
    (all connected to the min doc_id) — the dedup component is intact."""
    n = 1000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated in every document "
              "alpha beta gamma delta epsilon zeta eta theta").alias(
                  "text"))
    pairs = minhash_lsh_candidates(df, bucket_cap=64).collect()
    assert len(pairs) == n - 1
    assert all(p.id_a == 0 for p in pairs)
    assert {p.id_b for p in pairs} == set(range(1, n))


def test_small_buckets_still_all_pairs(spark):
    """Buckets under the cap keep exact all-pairs LSH semantics."""
    texts = ["unique document number %d with words %s" % (
        i, " ".join(f"w{i}x{k}" for k in range(30))) for i in range(6)]
    texts.append(texts[0])  # one exact dup → one candidate pair
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    pairs = {(p.id_a, p.id_b) for p in
             minhash_lsh_candidates(df, bucket_cap=64).collect()}
    assert (0, 6) in pairs


def test_simhash_candidates_match_bruteforce(spark):
    base = ("spark native analytics engine for web scale crawling "
            "with politeness budgets and url frontiers %s")
    rows = []
    for i in range(12):
        # clusters of 3 near-identical docs (1-word delta), 4 clusters
        cluster, variant = divmod(i, 3)
        rows.append((i, base % f"cluster{cluster} variant{variant}"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(p.id_a, p.id_b) for p in
           simhash_candidates(df, max_hamming=3).collect()}
    sig = simhash64(df)
    a = sig.select(F.col("doc_id").alias("id_a"),
                   F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("id_b"),
                   F.col("simhash").alias("sb"))
    brute = {(p.id_a, p.id_b) for p in
             a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
             .withColumn("h",
                         F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
             .filter(F.col("h") <= 3).collect()}
    assert got == brute
    assert len(brute) > 0  # clusters actually produce near-dups