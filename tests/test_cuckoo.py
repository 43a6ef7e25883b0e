"""Cuckoo-filter URL-seen: NumPy kernel properties + Spark plumbing.

Contract (operators/cuckoo.py, after Fan et al. CoNEXT'14):
- no false negatives for inserted keys (lookup of every inserted key hits)
- deletion removes exactly the deleted keys' visibility (no false
  negatives for the keys that stay)
- the Spark routing columns match the NumPy kernel bit-for-bit
"""

import numpy as np
import pytest

from open_source_search_engine_spark.operators import cuckoo as C


def _keys(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 48, size=n, dtype=np.uint64)


def test_build_lookup_no_false_negatives():
    keys = _keys(20_000)
    nb = C._n_buckets_for(len(keys), 1.5)
    table = C._build_table(keys, nb)
    assert C._lookup(table, keys, nb).all()


def test_false_positive_rate_sane():
    keys = _keys(20_000)
    nb = C._n_buckets_for(len(keys), 1.5)
    table = C._build_table(keys, nb)
    probe = _keys(20_000, seed=99)
    fresh = probe[~np.isin(probe, keys)]
    fpr = C._lookup(table, fresh, nb).mean()
    # 2 buckets x 4 ways x 2^-16 fingerprint collision ≈ 0.00012
    assert fpr < 0.005, fpr


def test_delete_forgets_only_the_deleted():
    keys = _keys(10_000)
    nb = C._n_buckets_for(len(keys), 1.5)
    table = C._build_table(keys, nb)
    gone, kept = keys[:500], keys[500:]
    removed = C._delete(table, np.unique(gone), nb)
    assert removed == len(np.unique(gone))
    # kept keys: still zero false negatives (deletion only touched slots
    # holding a matching fingerprint of a deleted key's buckets)
    assert C._lookup(table, kept, nb).all()
    # deleted keys: mostly gone (a residual hit is a fingerprint
    # collision with a kept key — bounded by the FP rate)
    assert C._lookup(table, gone, nb).mean() < 0.01


def test_duplicate_inserts_collapse():
    keys = np.repeat(_keys(1_000), 5)
    nb = C._n_buckets_for(1_000, 1.5)
    table = C._build_table(keys, nb)
    assert C._lookup(table, np.unique(keys), nb).all()
    # set semantics: one stored copy per key -> one delete fully removes
    uniq = np.unique(keys)
    assert C._delete(table, uniq[:10], nb) == 10


def test_high_load_kick_path():
    # 0.95 load exercises the straggler kick walk after the vector rounds
    keys = _keys(4_000, seed=3)
    nb = C._n_buckets_for(len(keys), 1.05)
    table = C._build_table(keys, nb)
    assert C._lookup(table, keys, nb).all()


def test_cuckoo_routing_is_parity_neutral(spark, tmp_path):
    """Cuckoo-routed URL-seen must not change the crawl (routing-only) —
    the cuckoo mirror of test_bloom_parity.py."""
    from open_source_search_engine_spark.oracle.crawler import CrawlConfig
    from open_source_search_engine_spark.plans.scheduler import CrawlDriver
    from open_source_search_engine_spark.sources import synthweb

    d = str(tmp_path / "corpus")
    paths = synthweb.write_corpus(d, n_hosts=6, mean_pages=4, n_seeds=3)

    def run(kind, wd):
        cfg = CrawlConfig(rounds=3, budget=40, seen_filter=kind)
        drv = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"],
                          cfg)
        drv.seed(paths["seeds"])
        drv.run(3)
        return [(r.round, r.seq, r.url) for r in
                drv.schedule_df().orderBy("round", "seq").collect()]

    plain = run("", str(tmp_path / "plain"))
    cuckooed = run("cuckoo", str(tmp_path / "cuckoo"))
    assert plain == cuckooed
    assert len(plain) > 0


@pytest.mark.usefixtures("spark")
def test_spark_roundtrip_and_delete(spark):
    from pyspark.sql import functions as F

    seen = spark.range(5_000).select(
        (F.xxhash64("id").bitwiseAND((1 << 48) - 1)).alias("uh48"))
    filt = C.build_cuckoo(seen, partition_bits=3).cache()
    # every seen key routes to maybe_seen=true (no false negatives)
    routed = C.cuckoo_maybe_seen(seen, filt, partition_bits=3)
    assert routed.filter(~F.col("maybe_seen")).count() == 0
    # fresh keys overwhelmingly route definitely-new
    fresh = spark.range(5_000, 10_000).select(
        (F.xxhash64("id").bitwiseAND((1 << 48) - 1)).alias("uh48"))
    n_fresh = fresh.count()
    maybe = C.cuckoo_maybe_seen(fresh, filt, partition_bits=3) \
        .filter("maybe_seen").count()
    assert maybe < 0.01 * n_fresh
    # negative-key annihilation: deleted keys stop routing as seen,
    # surviving keys keep routing as seen
    dels = seen.limit(300)
    filt2 = C.cuckoo_delete(filt, dels, partition_bits=3)
    still = C.cuckoo_maybe_seen(dels, filt2, partition_bits=3) \
        .filter("maybe_seen").count()
    assert still < 10
    survivors = seen.join(dels, "uh48", "left_anti")
    n_surv = survivors.count()
    ok = C.cuckoo_maybe_seen(survivors, filt2, partition_bits=3) \
        .filter("maybe_seen").count()
    assert ok == n_surv
    filt.unpersist()
