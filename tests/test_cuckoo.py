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
    """True ~0.95 load (ADVICE r4 #2): _n_buckets_for rounds buckets up
    to a power of two, so the key count must sit just under a
    power-of-two capacity.  7800 keys * 1.05 = 8190 slots needed ->
    nb=2048 -> 8192 slots -> load 7800/8192 = 0.952, which forces the
    straggler kick walk after the vectorized placement rounds."""
    keys = np.unique(_keys(8_000, seed=3))[:7_800]
    nb = C._n_buckets_for(len(keys), 1.05)
    assert nb == 2048 and len(keys) / (nb * C.BUCKET_WAYS) > 0.94
    table = C._build_table(keys, nb)
    assert C._lookup(table, keys, nb).all()


def test_over_capacity_raises():
    """More unique keys than slots must raise (the all-or-nothing
    rebuild trigger), not loop in the kick walk."""
    keys = np.unique(_keys(11_000, seed=5))[:9_000]
    nb = C._n_buckets_for(len(keys), 0.9)  # 8100 needed -> 8192 slots
    assert nb * C.BUCKET_WAYS < len(keys)
    with pytest.raises(RuntimeError, match="over capacity"):
        C._build_table(keys, nb)


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


def test_persistent_filter_reuse_delete_parity(spark, tmp_path):
    """VERDICT r4 Wrong #2 closure: with seen_filter_persist=True the
    filter blobs are snapshot state — rounds after the first REUSE and
    mutate them in place (grown by cuckoo_insert at commit, shrunk by
    cuckoo_delete for negative keys) with NO rebuild — and the schedule
    is identical to the rebuild-every-round wiring and to the plain
    exact-only path, deletes included (routing-only contract)."""
    from open_source_search_engine_spark.oracle.crawler import CrawlConfig
    from open_source_search_engine_spark.plans.scheduler import CrawlDriver
    from open_source_search_engine_spark.sources import synthweb

    d = str(tmp_path / "corpus")
    paths = synthweb.write_corpus(d, n_hosts=6, mean_pages=4, n_seeds=3)

    def run(wd, **cfg_kw):
        cfg = CrawlConfig(rounds=4, budget=40, **cfg_kw)
        drv = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"],
                          cfg)
        drv.seed(paths["seeds"])
        drv.run(2)
        # H8 mid-crawl negatives: drop two round-1 scheduled urls; they
        # leave the seen set (and the persistent filter, in place)
        victims = (drv.schedule_df().filter("round = 1")
                   .select("url").orderBy("url").limit(2))
        assert drv.delete_urls(victims) == 2
        drv.run(2)
        sched = [(r.round, r.seq, r.url) for r in
                 drv.schedule_df().orderBy("round", "seq").collect()]
        return drv, sched

    drv_p, persisted = run(str(tmp_path / "persist"),
                           seen_filter="cuckoo", seen_filter_persist=True)
    _, rebuilt = run(str(tmp_path / "rebuild"),
                     seen_filter="cuckoo", seen_filter_persist=False)
    _, exact = run(str(tmp_path / "exact"))

    assert persisted == rebuilt == exact and len(persisted) > 0
    # the persisted run never rebuilt after round 0: built_round pinned
    lin = drv_p._filter_lineage()
    assert lin.get("built_round") == 0, lin
    # and the deletes were applied to the blobs in place (ledger holds
    # exactly the two negative keys)
    applied = drv_p.t_neg_applied.read(spark)
    assert applied is not None and applied.count() == 2
