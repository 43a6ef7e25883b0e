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

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..sources.snapstore import SnapshotTable


def compact_replies(spark: SparkSession, table: SnapshotTable) -> int:
    df = table.read(spark)
    if df is None:
        return 0
    w = Window.partitionBy("uh48").orderBy(F.desc("spidered_time_ms"))
    latest = (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))
    n = latest.count()
    table.overwrite(latest, {"compaction": True, "rows": n})
    return n


def compact_requests(spark: SparkSession, table: SnapshotTable) -> int:
    df = table.read(spark)
    if df is None:
        return 0
    w_all = Window.partitionBy("uh48")
    w = Window.partitionBy("uh48").orderBy("hop_count", "added_time_ms")
    merged = (
        df
        # OR-merge the sticky flags across duplicate requests
        # (Spider.cpp:13680-13720 request-inherits-bits semantics)
        .withColumn("is_addurl", F.max("is_addurl").over(w_all))
        .withColumn("parent_is_rss", F.max("parent_is_rss").over(w_all))
        .withColumn("parent_is_sitemap",
                    F.max("parent_is_sitemap").over(w_all))
        .withColumn("discovery_time_ms",
                    F.min("discovery_time_ms").over(w_all))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    n = merged.count()
    table.overwrite(merged, {"compaction": True, "rows": n})
    return n


def compact_inlinks(spark: SparkSession, table: SnapshotTable) -> int:
    """F3 inlink log → distinct (uh48, parent_cblock) pairs
    (Spider.cpp:4290-4332: the count is distinct C-blocks, capped at 20
    at eval time, so the distinct-pair rewrite is lossless).  Without
    this the append log grows one row per surviving link occurrence per
    round and the per-round countDistinct re-aggregates all history —
    O(total links ever); after compaction storage and scan cost are
    bounded by the number of distinct (url, C-block) edges."""
    df = table.read(spark)
    if df is None:
        return 0
    merged = df.dropDuplicates(["uh48", "parent_cblock"])
    n = merged.count()
    table.overwrite(merged, {"compaction": True, "rows": n})
    return n


def compact_frontier(spark: SparkSession, workdir: str) -> dict:
    from ..sources.snapstore import frontier_table
    n_req = compact_requests(spark, frontier_table(workdir, "requests"))
    n_rep = compact_replies(spark, frontier_table(workdir, "replies"))
    n_inl = compact_inlinks(spark, frontier_table(workdir, "inlinks"))
    return {"requests": n_req, "replies": n_rep, "inlinks": n_inl}
