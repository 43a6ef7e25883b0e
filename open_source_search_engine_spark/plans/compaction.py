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


def compact_replies(spark: SparkSession, table: SnapshotTable) -> int:
    from ..sources.snapstore import with_salt
    df = table.read(spark)
    if df is None:
        return 0
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


def compact_requests(spark: SparkSession, table: SnapshotTable) -> int:
    from ..sources.snapstore import with_salt
    df = table.read(spark)
    if df is None:
        return 0
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
    if "first_ip" in df.columns:
        from ..sources.snapstore import with_salt
        df = with_salt(df)
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
