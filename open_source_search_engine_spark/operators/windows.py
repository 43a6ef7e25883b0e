"""Window-function operators shared by the crawl scheduler and the query
tier — the reference's specialized scans re-expressed as Spark windows.

- latest_per_key    : "only latest reply per uh48 survives" (Spider.cpp:822,
                      dedupSpiderdbList reply handling)
- topk_per_key      : winner selection per IP (scanListForWinners top-K,
                      Spider.cpp:3964-5288) and site-clustering limit-2
                      (Msg39 m_doSiteClustering, Clusterdb.cpp)
- spaced_sequence   : per-key cumulative spacing (hammer-queue rate gate,
                      Msg13.cpp:3070-3215)
- global_topk       : TopTree global ORDER BY/LIMIT (TopTree.h:65)

All are pure Column/window plans: partial aggregation + a single hash
shuffle on the key; no Python.  For skewed keys use ``salted_topk_per_key``
which pre-ranks inside salted sub-partitions before the final per-key rank —
the two-phase trick that bounds the hot-IP partition (the reference instead
serializes hot IPs onto one host and caps scan size, Spider.cpp:3941).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, key: str, order_col: str,
                   desc: bool = True) -> DataFrame:
    w = Window.partitionBy(key).orderBy(
        F.desc(order_col) if desc else F.asc(order_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def argmax_per_key(df: DataFrame, key: str | list[str],
                   order_cols: list[str],
                   desc: bool = True) -> DataFrame:
    """latest/first row per key via groupBy + max_by/min_by instead of a
    row_number window: hash aggregation with MAP-SIDE PARTIAL COMBINE, no
    per-partition sort — the scale path for 'latest reply per uh48'.
    Ordering ties resolved by lexicographic struct comparison over
    order_cols.  ``key`` may be a composite (e.g. the salted frontier's
    (first_ip, _salt, uh48) — a superset of the storage bucket keys, so
    the agg reuses the scan partitioning with no exchange)."""
    keys = [key] if isinstance(key, str) else list(key)
    others = [c for c in df.columns if c not in keys]
    ordk = F.struct(*[F.col(c) for c in order_cols])
    pick = F.max_by if desc else F.min_by
    agg = df.groupBy(*keys).agg(
        pick(F.struct(*[F.col(c) for c in others]), ordk).alias("_r"))
    return agg.select(*keys,
                      *[F.col(f"_r.{c}").alias(c) for c in others])


def topk_per_key(df: DataFrame, key: str, order_by: list[Column],
                 k: int, rank_col: str = "rank") -> DataFrame:
    w = Window.partitionBy(key).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))


def salted_topk_per_key(df: DataFrame, key: str, order_by: list[Column],
                        k: int, salt_buckets: int = 16,
                        rank_col: str = "rank") -> DataFrame:
    """Two-phase top-K for skewed keys: rank within (key, salt) keeping k,
    then re-rank the ≤ salt_buckets*k survivors per key.  First phase
    spreads a hot key over ``salt_buckets`` reducers.  The salt hashes the
    ROW (all columns), not monotonically_increasing_id, so the plan is
    deterministic across task retries/repartitions."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                        F.lit(salt_buckets)))
    w1 = Window.partitionBy(key, "_salt").orderBy(*order_by)
    pre = (salted.withColumn("_r1", F.row_number().over(w1))
           .filter(F.col("_r1") <= k).drop("_r1"))
    w2 = Window.partitionBy(key).orderBy(*order_by)
    return (pre.withColumn(rank_col, F.row_number().over(w2))
            .filter(F.col(rank_col) <= k).drop("_salt"))


def spaced_sequence(df: DataFrame, key: str, order_by: list[Column],
                    delay_col: str, start_expr: Column,
                    out_col: str = "fetch_time_ms") -> DataFrame:
    """j-th row of each key scheduled at start + sum(delay of rows before).
    Batch analog of the per-IP download rate gate."""
    w = Window.partitionBy(key).orderBy(*order_by)
    cum = w.rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn(
        out_col,
        start_expr + F.coalesce(F.sum(delay_col).over(cum), F.lit(0)))


def global_topk(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """TakeOrderedAndProject: Spark does partial per-partition top-k then a
    final merge — exactly Msg39 per-shard TopTree + Msg3a merge."""
    return df.orderBy(*order_by).limit(k)
