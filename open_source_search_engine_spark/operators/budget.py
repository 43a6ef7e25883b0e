"""Global priority-budget selection without a full sort.

The reference never globally sorts the ready queue — doledb is already laid
out in (255-priority, time) key order and the spider loop walks priority
bands with per-band cursors (Spider.cpp:6758, Spider.h:1208).  The Spark
equivalent of that band structure: aggregate a 128-bucket priority
histogram (tiny — collected to the driver), find the cutoff band P* where
the cumulative count crosses the budget, then

    rows with priority > P*   → all selected (no sort)
    rows with priority == P*  → sorted by (fetch_time, uh48), take remainder

Only the boundary band is ever sorted, so a 10^9-row candidate set with a
100k budget sorts ~one band instead of everything.  ``ORDER BY+LIMIT``
(TakeOrdered) is fine for small budgets; this is the scale path.

Cache discipline: these operators must persist intermediates (the candidate
plan is consumed by the histogram AND the band filters).  Callers pass a
``pins`` list; every DataFrame persisted here is appended to it and the
caller unpersists after the round's outputs are materialized — no cache
leaks across rounds (a long-running crawl driver runs thousands of rounds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _pin(df: DataFrame, pins: list | None) -> DataFrame:
    from pyspark import StorageLevel
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    if pins is not None:
        pins.append(out)
    return out


def distributed_topk(df: DataFrame, order_cols: tuple[str, ...], k: int,
                     partitions: int | None = None,
                     small_k: int = 100_000,
                     pins: list | None = None) -> DataFrame:
    """Exact top-k by (order_cols asc) without the driver-side merge.

    ``ORDER BY … LIMIT k`` (TakeOrderedAndProject) ships every partition's
    top-k to the driver and merges single-threaded — for k=400k over 64
    partitions that is ~25M rows / ~600 MB of serial work (measured ~16 s
    of Amdahl serial time in the scheduling bench).  Instead:
    range-partition on the sort key, count rows per range (a P-row
    collect), take every partition below the cutoff whole, and sort only
    the single straddling partition.  Exactness requires a total order —
    include a unique tiebreaker (uh48) in order_cols."""
    if k <= small_k:
        return df.orderBy(*[F.asc(c) for c in order_cols]).limit(k)
    if partitions is None:
        partitions = max(df.sparkSession.sparkContext
                         .defaultParallelism * 2, 16)
    rp = _pin(df.repartitionByRange(partitions,
                                    *[F.col(c) for c in order_cols])
              .withColumn("_pid", F.spark_partition_id()), pins)
    counts = dict((r["_pid"], r["count"]) for r in
                  rp.groupBy("_pid").count().collect())
    total = 0
    cut_pid = None
    remainder = k
    for pid in sorted(counts):
        if total + counts[pid] >= k:
            cut_pid = pid
            remainder = k - total
            break
        total += counts[pid]
    if cut_pid is None:
        return rp.drop("_pid")  # fewer rows than k
    below = rp.filter(F.col("_pid") < cut_pid).drop("_pid")
    boundary = (rp.filter(F.col("_pid") == cut_pid)
                .orderBy(*[F.asc(c) for c in order_cols])
                .limit(remainder).drop("_pid"))
    return below.unionByName(boundary)


def budget_select(cand: DataFrame, budget: int,
                  priority_col: str = "priority",
                  order_cols: tuple[str, ...] = ("fetch_time_ms", "uh48"),
                  pins: list | None = None) -> DataFrame:
    """Doledb-band budget: histogram the (≤128-value) priority column, take
    bands above the cutoff whole, top-k only the boundary band."""
    # the candidate plan is consumed 3x (histogram, above-cutoff,
    # boundary) — materialize once instead of recomputing the whole
    # upstream dedup/politeness/winner pipeline per consumer
    cand = _pin(cand, pins)
    hist = (cand.groupBy(priority_col).count()
            .orderBy(F.desc(priority_col)).collect())
    total = 0
    cutoff = None
    remainder = budget
    for row in hist:
        if total + row["count"] >= budget:
            cutoff = row[priority_col]
            remainder = budget - total
            break
        total += row["count"]
    if cutoff is None:
        return cand  # fewer candidates than budget: everything passes
    above = cand.filter(F.col(priority_col) > cutoff)
    boundary = distributed_topk(
        cand.filter(F.col(priority_col) == cutoff), order_cols, remainder,
        pins=pins)
    return above.unionByName(boundary)


def stamp_global_seq(df: DataFrame, order_exprs: list[Column],
                     seq_col: str = "seq",
                     partitions: int | None = None,
                     pins: list | None = None) -> DataFrame:
    """0-based global rank in ``order_exprs`` order WITHOUT a
    single-partition exchange (the doledb scan-order sequence number,
    Spider.h:997-1021).

    Range-partition on the order key so partition p holds a contiguous
    rank range, collect the P-row partition-size histogram, then
    seq = per-partition row_number + partition offset.  The only serial
    work is the P-row collect; every sort is per-partition."""
    if partitions is None:
        partitions = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    rp = _pin(df.repartitionByRange(partitions, *order_exprs)
              .withColumn("_pid", F.spark_partition_id()), pins)
    counts = dict((r["_pid"], r["count"]) for r in
                  rp.groupBy("_pid").count().collect())
    offsets = {}
    total = 0
    for pid in sorted(counts):
        offsets[pid] = total
        total += counts[pid]
    if offsets:
        off_map = F.create_map(
            *[F.lit(v) for pid_off in offsets.items() for v in pid_off])
        off = F.coalesce(off_map[F.col("_pid")], F.lit(0))
    else:
        off = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*order_exprs)
    return (rp.withColumn(seq_col,
                          (F.row_number().over(w) - 1 + off).cast("int"))
            .drop("_pid"))
