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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def budget_select(cand: DataFrame, budget: int,
                  priority_col: str = "priority",
                  order_cols: tuple[str, ...] = ("fetch_time_ms", "uh48"),
                  persist: bool = True) -> DataFrame:
    if persist:
        # the candidate plan is consumed 3x (histogram, above-cutoff,
        # boundary) — materialize once instead of recomputing the whole
        # upstream dedup/politeness/winner pipeline per consumer
        from pyspark import StorageLevel
        cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
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
    boundary = (cand.filter(F.col(priority_col) == cutoff)
                .orderBy(*[F.asc(c) for c in order_cols])
                .limit(remainder))
    return above.unionByName(boundary)
