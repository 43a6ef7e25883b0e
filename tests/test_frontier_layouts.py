"""Frontier storage layouts and plan variants are bit-exact.

BENCH.md's round-4 plan evolution rests on three equivalence claims,
each pinned here on a small frontier:

1. the SALTED layout (bucket by (first_ip, _salt=uh48%16)) schedules the
   identical (url, uh48, first_ip, priority, fetch_time_ms) set as the
   flat layout — the two-phase salted winner top-K is exact;
2. the STREAMING struct-form aggregations produce the same rows as the
   primitive hash-form;
3. the packed winner ordering (one long) reproduces the 4-column
   lexicographic order, including the politeness cumsum it drives.

The bench harness asserts the same via a bit_xor checksum at 64M rows;
this test keeps the equivalences pinned at pytest scale.
"""

import os

import pytest
from pyspark.sql import functions as F

import bench
from open_source_search_engine_spark.sources.frontier_gen import (
    gen_frontier, gen_replies_for,
)

ROWS = 60_000


def _schedule(spark, requests, replies, agg_form):
    old = os.environ.get("OSSE_BENCH_AGG")
    os.environ["OSSE_BENCH_AGG"] = agg_form
    try:
        pins = []
        df = bench.frontier_sched_plan(spark, requests, replies,
                                       pins=pins)
        rows = sorted(
            (r.url, r.uh48, r.first_ip, r.priority, r.fetch_time_ms)
            for r in df.collect())
        for p in pins:
            p.unpersist()
        return rows
    finally:
        if old is None:
            os.environ.pop("OSSE_BENCH_AGG", None)
        else:
            os.environ["OSSE_BENCH_AGG"] = old


@pytest.fixture(scope="module")
def frontier(spark):
    req = gen_frontier(spark, ROWS).cache()
    rep = gen_replies_for(req).cache()
    yield req, rep
    req.unpersist()
    rep.unpersist()


def test_salted_layout_is_bit_exact(spark, frontier):
    req, rep = frontier
    flat = _schedule(spark, req, rep, "primitive")
    salt = F.pmod(F.col("uh48"), F.lit(16)).cast("int").alias("_salt")
    salted = _schedule(spark, req.select("*", salt),
                       rep.select("*", salt), "primitive")
    assert len(flat) > 0
    assert flat == salted


def test_streaming_struct_aggs_are_bit_exact(spark, frontier):
    req, rep = frontier
    prim = _schedule(spark, req, rep, "primitive")
    struct = _schedule(spark, req, rep, "struct")
    assert len(prim) > 0
    assert prim == struct


def test_packed_ordering_matches_lexicographic(spark, frontier):
    """The packed long must order exactly like (priority DESC, hop ASC,
    spider_time ASC): checked directly on the expression over the value
    ranges the scheduler feeds it."""
    rows = spark.range(2000).select(
        F.pmod(F.xxhash64("id"), F.lit(128)).cast("int").alias("priority"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(256)).cast("int")
        .alias("hop"),
        (F.lit(1_600_000_000_000) +
         F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000_000)))
        .alias("t"))
    packed = rows.select(
        "priority", "hop", "t",
        (F.shiftleft((F.lit(255) - F.col("priority")).cast("long"), 52) +
         F.shiftleft(F.col("hop").cast("long"), 44) +
         F.col("t")).alias("ord")).collect()
    lex = sorted(packed, key=lambda r: (-r.priority, r.hop, r.t))
    by_ord = sorted(packed, key=lambda r: r.ord)
    assert [(r.priority, r.hop, r.t) for r in lex] == \
           [(r.priority, r.hop, r.t) for r in by_ord]
