"""Plan-shape + job-count gates over the PRODUCT scheduler (CrawlDriver),
not just the bench plan: the round's scheduled set must be produced without
a single-partition exchange or coalesce(1), robots parsing must run per
host (init-time cache) instead of per candidate, and a round must fire a
bounded number of driver jobs (VERDICT r1 items 1, 2, 9)."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.oracle.crawler import CrawlConfig
from open_source_search_engine_spark.plans.scheduler import (
    CrawlDriver, path_cgi_col,
)
from open_source_search_engine_spark.sources import synthweb

CFG = CrawlConfig(rounds=2, budget=50, round_ms=600_000)


@pytest.fixture(scope="module")
def driver(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synthweb_plan"))
    paths = synthweb.write_corpus(d, n_hosts=6, mean_pages=4, n_seeds=3)
    wd = str(tmp_path_factory.mktemp("crawlstate_plan"))
    drv = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"], CFG)
    drv.seed(paths["seeds"])
    return drv


def _round_plans(drv):
    """Lazy plans of the round's two hot DataFrames: the candidate
    pipeline and the budget+seq scheduled set."""
    from open_source_search_engine_spark.operators import budget as b
    requests, replies, ip_state = drv._read_state()
    cand = drv._candidates(requests, replies, ip_state, CFG.t0_ms)
    pins = []
    sel = cand.select("uh48", "first_ip", "hop_count",
                      "priority", "harvest_links", "fetch_time_ms",
                      F.coalesce("err_count", F.lit(0)).alias("prev_errs"))
    sel = b.budget_select(sel, CFG.budget, pins=pins)
    scheduled = b.stamp_global_seq(
        sel, [F.desc("priority"), F.asc("fetch_time_ms"), F.asc("uh48")],
        pins=pins)
    cand_plan = cand._jdf.queryExecution().executedPlan().toString()
    sched_plan = scheduled._jdf.queryExecution().executedPlan().toString()
    for p in pins:
        p.unpersist()
    return cand_plan, sched_plan


def test_no_single_partition_exchange_in_scheduled(driver):
    """The doledb-order seq stamp must not serialize the round through one
    task (the r1 coalesce(1) + global Window anti-pattern)."""
    _, sched_plan = _round_plans(driver)
    assert "Coalesce 1" not in sched_plan
    assert "Exchange SinglePartition" not in sched_plan


def test_robots_parse_not_in_round_path(driver):
    """The robots PARSE UDF (robots_rules_udf) ran once at init into the
    robots_rules snapshot table, sized |hosts|; since round 5 the
    per-round candidate plan contains NO Python at all — the per-url
    prefix match is the pure-Column robots_allowed_col (a Python eval
    node would drop the bucketed scan's partitioning and force the
    winner window to re-shuffle the frontier)."""
    cand_plan, _ = _round_plans(driver)
    assert "robots_rules_udf" not in cand_plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in cand_plan, \
            f"Python operator in candidate plan: {marker}"
    # the robots cache table exists and holds one row per host
    n_hosts = driver.hostmeta.count()
    n_rules = driver.host_rules.count()
    assert n_rules == n_hosts


def test_host_broadcasts_size_gated(driver, spark, tmp_path_factory):
    """Host-keyed joins broadcast at toy scale but are NOT forced hints:
    with broadcast_host_threshold=0 the same round compiles to shuffle
    joins (no driver OOM at 10^7+ hosts) and produces the IDENTICAL
    schedule (VERDICT r2 item 4)."""
    cand_plan, _ = _round_plans(driver)
    assert "BroadcastHashJoin" in cand_plan  # toy scale: broadcast wins
    # ... and the hint really is attached below the threshold
    requests, replies, ip_state = driver._read_state()
    cand = driver._candidates(requests, replies, ip_state, CFG.t0_ms)
    assert "ResolvedHint" in \
        cand._jdf.queryExecution().analyzed().toString()

    d = str(tmp_path_factory.mktemp("synthweb_nobc"))
    paths = synthweb.write_corpus(d, n_hosts=6, mean_pages=4, n_seeds=3)
    cfg_nobc = CrawlConfig(rounds=2, budget=50, round_ms=600_000,
                           broadcast_host_threshold=0)
    wd = str(tmp_path_factory.mktemp("crawlstate_nobc"))
    drv = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"],
                      cfg_nobc)
    drv.seed(paths["seeds"])
    requests, replies, ip_state = drv._read_state()
    cand = drv._candidates(requests, replies, ip_state, cfg_nobc.t0_ms)
    # above the threshold no forced broadcast hint exists anywhere in the
    # plan — Spark/AQE alone decide the join strategy by measured size
    # (they may and do still broadcast these tiny toy tables; the OOM
    # hazard was the unconditional HINT, not the optimizer's choice)
    assert "ResolvedHint" not in \
        cand._jdf.queryExecution().analyzed().toString()

    drv.run(2)
    wd2 = str(tmp_path_factory.mktemp("crawlstate_bc"))
    drv_bc = CrawlDriver(spark, wd2, paths["pages"], paths["hostmeta"],
                         CrawlConfig(rounds=2, budget=50,
                                     round_ms=600_000))
    drv_bc.seed(paths["seeds"])
    drv_bc.run(2)
    got = [(r.round, r.seq, r.url) for r in
           drv.schedule_df().orderBy("round", "seq").collect()]
    want = [(r.round, r.seq, r.url) for r in
            drv_bc.schedule_df().orderBy("round", "seq").collect()]
    assert got == want and len(got) > 0


def test_round_job_count_bounded(driver):
    """One round = 3 driver ACTIONS (budget histogram, seq offsets, merged
    stats) + 5 snapshot writes (metrics is a driver-side pyarrow write,
    no job).  AQE materializes every shuffle stage as its own Spark job,
    so the listener sees ~40 — guard against action creep with a measured
    bound (r1 ran 5 recomputing actions + 6 write jobs)."""
    sc = driver.spark.sparkContext
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup("crawl-round-0") or [])
    driver.run_round(0)
    after = set(tracker.getJobIdsForGroup("crawl-round-0") or [])
    n_jobs = len(after - before)
    # r6 default config additionally runs: the parents emptiness probe,
    # the persistent-cuckoo build + mutation-count + sync-insert jobs
    # (seen_filter now defaults to "cuckoo") and the url_seen delta
    # append — measured ~68 with AQE stage-jobs; guard at 85.
    assert 0 < n_jobs <= 85, f"round fired {n_jobs} jobs"


def test_path_cgi_col_matches_kernel(spark, driver):
    """The columnar robots match subject must equal the Python kernel's
    get_path_cgi byte-for-byte over every corpus url."""
    from open_source_search_engine_spark.kernel import urlnorm
    urls = [r.url for r in driver.pages.select("url").collect()]
    urls += ["http://a.com/", "https://b.com/x?y=1&z=2",
             "http://c.com/a/b/c.html"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = df.select("url", path_cgi_col(F.col("url")).alias("p")).collect()
    for r in got:
        assert r.p == urlnorm.get_path_cgi(r.url), r.url


def test_exact_confirm_uses_url_seen_table(driver, spark):
    """VERDICT r5 Wrong #2 closure: with the url_seen mirror synced, the
    round's exact-confirm path anti-joins the incremental seen table —
    NO scan of the requests table, no frontier-wide distinct, and no
    exchange of the bucketed seen base (only the small candidate side
    may shuffle)."""
    driver.run_round(driver.current_round())  # ensure >=1 round + deltas
    assert driver._url_seen_synced()
    requests, _, _ = driver._read_state()
    parts = driver._seen_parts(requests)
    left = spark.range(0, 50).select(F.col("id").alias("uh48"))
    for p in parts:
        left = left.join(p, "uh48", "left_anti")
    # disable broadcast to see the frontier-scale join shape (at 10^10
    # seen keys the seen side cannot broadcast): the anti-join must then
    # reuse the base scan's bucket partitioning
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        s = left._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "/url_seen/" in s, "seen side must read the url_seen table"
    assert "/requests/" not in s, \
        "exact-confirm must not scan the requests table:\n" + s[:2000]
    # the base dir scans bucketed; the only allowed hash exchanges are
    # of the candidate (left) side — one per anti-join step
    assert "Bucketed: true" in s
    assert s.count("Exchange hashpartitioning") <= len(parts), s[:3000]
    assert "HashAggregate" not in s and "SortAggregate" not in s, \
        "no distinct on the seen side:\n" + s[:2000]
