"""State-evolution gates (ADVICE r2): the per-host robots cache must be
invalidated when the hostmeta robots content or the user agent changes
(the cache-expiry analog of the reference's 24h per-host robots cache,
Msg13.cpp:590-591), and request snapshots written by an older driver
version (missing later REQUEST_SCHEMA columns) must resume cleanly with
semantic defaults instead of feeding nulls into rule predicates."""

import pandas as pd

from open_source_search_engine_spark.oracle.crawler import CrawlConfig
from open_source_search_engine_spark.plans.scheduler import CrawlDriver
from open_source_search_engine_spark.sources import synthweb


def test_robots_cache_refresh(spark, tmp_path):
    """Mutating a host's robots.txt in hostmeta and re-initializing the
    driver on the same workdir rebuilds the parsed-rules cache: the host
    stops being scheduled from the next round on."""
    d = str(tmp_path / "corpus")
    paths = synthweb.write_corpus(d, n_hosts=6, mean_pages=4, n_seeds=4)
    cfg = CrawlConfig(rounds=4, budget=40)
    wd = str(tmp_path / "state")
    drv = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"], cfg)
    drv.seed(paths["seeds"])
    drv.run(2)

    target = "host001.com"  # robots template 1 (empty -> fully allowed)
    hm = pd.read_parquet(paths["hostmeta"])
    hm.loc[hm.host == target, "robots_txt"] = \
        "User-agent: *\nDisallow: /\n"
    hm.loc[hm.host == target, "robots_status"] = 200
    hm2 = str(tmp_path / "hostmeta2.parquet")
    hm.to_parquet(hm2, index=False)

    drv2 = CrawlDriver(spark, wd, paths["pages"], hm2, cfg)
    drv2.run(2)
    sched = drv2.schedule_df()
    earlier = [r.url for r in sched.filter("round < 2").collect()]
    later = [r.url for r in sched.filter("round >= 2").collect()]
    assert any(target in u for u in earlier), \
        "precondition: target host was being crawled before the change"
    assert later
    assert not any(target in u for u in later), \
        "stale robots rules survived the hostmeta change"


def test_user_agent_change_rebuilds_cache(spark, tmp_path):
    """A different cfg.user_agent re-parses robots (per-agent sections
    differ) — asserted via the cache fingerprint, not a full crawl."""
    d = str(tmp_path / "corpus")
    paths = synthweb.write_corpus(d, n_hosts=5, mean_pages=3, n_seeds=2)
    wd = str(tmp_path / "state")
    drv = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"],
                      CrawlConfig())
    snap1 = drv.t_robots.current_snapshot()
    # same config -> no rebuild
    drv_same = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"],
                           CrawlConfig())
    assert drv_same.t_robots.current_snapshot() == snap1
    drv_ua = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"],
                         CrawlConfig(user_agent="other-bot"))
    assert drv_ua.t_robots.current_snapshot() == snap1 + 1


def test_legacy_request_snapshot_resume(spark, tmp_path):
    """Requests written without the round-2 columns (domain + flag bits)
    resume with defaults — no nulls, no AnalysisException."""
    d = str(tmp_path / "corpus")
    paths = synthweb.write_corpus(d, n_hosts=6, mean_pages=4, n_seeds=3)
    cfg = CrawlConfig(rounds=2, budget=40)
    wd = str(tmp_path / "state")
    drv = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"], cfg)
    drv.seed(paths["seeds"])
    drv.run(1)

    legacy = drv.t_requests.read(spark).drop(
        "domain", "is_rss", "is_new_outlink", "was_parent_indexed",
        "is_docid_based", "has_authority_inlink")
    drv.t_requests.overwrite(legacy, {"legacy_schema": True})

    drv2 = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"], cfg)
    m = drv2.run_round(drv2.current_round())
    assert m["scheduled"] > 0
    req = drv2._read_state()[0]
    assert "domain" in req.columns
    assert req.filter("domain is null or is_rss is null").count() == 0


def test_mixed_version_inlinks_not_dropped(spark, tmp_path):
    """ADVICE r5 #1/#3: an inlinks append log mixing a legacy dir
    (no first_ip/_salt) with salted dirs must not drop the legacy edges
    from page_num_inlinks (the triple-key branch would never match their
    NULL first_ip), and compaction must heal first_ip from the requests
    table so the compacted snapshot is deterministically salted."""
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.plans import compaction

    d = str(tmp_path / "corpus")
    paths = synthweb.write_corpus(d, n_hosts=6, mean_pages=4, n_seeds=4)
    cfg = CrawlConfig(rounds=3, budget=40)
    wd = str(tmp_path / "state")
    drv = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"], cfg)
    drv.seed(paths["seeds"])
    drv.run(2)

    inl = drv.t_inlinks.read(spark)
    assert inl is not None and inl.count() > 0
    # split the edge log into a LEGACY dir (columns stripped) + a salted
    # dir, like a workdir upgraded mid-crawl
    marker = F.pmod(F.col("uh48"), F.lit(2)) == 0
    legacy = inl.filter(marker).select("uh48", "parent_cblock")
    fresh = inl.filter(~marker)
    assert legacy.count() > 0 and fresh.count() > 0
    drv.t_inlinks.overwrite(legacy, {"legacy_schema": True})
    drv.t_inlinks.append(fresh, {"salted": True})

    mixed = drv.t_inlinks.read(spark)
    assert not drv._inlinks_salted(mixed)  # falls back to uh48 keys

    def counts_of(driver):
        # the counts exactly as _candidates consumes them (shared
        # helper — the candidate output itself no longer carries
        # page_num_inlinks past the rule stage)
        counts, ikeys = driver._inlink_counts(
            ["first_ip", "_salt", "uh48"])
        return {r.uh48: r._n_inlinks
                for r in counts.select("uh48", "_n_inlinks").collect()}

    want = {r.uh48: r.n for r in
            (mixed.groupBy("uh48")
             .agg(F.least(F.countDistinct("parent_cblock"),
                          F.lit(20)).alias("n")).collect())}
    got = counts_of(drv)
    assert got, "no candidates in toy crawl"
    for uh, n in got.items():
        assert n == want.get(uh, 0), \
            f"uh48={uh}: got {n} inlinks, want {want.get(uh, 0)}"

    # compaction heals: no NULL first_ip, fully salted, same counts
    compaction.compact_frontier(spark, wd)
    healed = drv.t_inlinks.read(spark)
    assert healed.filter("first_ip is null or _salt is null").count() == 0
    assert drv._inlinks_salted(healed)
    got2 = counts_of(drv)
    assert got2 == got
