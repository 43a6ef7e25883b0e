"""Bloom-routed URL-seen must not change the crawl (routing-only)."""

from open_source_search_engine_spark.oracle.crawler import CrawlConfig
from open_source_search_engine_spark.plans.scheduler import CrawlDriver
from open_source_search_engine_spark.sources import synthweb


def test_bloom_routing_is_parity_neutral(spark, tmp_path):
    d = str(tmp_path / "corpus")
    paths = synthweb.write_corpus(d, n_hosts=6, mean_pages=4, n_seeds=3)

    def run(use_bloom, wd):
        cfg = CrawlConfig(rounds=3, budget=40, use_bloom=use_bloom)
        drv = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"],
                          cfg)
        drv.seed(paths["seeds"])
        drv.run(3)
        return [(r.round, r.seq, r.url) for r in
                drv.schedule_df().orderBy("round", "seq").collect()]

    plain = run(False, str(tmp_path / "plain"))
    bloomed = run(True, str(tmp_path / "bloom"))
    assert plain == bloomed
    assert len(plain) > 0
