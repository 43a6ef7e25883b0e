"""Respider dynamics + custom rule profiles: a profile with sub-round
respider frequency makes urls get fetched repeatedly; a matchesucp regex
row steers priorities. Spark must track the oracle exactly through the
refetch cycles."""

import pandas as pd
import pytest

from open_source_search_engine_spark.kernel.urlfilter import Rule
from open_source_search_engine_spark.oracle.crawler import (
    CrawlConfig, OracleCrawler,
)
from open_source_search_engine_spark.plans.scheduler import CrawlDriver
from open_source_search_engine_spark.sources import synthweb

# respider freq ≈ 0.0058 days ≈ 500 s < round_ms (600 s) → every page is
# due again next round; matchesucp promotes /p0.html pages
FAST_PROFILE = (
    Rule("ismedia", 100, 0, 99, 1, 1000, True, True),
    Rule("matchesucp==/p0\\.html$", 60, 0.0058, 9, 7, 1000),
    Rule("hopcount==0 && isnew", 50, 0.0058, 9, 7, 1000),
    Rule("hopcount==0", 48, 0.0058, 9, 7, 1000),
    Rule("isnew", 40, 0.0058, 9, 7, 1000),
    Rule("default", 10, 0.0058, 9, 7, 1000),
)

CFG = CrawlConfig(rounds=6, budget=30, round_ms=600_000,
                  rules=FAST_PROFILE)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("respider"))
    return synthweb.write_corpus(d, n_hosts=4, mean_pages=3, n_seeds=2)


def test_respider_parity(corpus, spark, tmp_path_factory):
    paths = corpus
    oc = OracleCrawler(pd.read_parquet(paths["pages"]),
                       pd.read_parquet(paths["hostmeta"]),
                       pd.read_parquet(paths["seeds"]), CFG)
    st = oc.run(6)
    # urls must actually be refetched (respider path exercised)
    from collections import Counter
    fetch_counts = Counter(s["uh48"] for s in st.schedule)
    assert max(fetch_counts.values()) >= 2, "no respider happened"
    # matchesucp promotion visible
    assert any(s["priority"] == 60 for s in st.schedule)

    wd = str(tmp_path_factory.mktemp("state"))
    drv = CrawlDriver(spark, wd, paths["pages"], paths["hostmeta"], CFG)
    drv.seed(paths["seeds"])
    drv.run(6)
    got = [(r.round, r.seq, r.url, r.priority, r.fetch_time_ms)
           for r in drv.schedule_df().orderBy("round", "seq").collect()]
    want = [(s["round"], s["seq"], s["url"], s["priority"],
             s["fetch_time_ms"]) for s in st.schedule]
    assert got == want
