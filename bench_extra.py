#!/usr/bin/env python
"""Extra benchmarks — stage-isolated timings per the optimization guide
§1.4 (noop sink; bench.py stays frozen for the driver's measurement).

Usage:
    python bench_extra.py product [rows]  # candidate/budget stage times
    python bench_extra.py headline        # per-query noop-sink timings

`product` reuses the corpus bench.run_product_round generates, seeds a
workdir the same way (untimed), then times with a cleared cache:
  - candidates_noop : CrawlDriver._candidates → noop sink
  - round           : full run_round (same number bench.py reports)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> float:
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t, 3)


def product(rows: int) -> dict:
    import shutil
    import tempfile

    import bench
    from open_source_search_engine_spark.oracle.crawler import CrawlConfig
    from open_source_search_engine_spark.plans.scheduler import CrawlDriver
    from open_source_search_engine_spark.sources.snapstore import with_salt

    spark = bench.make_spark(CPUS)
    base = os.environ.get(
        "OSSE_PRODUCT_DATADIR",
        os.path.join(tempfile.gettempdir(), "osse_bench_product"))
    # corpus written by bench.run_product_round (run it once first)
    corpus = os.path.join(base, f"corpus_{rows}")
    if not os.path.exists(os.path.join(corpus, "_done")):
        bench.run_product_round(spark, rows)  # generates + one round
    wd = os.path.join(base, f"wd_extra_{rows}_{CPUS}")
    shutil.rmtree(wd, ignore_errors=True)
    cfg = CrawlConfig(rounds=1, budget=500_000)
    drv = CrawlDriver(spark, wd, os.path.join(corpus, "pages.parquet"),
                      os.path.join(corpus, "hostmeta.parquet"), cfg)
    drv.t_requests.overwrite(
        with_salt(spark.read.parquet(
            os.path.join(corpus, "requests.parquet"))),
        {"source": "bench_extra"})
    drv.t_replies.overwrite(
        with_salt(spark.read.parquet(
            os.path.join(corpus, "replies.parquet"))),
        {"source": "bench_extra"})

    out = {"rows": rows, "cpus": CPUS}
    sc = spark.sparkContext
    for name in ("candidates_noop", "candidates_noop2"):
        spark.catalog.clearCache()
        requests, replies, ip_state = drv._read_state()
        cand = drv._candidates(requests, replies, ip_state, cfg.t0_ms)
        sc.setJobDescription(f"bench_extra: {name}")
        out[name] = noop(cand)
    for name in ("round", "round2"):
        spark.catalog.clearCache()
        # fresh path per iteration: a rewritten dir under the SAME path
        # would serve a stale cached file index via its catalog entry
        wd = os.path.join(base, f"wd_extra_{rows}_{CPUS}_{name}")
        shutil.rmtree(wd, ignore_errors=True)
        drv2 = CrawlDriver(spark, wd,
                           os.path.join(corpus, "pages.parquet"),
                           os.path.join(corpus, "hostmeta.parquet"), cfg)
        drv2.t_requests.overwrite(
            with_salt(spark.read.parquet(
                os.path.join(corpus, "requests.parquet"))),
            {"source": "bench_extra"})
        drv2.t_replies.overwrite(
            with_salt(spark.read.parquet(
                os.path.join(corpus, "replies.parquet"))),
            {"source": "bench_extra"})
        spark.catalog.clearCache()
        sc.setJobDescription(f"bench_extra: {name}")
        t = time.time()
        drv2.run_round(0)
        out[name] = round(time.time() - t, 3)
    shutil.rmtree(wd, ignore_errors=True)
    spark.stop()
    return out


def headline() -> dict:
    import bench
    import __spark_entry__ as entrymod
    spark = bench.make_spark(CPUS)
    qs = entrymod.queries()
    out = {"sf_dir": SF_DIR, "cpus": CPUS}
    for name in bench.HEADLINE:
        # two passes: first includes codegen/scan warmup, second is warm
        for k in (name, name + "2"):
            spark.sparkContext.setJobDescription(f"bench_extra: {k}")
            out[k] = noop(qs[name](spark, SF_DIR))
    spark.stop()
    return out


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "product"
    if mode == "product":
        rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
        print(json.dumps(product(rows)))
    else:
        print(json.dumps(headline()))
