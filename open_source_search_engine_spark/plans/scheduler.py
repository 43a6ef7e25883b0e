"""The Spark crawl-round pipeline — Gigablast's spider loop as one job DAG.

One scheduling round (SURVEY §3.1 restatement) =

    frontier_requests ──window dedup──┐
    frontier_replies ──latest-reply──┤
                                      ├─ join(uh48) ─ rule-compile (F.when
    hostmeta (broadcast) ─ robots UDF ┘   chain) ─ politeness expr ─ due
      → window top-K per first_ip (winner ranking, Spider.cpp:4864-4902)
      → per-IP spacing (cumsum window = hammer-queue analog, Msg13.cpp:3070)
      → global ORDER BY priority DESC, fetch_time LIMIT budget (doledb scan,
        Spider.cpp:6758)
      → fetch = left join against pages (Msg13 simulated)
      → extract links/text (Arrow UDFs) → posexplode → new requests
        (bloom + exact anti-join vs url_seen)
      → append replies/requests, update ip_state, commit snapshot + metrics

Scale design (10^10-URL frontier, 1000 executors):
- frontier tables partitioned/shuffled on uh48 for the dedup/join windows,
  then re-shuffled once on first_ip for the politeness/winner stage — the
  same two partitionings the reference bakes into spiderdb's key layout
  (<firstIp><uh48>, Spider.h:370).
- hostmeta is a broadcast join (≤ tens of millions of hosts → still fine to
  hash-join; Spark picks by size).
- the hot-IP skew the reference suffers (one host per IP, Spider.cpp:6171)
  is bounded here: the per-IP window ranks at most the requests of one IP
  partition, and AQE skew-split handles oversized partitions for the scan/
  filter stages; the window itself is capped by winner_k via rank filter.
- only the scheduled rows (≤ budget per round) hit the Python extraction
  UDFs; the filter/politeness path is whole-stage-codegen Column math.
- every state table is snapshot-committed (Iceberg in production; see
  sources/snapstore.py) → resumable mid-crawl, per-round lineage+metrics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import filters as Fc
from ..operators import windows as windows_ops
from ..functions import udfs
from ..oracle.crawler import CrawlConfig
from ..sources.snapstore import SnapshotTable

REQUEST_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("uh48", T.LongType()),
    T.StructField("first_ip", T.LongType()),
    T.StructField("host", T.StringType()),
    T.StructField("hop_count", T.IntegerType()),
    T.StructField("added_time_ms", T.LongType()),
    T.StructField("discovery_time_ms", T.LongType()),
    T.StructField("is_addurl", T.BooleanType()),
    T.StructField("is_injected", T.BooleanType()),
    T.StructField("is_reindex", T.BooleanType()),
    T.StructField("same_dom", T.BooleanType()),
    T.StructField("same_host", T.BooleanType()),
    T.StructField("parent_is_rss", T.BooleanType()),
    T.StructField("parent_is_sitemap", T.BooleanType()),
    T.StructField("page_num_inlinks", T.IntegerType()),
])

REPLY_SCHEMA = T.StructType([
    T.StructField("uh48", T.LongType()),
    T.StructField("first_ip", T.LongType()),
    T.StructField("spidered_time_ms", T.LongType()),
    T.StructField("err_code", T.IntegerType()),
    T.StructField("err_count", T.IntegerType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("is_indexed", T.BooleanType()),
    T.StructField("lang", T.StringType()),
])


class CrawlDriver:
    """Owns the state tables under ``workdir`` and runs rounds."""

    def __init__(self, spark: SparkSession, workdir: str,
                 pages_path: str, hostmeta_path: str,
                 cfg: CrawlConfig | None = None):
        self.spark = spark
        self.cfg = cfg or CrawlConfig()
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.t_requests = SnapshotTable(os.path.join(workdir, "requests"))
        self.t_replies = SnapshotTable(os.path.join(workdir, "replies"))
        self.t_ip_state = SnapshotTable(os.path.join(workdir, "ip_state"))
        self.t_schedule = SnapshotTable(os.path.join(workdir, "schedule"))
        self.t_inlinks = SnapshotTable(os.path.join(workdir, "inlinks"))
        self.t_metrics = SnapshotTable(os.path.join(workdir, "metrics"))
        self.pages = spark.read.parquet(pages_path)
        self.hostmeta = spark.read.parquet(hostmeta_path)
        self._robots_udf = udfs.make_robots_udf(self.cfg.user_agent)

    # ------------------------------------------------------------------
    def seed(self, seeds_path: str) -> int:
        """Inject seeds (A1: SpiderRequest::setFromAddUrl analog)."""
        if self.t_requests.exists():
            return 0
        seeds = self.spark.read.parquet(seeds_path)
        reqs = (
            seeds
            .withColumn("url", udfs.canonicalize_udf(F.col("url")))
            .filter(F.length("url") > 0)
            .withColumn("uh48", udfs.uh48_udf(F.col("url")))
            .withColumn("host", udfs.host_udf(F.col("url")))
            .join(F.broadcast(self.hostmeta.select("host", "first_ip")),
                  "host", "inner")  # unknown host = DNS failure → dropped
            .select(
                "url", "uh48",
                F.col("first_ip").cast("long").alias("first_ip"),
                "host",
                F.lit(0).alias("hop_count"),
                F.col("added_time_ms").cast("long"),
                F.col("added_time_ms").cast("long")
                 .alias("discovery_time_ms"),
                F.lit(True).alias("is_addurl"),
                F.lit(False).alias("is_injected"),
                F.lit(False).alias("is_reindex"),
                F.lit(False).alias("same_dom"),
                F.lit(False).alias("same_host"),
                F.lit(False).alias("parent_is_rss"),
                F.lit(False).alias("parent_is_sitemap"),
                F.lit(0).alias("page_num_inlinks"),
            )
            .dropDuplicates(["uh48"])
        )
        n = reqs.count()
        self.t_requests.append(reqs, {"round": -1, "rows": n,
                                      "source": "seed"})
        return n

    # ------------------------------------------------------------------
    def _read_state(self):
        requests = self.t_requests.read(self.spark)
        replies = self.t_replies.read(self.spark)
        ip_state = self.t_ip_state.read(self.spark)
        if replies is None:
            replies = self.spark.createDataFrame([], REPLY_SCHEMA)
        if ip_state is None:
            ip_state = self.spark.createDataFrame(
                [], "first_ip long, last_download_ms long")
        return requests, replies, ip_state

    def current_round(self) -> int:
        m = self.t_metrics.read(self.spark)
        if m is None:
            return 0
        row = m.agg(F.max("round").alias("r")).collect()[0]
        return (row.r or -1) + 1

    # ------------------------------------------------------------------
    def run_round(self, rnd: int) -> dict:
        cfg = self.cfg
        now_ms = cfg.t0_ms + rnd * cfg.round_ms
        requests, replies, ip_state = self._read_state()

        # ---- 1. latest reply per uh48 (G1 sort-merge analog) ----------
        # groupBy + max_by: map-side partial combine, no window sort
        latest_reply = (
            windows_ops.argmax_per_key(replies, "uh48",
                                       ["spidered_time_ms"], desc=True)
            .select("uh48",
                    F.col("spidered_time_ms").alias("last_spidered_ms"),
                    "err_code", "err_count", "http_status", "is_indexed",
                    F.col("lang").alias("reply_lang"))
        )

        # ---- 2. request dedup per uh48 (C2 merge-dedup analog) --------
        # min (hop_count, added_time_ms) winner + OR-merged is_addurl,
        # again as one hash aggregation
        req_others = [c for c in requests.columns
                      if c not in ("uh48", "is_addurl")]
        req = (
            requests.groupBy("uh48").agg(
                F.min_by(F.struct(*[F.col(c) for c in req_others]),
                         F.struct("hop_count", "added_time_ms"))
                .alias("_r"),
                F.max("is_addurl").alias("is_addurl"))
            .select("uh48", "is_addurl",
                    *[F.col(f"_r.{c}").alias(c) for c in req_others])
        )

        # ---- F3: per-url inlink count = distinct parent C-blocks, cap 20
        # (Spider.cpp:4290-4332); counts as of round start
        inlinks = self.t_inlinks.read(self.spark)
        if inlinks is None:
            inlinks = self.spark.createDataFrame(
                [], "uh48 long, parent_cblock long")
        inlink_counts = (inlinks.groupBy("uh48")
                         .agg(F.least(F.countDistinct("parent_cblock"),
                                      F.lit(20)).cast("int")
                              .alias("_n_inlinks")))

        # ---- 3. rule table (compiled F.when chain) --------------------
        cand = (
            req
            # B1 corruption filter: reject far-future added times
            # (Spider.cpp:4495-4512)
            .filter(F.col("added_time_ms") <=
                    F.lit(now_ms + 86_400_000))
            .drop("page_num_inlinks")
            .join(inlink_counts, "uh48", "left")
            .withColumn("page_num_inlinks",
                        F.coalesce("_n_inlinks", F.lit(0)))
            .drop("_n_inlinks")
            .join(latest_reply, "uh48", "left")
            .withColumn("has_reply", F.col("last_spidered_ms").isNotNull())
            .withColumn("tld", udfs.tld_udf(F.col("host")))
            .withColumn("lang", F.coalesce("reply_lang", F.lit("")))
            .withColumn("last_spider_time",
                        F.coalesce(F.col("last_spidered_ms") / 1000,
                                   F.lit(0)))
        )
        cand = Fc.with_rule_outputs(cand, self.spark, cfg.rules)
        cand = cand.filter(~F.col("force_delete") &
                           (F.col("max_spiders") > 0))

        # ---- 4. robots + crawl delay (broadcast hostmeta) -------------
        cand = (
            cand.join(F.broadcast(self.hostmeta.select(
                "host", "robots_txt", "robots_status")), "host", "left")
            .withColumn("_rob", self._robots_udf(
                F.col("robots_txt"),
                F.coalesce(F.col("robots_status"), F.lit(404)),
                F.col("url")))
            .filter(F.col("_rob.allowed"))
            .withColumn("crawl_delay_ms",
                        F.col("_rob.crawl_delay_ms").cast("long"))
            .drop("robots_txt", "robots_status", "_rob")
        )

        # ---- 5. politeness / spider time (getSpiderTimeMS) ------------
        cand = (
            cand.join(ip_state, "first_ip", "left")
            .withColumn("last_dl",
                        F.coalesce("last_download_ms", F.lit(0)))
            .withColumn(
                "spider_time_ms",
                F.when(
                    ~F.col("has_reply") &
                    (F.col("is_injected") | F.col("is_reindex")),
                    F.col("added_time_ms"),
                ).otherwise(
                    F.greatest(
                        F.col("added_time_ms"),
                        F.col("last_dl") +
                        F.col("ip_wait_ms").cast("long"),
                        F.col("last_dl") + F.col("crawl_delay_ms"),
                        F.when(
                            F.col("has_reply") &
                            (F.col("last_spidered_ms") > 0),
                            (F.col("last_spidered_ms") +
                             (F.col("spider_freq_days") *
                              86400.0 * 1000.0).cast("long")),
                        ).otherwise(F.lit(0)),
                    )
                ),
            )
            .filter(F.col("spider_time_ms") <= F.lit(now_ms))
        )

        # ---- 6. winners per IP (D2 window) + 7. spacing (D7) ----------
        w_ip = Window.partitionBy("first_ip").orderBy(
            F.desc(F.col("priority")), F.asc("hop_count"),
            F.asc("spider_time_ms"), F.asc("uh48"))
        w_ip_cum = w_ip.rowsBetween(Window.unboundedPreceding, -1)
        cand = (
            cand
            .withColumn("_rank", F.row_number().over(w_ip))
            .filter(F.col("_rank") <= cfg.winner_k)
            .withColumn("eff_delay",
                        F.greatest(F.col("ip_wait_ms").cast("long"),
                                   F.col("crawl_delay_ms")))
            .withColumn("fetch_time_ms",
                        F.lit(now_ms) +
                        F.coalesce(F.sum("eff_delay").over(w_ip_cum),
                                   F.lit(0)))
            .filter(F.col("fetch_time_ms") < F.lit(now_ms + cfg.round_ms))
        )

        # ---- 8. global priority order + budget (doledb scan) ----------
        scheduled = (
            cand.orderBy(F.desc(F.col("priority")),
                         F.asc("fetch_time_ms"), F.asc("uh48"))
            .limit(cfg.budget)
            .select("url", "uh48", "first_ip", "host", "hop_count",
                    "priority", "harvest_links",
                    "fetch_time_ms",
                    F.coalesce("err_count", F.lit(0)).alias("prev_errs"))
            .coalesce(1)
            .withColumn(
                "seq",
                F.row_number().over(
                    Window.orderBy(F.desc("priority"),
                                   F.asc("fetch_time_ms"),
                                   F.asc("uh48"))) - 1)
        ).cache()
        n_sched = scheduled.count()

        # ---- 9. fetch simulation (A4: join vs pages) -------------------
        fetched = (
            scheduled.join(self.pages.select("url", "html", "lang"),
                           "url", "left")
        ).cache()

        new_replies = fetched.select(
            "uh48", "first_ip",
            F.col("fetch_time_ms").alias("spidered_time_ms"),
            F.when(F.col("html").isNotNull(), F.lit(0))
             .otherwise(F.lit(10)).alias("err_code"),  # ERR_NOT_FOUND
            F.when(F.col("html").isNotNull(), F.lit(0))
             .otherwise(F.col("prev_errs") + 1).alias("err_count"),
            F.when(F.col("html").isNotNull(), F.lit(200))
             .otherwise(F.lit(404)).alias("http_status"),
            F.col("html").isNotNull().alias("is_indexed"),
            F.coalesce("lang", F.lit("")).alias("lang"),
        )

        # ---- 10. harvest outlinks (E5-E8) ------------------------------
        parents = fetched.filter(
            F.col("html").isNotNull() & F.col("harvest_links"))
        exploded = (
            parents
            .withColumn("links",
                        udfs.extract_links_udf(F.col("html"), F.col("url")))
            .select(F.col("url").alias("parent_url"),
                    F.col("uh48").alias("parent_uh48"),
                    F.col("host").alias("parent_host"),
                    F.col("hop_count").alias("parent_hop"),
                    F.col("first_ip").alias("parent_ip"),
                    F.col("fetch_time_ms"), F.col("seq"),
                    F.posexplode("links").alias("link_idx", "link"))
            .filter(~F.col("link.nofollow"))
            .withColumn("url", F.col("link.url"))
            .withColumn("uh48", udfs.uh48_udf(F.col("url")))
            .filter(F.col("uh48") != F.col("parent_uh48"))  # self link
            .withColumn("host", udfs.host_udf(F.col("url")))
        )
        # F3: record (uh48, parent C-block) for every surviving link whose
        # host resolves — including already-seen urls (spiderdb accumulates
        # one SpiderRequest per parent; we accumulate the count table)
        new_inlinks = (
            exploded
            .join(F.broadcast(self.hostmeta.select("host")), "host",
                  "inner")
            .select("uh48",
                    F.shiftright(F.col("parent_ip"), 8)
                    .alias("parent_cblock"))
        )

        # dedup within batch: first discovery in (parent seq, link order)
        w_new = Window.partitionBy("uh48").orderBy("seq", "link_idx")
        seen = requests.select("uh48").distinct()
        deduped = (
            exploded
            .withColumn("_rn", F.row_number().over(w_new))
            .filter(F.col("_rn") == 1)
        )
        if getattr(cfg, "use_bloom", False):
            # C5 bloom pre-filter: definitely-new urls skip the (large)
            # exact anti-join shuffle; maybe-seen go through it. Routing
            # only — the final membership decision is always exact, so
            # crawl-order parity is unaffected.
            from ..operators.urlseen import bloom_maybe_seen, build_bloom
            bloom = build_bloom(seen, bucket_bits=4)
            routed = bloom_maybe_seen(deduped, bloom, bucket_bits=4)
            definitely_new = routed.filter(~F.col("maybe_seen")) \
                .drop("maybe_seen")
            maybe = (routed.filter(F.col("maybe_seen")).drop("maybe_seen")
                     .join(seen, "uh48", "left_anti"))
            deduped = definitely_new.unionByName(maybe)
        else:
            deduped = deduped.join(seen, "uh48", "left_anti")
        new_requests = (
            deduped
            .join(F.broadcast(self.hostmeta.select("host", "first_ip")),
                  "host", "inner")  # unknown host = DNS failure
            .withColumn("parent_domain", udfs.domain_udf(
                F.col("parent_host")))
            .withColumn("domain", udfs.domain_udf(F.col("host")))
            .select(
                "url", "uh48",
                F.col("first_ip").cast("long").alias("first_ip"),
                "host",
                (F.col("parent_hop") + 1).alias("hop_count"),
                F.col("fetch_time_ms").alias("added_time_ms"),
                F.col("fetch_time_ms").alias("discovery_time_ms"),
                F.lit(False).alias("is_addurl"),
                F.lit(False).alias("is_injected"),
                F.lit(False).alias("is_reindex"),
                ((F.col("domain") != "") &
                 (F.col("domain") == F.col("parent_domain")))
                .alias("same_dom"),
                (F.col("host") == F.col("parent_host")).alias("same_host"),
                F.lit(False).alias("parent_is_rss"),
                F.lit(False).alias("parent_is_sitemap"),
                F.lit(0).alias("page_num_inlinks"),
            )
        ).cache()
        n_new = new_requests.count()

        # ---- 11. commit state (one snapshot per table per round) ------
        stats = new_replies.agg(
            F.sum(F.when(F.col("err_code") == 0, 1).otherwise(0))
            .alias("ok"),
            F.sum(F.when(F.col("err_code") != 0, 1).otherwise(0))
            .alias("err")).collect()[0]
        n_ok = stats.ok or 0
        n_err = stats.err or 0

        self.t_replies.append(new_replies,
                              {"round": rnd, "rows": n_sched})
        n_inl = new_inlinks.count()
        if n_inl > 0:
            self.t_inlinks.append(new_inlinks, {"round": rnd,
                                                "rows": n_inl})
        if n_new > 0:
            self.t_requests.append(new_requests,
                                   {"round": rnd, "rows": n_new})
        # ip_state merge (overwrite small table)
        new_ip = (scheduled.groupBy("first_ip")
                  .agg(F.max("fetch_time_ms").alias("last_download_ms")))
        merged_ip = (
            ip_state.join(new_ip, "first_ip", "full")
            .select("first_ip",
                    F.greatest(
                        F.coalesce(ip_state.last_download_ms, F.lit(0)),
                        F.coalesce(new_ip.last_download_ms, F.lit(0)))
                    .alias("last_download_ms"))
        ) if ip_state.count() > 0 else new_ip
        self.t_ip_state.overwrite(merged_ip, {"round": rnd})

        self.t_schedule.append(
            scheduled.select(F.lit(rnd).alias("round"), "seq", "url",
                             "uh48", "first_ip", "priority", "hop_count",
                             "fetch_time_ms"),
            {"round": rnd})

        metrics = dict(round=rnd, scheduled=n_sched, fetched_ok=int(n_ok),
                       fetch_errors=int(n_err), new_urls=int(n_new))
        self.t_metrics.append(
            self.spark.createDataFrame(
                [metrics], "round int, scheduled long, fetched_ok long, "
                "fetch_errors long, new_urls long"),
            metrics)
        scheduled.unpersist()
        fetched.unpersist()
        new_requests.unpersist()
        return metrics

    # ------------------------------------------------------------------
    def run(self, rounds: int) -> list[dict]:
        start = self.current_round()
        out = []
        for r in range(start, start + rounds):
            out.append(self.run_round(r))
        return out

    def schedule_df(self) -> DataFrame:
        return self.t_schedule.read(self.spark)

    def url_seen_df(self) -> DataFrame:
        """URL-seen set = distinct uh48 ever enqueued (C5 exact set)."""
        return (self.t_requests.read(self.spark)
                .select("uh48").distinct())
