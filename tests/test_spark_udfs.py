"""Arrow-UDF parity: the Spark extraction UDFs must reproduce the kernel
byte-for-byte on every page of the synthetic corpus (north rule:
byte-identical extracted text per url)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.functions import udfs
from open_source_search_engine_spark.kernel import extract, gbhash, urlnorm
from open_source_search_engine_spark.sources import synthweb


@pytest.fixture(scope="module")
def corpus_df(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("udfweb"))
    paths = synthweb.write_corpus(d, n_hosts=10, mean_pages=5, n_seeds=3)
    return spark.read.parquet(paths["pages"])


def test_get_text_udf_byte_identical(corpus_df):
    out = (corpus_df
           .withColumn("text2", udfs.get_text_udf(F.col("html")))
           .filter(F.col("text2") != F.col("text"))
           .count())
    assert out == 0


def test_uh48_udf_matches_kernel(spark):
    urls = ["http://www.example.com/", "http://a.b.co.uk/x?q=1",
            "http://xn--topbeskring-g9a.dk/velkommen"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.withColumn("h", udfs.uh48_udf(F.col("url"))).collect()
    for r in rows:
        assert r.h == gbhash.uh48(r.url)


def test_canonicalize_udf_matches_kernel(spark):
    raws = ["HTTP://Example.COM:80/a/../b#frag",
            "http://x.com/?PHPSESSID=737aec14eb7b360983d4fe39395&p=1",
            "example.org/path"]
    df = spark.createDataFrame([(u,) for u in raws], ["raw"])
    rows = df.withColumn("c", udfs.canonicalize_udf(F.col("raw"))).collect()
    for r in rows:
        assert r.c == urlnorm.canonicalize(r.raw)


def test_extract_links_udf_matches_kernel(corpus_df):
    sample = corpus_df.limit(20)
    rows = (sample
            .withColumn("links",
                        udfs.extract_links_udf(F.col("html"), F.col("url")))
            .select("url", "html", "links").collect())
    for r in rows:
        html = bytes(r.html).decode("utf-8")
        want = extract.dedup_links(extract.extract_links(html, r.url))
        got = [(l.url, l.nofollow, l.tag, l.is_rss) for l in r.links]
        assert got == [tuple(w) for w in want]


def test_robots_udf_matches_kernel(spark):
    from open_source_search_engine_spark.kernel import robots
    cases = [
        ("User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n", 200,
         "http://h.com/private/x"),
        ("User-agent: *\nDisallow: /private/\n", 200, "http://h.com/pub"),
        ("", 404, "http://h.com/anything"),
        ("User-agent: giga\nCrawl-delay: 10\nUser-agent: *\nDisallow: /x\n",
         200, "http://h.com/x/1"),
    ]
    df = spark.createDataFrame(cases, ["robots_txt", "status", "url"])
    udf = udfs.make_robots_udf()
    rows = (df.withColumn("v", udf(F.col("robots_txt"), F.col("status"),
                                   F.col("url"))).collect())
    for (txt, st, url), r in zip(cases, rows):
        want = robots.check(txt, urlnorm.get_path_cgi(url),
                            http_status=st)
        assert r.v.allowed == want.allowed
        assert r.v.crawl_delay_ms == robots.final_crawl_delay_ms(
            want.crawl_delay_ms)
