"""Arrow-batched pandas UDFs wrapping the deterministic kernels.

These are the ONLY Python-executed operators in the crawl pipeline — the
parity-critical per-document transforms the reference implements in C++
(Url::set, getUrlHash48, isAllowed2, Xml::getText, Links::set).  Everything
else (filters, windows, joins, politeness arithmetic) is pure Column
expressions compiled by functions/filters.py.

Scale notes: each UDF receives Arrow record batches
(spark.sql.execution.arrow.maxRecordsPerBatch rows at a time), so Python
overhead is amortized per batch; the hash UDF is fully NumPy-vectorized
(gbhash.hash64_batch), the string kernels are tight scalar loops per value.
No driver-side collect anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernel import extract, gbhash, robots, urlnorm


@pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """Url::set canonical form (Url.cpp:141-840)."""
    return urls.map(lambda u: urlnorm.canonicalize(u) if u else "")


@pandas_udf(T.LongType())
def uh48_udf(urls: pd.Series) -> pd.Series:
    """getUrlHash48 over canonical urls — NumPy-vectorized tabulation hash
    (Spider.h:412,791)."""
    vals = gbhash.uh48_batch(urls.fillna("").tolist())
    return pd.Series(vals.astype("int64"))


@pandas_udf(T.LongType())
def probable_docid_udf(urls: pd.Series) -> pd.Series:
    """Titledb.h:56-69 probable docid (38-bit, domain-clustered)."""
    def one(u):
        if not u:
            return 0
        host = urlnorm.get_host(u)
        return gbhash.probable_docid(u, urlnorm.get_domain(host) or host)
    return urls.map(one)


@pandas_udf(T.StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.get_host(u) if u else "")


@pandas_udf(T.StringType())
def domain_udf(hosts: pd.Series) -> pd.Series:
    return hosts.map(lambda h: urlnorm.get_domain(h) if h else "")


@pandas_udf(T.StringType())
def tld_udf(hosts: pd.Series) -> pd.Series:
    return hosts.map(lambda h: urlnorm.get_tld(h) if h else "")


@pandas_udf(T.IntegerType())
def host_hash32_udf(hosts: pd.Series) -> pd.Series:
    import numpy as np
    return hosts.map(
        lambda h: np.int32(np.uint32(gbhash.hash32s(h or ""))).item())


_ROBOTS_SCHEMA = T.StructType([
    T.StructField("allowed", T.BooleanType()),
    T.StructField("crawl_delay_ms", T.IntegerType()),
])


def make_robots_udf(user_agent: str = robots.DEFAULT_USER_AGENT):
    @pandas_udf(_ROBOTS_SCHEMA)
    def robots_udf(robots_txt: pd.Series, status: pd.Series,
                   url: pd.Series) -> pd.DataFrame:
        """isAllowed2 two-pass + crawl delay (XmlDoc.cpp:14817-15004).
        Parse+match per row — kept for tests/one-off checks only; the
        scheduler uses make_robots_rules_udf (parse per host, once) +
        robots_match_udf (match per url)."""
        out_a, out_d = [], []
        for txt, st, u in zip(robots_txt, status, url):
            v = robots.check(txt, urlnorm.get_path_cgi(u or "/"),
                             user_agent,
                             int(st) if st is not None else 404)
            out_a.append(v.allowed)
            out_d.append(robots.final_crawl_delay_ms(v.crawl_delay_ms))
        return pd.DataFrame({"allowed": out_a, "crawl_delay_ms": out_d})
    return robots_udf


_ROBOTS_RULES_SCHEMA = T.StructType([
    T.StructField("disallow", T.ArrayType(T.StringType())),
    T.StructField("crawl_delay_ms", T.IntegerType()),
])


def make_robots_rules_udf(user_agent: str = robots.DEFAULT_USER_AGENT):
    """Parse robots.txt ONCE per host row → effective Disallow prefixes +
    finalized crawl delay (default 250ms, cap 60s).  Runs over the
    |hosts|-row hostmeta table, never over candidates — the 24h per-host
    robots cache analog (Msg13.cpp:590)."""
    @pandas_udf(_ROBOTS_RULES_SCHEMA)
    def robots_rules_udf(robots_txt: pd.Series,
                         status: pd.Series) -> pd.DataFrame:
        pats, delays = [], []
        for txt, st in zip(robots_txt, status):
            p, d = robots.effective_rules(
                txt, user_agent, int(st) if st is not None else 404)
            pats.append(p)
            delays.append(robots.final_crawl_delay_ms(d))
        return pd.DataFrame({"disallow": pats, "crawl_delay_ms": delays})
    return robots_rules_udf


@pandas_udf(T.BooleanType())
def robots_match_udf(disallow: pd.Series, path_cgi: pd.Series) -> pd.Series:
    """Per-url allow check over PRE-PARSED Disallow prefixes — prefix
    compares only, no parsing (isAllowed2 match step,
    XmlDoc.cpp:14920-14975).  Arrow-batched; the only Python the
    candidate-filter path runs per row."""
    out = []
    for pats, pc in zip(disallow, path_cgi):
        if pats is None or len(pats) == 0:
            out.append(True)
        else:
            out.append(robots.match_path(list(pats), pc or "/"))
    return pd.Series(out)


@pandas_udf(T.StringType())
def get_text_udf(html: pd.Series) -> pd.Series:
    """Xml::getText visible-text extraction — byte-identical to the pages
    table's `text` column (Xml.cpp:665-843)."""
    def one(h):
        if h is None:
            return ""
        if isinstance(h, (bytes, bytearray)):
            h = h.decode("utf-8", "replace")
        return extract.get_text(h)
    return html.map(one)


_LINKS_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("nofollow", T.BooleanType()),
    T.StructField("tag", T.StringType()),
    T.StructField("is_rss", T.BooleanType()),
]))


@pandas_udf(_LINKS_SCHEMA)
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """Links::set + per-page dedup (Linkdb.cpp:4980, XmlDoc.cpp:27682)."""
    def one(h, b):
        if h is None:
            return []
        if isinstance(h, (bytes, bytearray)):
            h = h.decode("utf-8", "replace")
        return [tuple(ln) for ln in
                extract.dedup_links(extract.extract_links(h, b or ""))]
    return pd.Series([one(h, b) for h, b in zip(html, base_url)])


@pandas_udf(T.IntegerType())
def content_hash32_udf(html: pd.Series) -> pd.Series:
    """m_contentHash32 analog (Spider.h:869) via gb hash32."""
    import numpy as np

    def one(h):
        if h is None:
            return 0
        if isinstance(h, str):
            h = h.encode("utf-8", "replace")
        return np.int32(np.uint32(gbhash.hash32(h))).item()
    return html.map(one)


def with_url_identity(df, url_col: str = "url"):
    """Attach canonical url, uh48, host, domain columns."""
    c = F.col(url_col)
    return (df
            .withColumn("url", canonicalize_udf(c))
            .withColumn("uh48", uh48_udf(F.col("url")))
            .withColumn("host", host_udf(F.col("url"))))
