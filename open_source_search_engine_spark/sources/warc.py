"""WARC/ARC archive ingestion (A7: Url::isWarc/isArc Url.h:95-98,
qaWarcFiles qa.cpp:1519).

The reference spider can be fed ``.warc(.gz)`` archives instead of live
fetches.  Spark-side: read whole files with ``binaryFile``, split records
with a vectorized ``mapInPandas`` parser (WARC framing is line-oriented:
``WARC/1.0`` header block, ``Content-Length``, blank line, payload), and
emit pages rows compatible with the crawl pipeline's ``pages`` table.

Only ``response`` records with an http payload become pages; the http
header block is stripped; charset decoding via kernel-side detection
(functions/charset semantics).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = ("url string, warc_ts string, html binary, "
                "http_status int, record_type string")


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Split one WARC file (possibly gzipped) into records."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out = []
    stream = io.BytesIO(data)
    while True:
        line = stream.readline()
        if not line:
            break
        if not line.startswith(b"WARC/"):
            continue
        headers: dict[str, str] = {}
        while True:
            hl = stream.readline()
            if not hl or hl in (b"\r\n", b"\n"):
                break
            if b":" in hl:
                k, v = hl.split(b":", 1)
                headers[k.strip().decode("latin-1").lower()] = \
                    v.strip().decode("latin-1")
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        # skip record separator
        stream.readline()
        stream.readline()
        rtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri", "")
        ts = headers.get("warc-date", "")
        status = 0
        body = payload
        if rtype == "response" and payload[:5] in (b"HTTP/",):
            # strip http headers
            sep = payload.find(b"\r\n\r\n")
            if sep < 0:
                sep = payload.find(b"\n\n")
                hdr_end = sep + 2 if sep >= 0 else 0
            else:
                hdr_end = sep + 4
            first = payload.split(b"\r\n", 1)[0].split(b" ")
            if len(first) >= 2 and first[1].isdigit():
                status = int(first[1])
            body = payload[hdr_end:] if hdr_end else payload
        out.append(dict(url=url, warc_ts=ts, html=body,
                        http_status=status, record_type=rtype))
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """spark.read binaryFile → vectorized record splitter → pages rows."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(blob)))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "http_status",
                               "record_type"])

    return files.mapInPandas(run, PAGES_SCHEMA)


def write_test_warc(path: str, pages: list[tuple[str, str, bytes]]) -> None:
    """Tiny WARC writer for fixtures: (url, ts, html)."""
    with open(path, "wb") as f:
        for url, ts, html in pages:
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
                    html)
            hdr = (f"WARC/1.0\r\n"
                   f"WARC-Type: response\r\n"
                   f"WARC-Target-URI: {url}\r\n"
                   f"WARC-Date: {ts}\r\n"
                   f"Content-Length: {len(http)}\r\n"
                   f"\r\n").encode()
            f.write(hdr + http + b"\r\n\r\n")
