"""Partitioned Bloom-filter URL-seen set (north-star component C5).

The reference's URL-seen is the in-RAM dup cache (Spider.cpp:2136) backed
by spiderdb itself; at 10^10 URLs an exact anti-join per round shuffles the
whole seen-set.  This operator keeps a bucketed Bloom filter alongside the
exact ``url_seen`` table:

- bucket = uh48 >> (48 - bucket_bits)  (range-partitioned like spiderdb's
  key order, so each bucket's bitmap is built from one partition)
- per-bucket bitmap built distributedly with ``applyInPandas`` (NumPy
  bitwise ops over Arrow batches), k hash probes derived from uh48 by
  splitting/mixing its bits — no Python per row
- membership pre-filter: join candidates to their bucket's bitmap and test
  k probes vectorized; only *maybe-seen* candidates proceed to the exact
  anti-join, definite-new ones skip it

False positives would wrongly suppress new URLs, so the pre-filter is used
in the scheduler as: new = definitely_new ∪ (maybe_seen anti-join exact).
Parity is unaffected; the bloom only routes work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS_PER_BUCKET = 1 << 20  # 128 KiB bitmap per bucket
K_PROBES = 4


def _probes(uh48: np.ndarray, m: int) -> list[np.ndarray]:
    """K probe positions per key, derived from disjoint bit mixes of uh48."""
    u = uh48.astype(np.uint64)
    out = []
    for k in range(K_PROBES):
        x = u * np.uint64(0x9E3779B97F4A7C15) + np.uint64(k * 0x85EBCA6B)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        out.append((x % np.uint64(m)).astype(np.int64))
    return out


def build_bloom(seen: DataFrame, bucket_bits: int = 6,
                m_bits: int = DEFAULT_BITS_PER_BUCKET) -> DataFrame:
    """→ (bucket int, bitmap binary). Distributed build, one bitmap per
    bucket."""
    shift = 48 - bucket_bits

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        uh = pdf["uh48"].to_numpy()
        for pos in _probes(uh, m_bits):
            np.bitwise_or.at(bm, pos >> 3,
                             (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])],
                             "bitmap": [bm.tobytes()]})

    keyed = seen.select(
        "uh48",
        (F.col("uh48") / F.lit(1 << shift)).cast("long").alias("bucket"))
    return keyed.groupBy("bucket").applyInPandas(
        build, "bucket long, bitmap binary")


def bloom_maybe_seen(candidates: DataFrame, bloom: DataFrame,
                     bucket_bits: int = 6,
                     m_bits: int = DEFAULT_BITS_PER_BUCKET) -> DataFrame:
    """Adds ``maybe_seen`` boolean to candidates (false ⇒ definitely new).
    Buckets with no bitmap ⇒ definitely new."""
    shift = 48 - bucket_bits

    def test(pdf: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(pdf), dtype=bool)
        bitmap = None
        for b in pdf["bitmap"]:
            if b is not None:
                bitmap = np.frombuffer(b, dtype=np.uint8)
                break
        if bitmap is not None:
            uh = pdf["uh48"].to_numpy()
            hit = np.ones(len(pdf), dtype=bool)
            for pos in _probes(uh, m_bits):
                hit &= (bitmap[pos >> 3] & (1 << (pos & 7))) != 0
            out = hit
        res = pdf.drop(columns=["bitmap"]).copy()
        res["maybe_seen"] = out
        return res

    keyed = candidates.withColumn(
        "bucket",
        (F.col("uh48") / F.lit(1 << shift)).cast("long"))
    joined = keyed.join(bloom, "bucket", "left")
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in keyed.schema.fields) + ", maybe_seen boolean"
    return joined.groupBy("bucket").applyInPandas(test, schema) \
        .drop("bucket")
