"""Partitioned Cuckoo-filter URL-seen set (north-star component C5, the
deletable twin of operators/urlseen.py's Bloom variant).

The north rule names "a partitioned bloom/cuckoo URL-seen set keyed by
canonicalized 64-bit URL hashes".  The Bloom variant routes the exact
anti-join cheaply but cannot forget: when a URL's spiderdb records are
annihilated by a negative key (Rdb delete semantics, SURVEY §2.H8 —
``negative_annihilation``), a Bloom bitmap keeps claiming it was seen
until the next full rebuild.  A cuckoo filter [Fan et al., CoNEXT'14,
"Cuckoo Filter: Practically Better Than Bloom"] stores per-key
FINGERPRINTS in two candidate buckets, so membership AND deletion are
both O(1) lookups — the seen-set can shrink in place between rebuilds.

Layout mirrors the Bloom operator: the uh48 space is range-partitioned
by its top ``partition_bits`` (spiderdb key order, Spider.h:432-470), one
filter blob per partition, built distributedly with ``applyInPandas``.
Construction is VECTORIZED NumPy, not a per-key Python kick loop:

- slot1 = mix(uh48) mod nb; slot2 = slot1 XOR mix(fp)  (partial-key
  cuckoo hashing — slot2's computation needs only the fingerprint, which
  is what makes deletion and relocation possible without the key)
- placement runs in ROUNDS over whole arrays: round k scatters every
  still-unplaced key into its candidate bucket with `np.unique`
  first-wins collision resolution (one winner per (bucket,way) per
  round), alternating slot1/slot2 ways; a handful of stragglers after
  the vector rounds take the classic kick walk (bounded, ~0.1% of keys
  at 0.7 load).

False positives (fingerprint collisions) are handled exactly like the
Bloom path: the filter only ROUTES candidates — maybe-seen rows still
confirm against the exact table, definitely-new rows skip the anti-join.
Deletion removes one matching fingerprint copy; because every insert
stored exactly one copy per key, deleting keys that were inserted is
safe (the cuckoo-filter deletion contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_WAYS = 4          # 4-way set-associative buckets (CoNEXT'14 sweet spot)
MAX_KICKS = 500
FP_BITS = 16             # 16-bit fingerprints; 0 is reserved for "empty"


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche over uint64 arrays."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def _fingerprint(uh48: np.ndarray) -> np.ndarray:
    """Non-zero FP_BITS-bit fingerprint per key (0 means empty slot)."""
    fp = (_mix(uh48.astype(np.uint64) ^ np.uint64(0xA076_1D64_78BD_642F))
          >> np.uint64(64 - FP_BITS)).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _slot1(uh48: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_mix(uh48.astype(np.uint64)) %
            np.uint64(n_buckets)).astype(np.int64)


def _alt_slot(slot: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Partial-key alternate bucket: slot XOR mix(fp), mod table size.
    n_buckets is a power of two so XOR stays a bijection between the two
    candidate buckets (i2 = i1 ^ h(fp) and i1 = i2 ^ h(fp))."""
    h = (_mix(fp.astype(np.uint64) * np.uint64(0x5BD1E995)) %
         np.uint64(n_buckets)).astype(np.int64)
    # h==0 would make slot2==slot1 (a key with ONE candidate bucket
    # loses the relocation escape hatch); force a displacement of 1.
    h = np.where(h == 0, np.int64(1), h)
    return (slot ^ h) % n_buckets


def _build_table(uh48: np.ndarray, n_buckets: int) -> np.ndarray:
    """Vectorized cuckoo construction → uint16 table[n_buckets*WAYS].
    Duplicate uh48 values collapse to one stored fingerprint (set
    semantics, like the Bloom build)."""
    uh48 = np.unique(uh48.astype(np.uint64))
    table = np.zeros(n_buckets * BUCKET_WAYS, dtype=np.uint16)
    fp = _fingerprint(uh48)
    s1 = _slot1(uh48, n_buckets)
    s2 = _alt_slot(s1, fp, n_buckets)
    pending = np.arange(len(uh48))
    use_alt = np.zeros(len(uh48), dtype=bool)
    # vector rounds: each round tries one (bucket, way) cell per pending
    # key; np.unique(return_index) picks one winner per contested cell
    for _round in range(2 * BUCKET_WAYS):
        if len(pending) == 0:
            break
        slot = np.where(use_alt[pending], s2[pending], s1[pending])
        for way in range(BUCKET_WAYS):
            if len(pending) == 0:
                break
            cell = slot * BUCKET_WAYS + way
            free = table[cell] == 0
            cand_cells, first = np.unique(cell[free], return_index=True)
            winners = np.flatnonzero(free)[first]
            table[cand_cells] = fp[pending[winners]]
            placed = np.zeros(len(pending), dtype=bool)
            placed[winners] = True
            pending = pending[~placed]
            slot = slot[~placed]
        # losers retry in their OTHER candidate bucket next round
        use_alt[pending] = ~use_alt[pending]
    # stragglers (rare at sane load factors): classic kick walk
    for i in pending:
        f, slot = fp[i], s1[i]
        for _ in range(MAX_KICKS):
            cells = slot * BUCKET_WAYS + np.arange(BUCKET_WAYS)
            empty = np.flatnonzero(table[cells] == 0)
            if len(empty):
                table[cells[empty[0]]] = f
                break
            way = int(_mix(np.array([f], dtype=np.uint64))[0] %
                      np.uint64(BUCKET_WAYS))
            f, table[cells[way]] = table[cells[way]], f
            slot = _alt_slot(np.array([slot]), np.array([f]),
                             n_buckets)[0]
        else:
            raise RuntimeError(
                "cuckoo filter over capacity — raise slots_per_key")
    return table


def _lookup(table: np.ndarray, uh48: np.ndarray,
            n_buckets: int) -> np.ndarray:
    fp = _fingerprint(uh48)
    s1 = _slot1(uh48, n_buckets)
    s2 = _alt_slot(s1, fp, n_buckets)
    hit = np.zeros(len(uh48), dtype=bool)
    for s in (s1, s2):
        for way in range(BUCKET_WAYS):
            hit |= table[s * BUCKET_WAYS + way] == fp
    return hit


def _delete(table: np.ndarray, uh48: np.ndarray, n_buckets: int) -> int:
    """Remove ONE stored fingerprint copy per key; returns #removed.
    Safe for keys that were inserted (insert stores exactly one copy)."""
    removed = 0
    fp = _fingerprint(uh48)
    s1 = _slot1(uh48, n_buckets)
    s2 = _alt_slot(s1, fp, n_buckets)
    for i in range(len(uh48)):
        for s in (s1[i], s2[i]):
            cells = s * BUCKET_WAYS + np.arange(BUCKET_WAYS)
            m = np.flatnonzero(table[cells] == fp[i])
            if len(m):
                table[cells[m[0]]] = 0
                removed += 1
                break
    return removed


def _n_buckets_for(n_keys: int, slots_per_key: float) -> int:
    """Power-of-two bucket count giving ≥ slots_per_key slots per key
    (power of two keeps the XOR alternate-bucket map a bijection)."""
    need = max(int(n_keys * slots_per_key), BUCKET_WAYS)
    nb = 1
    while nb * BUCKET_WAYS < need:
        nb <<= 1
    return nb


def build_cuckoo(seen: DataFrame, partition_bits: int = 6,
                 slots_per_key: float = 1.5) -> DataFrame:
    """→ (bucket long, n_buckets long, table binary): one cuckoo filter
    per uh48 range partition, built distributedly.  slots_per_key=1.5
    ⇒ ~0.67 load, where the vector rounds place ≈all keys.  At 16-bit
    fingerprints the filter costs 3 bytes/key — 30 GB for 10^10 URLs
    spread over 2^partition_bits partitions, vs ~600 GB for the exact
    uh48 table it pre-filters."""
    shift = 48 - partition_bits

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        uh = pdf["uh48"].to_numpy()
        nb = _n_buckets_for(len(np.unique(uh)), slots_per_key)
        table = _build_table(uh, nb)
        return pd.DataFrame({
            "bucket": [int(pdf["bucket"].iloc[0])],
            "n_buckets": [nb],
            "table": [table.tobytes()]})

    keyed = seen.select(
        "uh48",
        (F.col("uh48") / F.lit(1 << shift)).cast("long").alias("bucket"))
    return keyed.groupBy("bucket").applyInPandas(
        build, "bucket long, n_buckets long, table binary")


def cuckoo_maybe_seen(candidates: DataFrame, cuckoo: DataFrame,
                      partition_bits: int = 6) -> DataFrame:
    """Adds ``maybe_seen`` boolean (false ⇒ definitely new), same routing
    contract as urlseen.bloom_maybe_seen: definite-new rows skip the
    exact anti-join, maybe-seen rows confirm against the exact table."""
    shift = 48 - partition_bits

    def test(pdf: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(pdf), dtype=bool)
        blob, nb = None, 0
        for b, n in zip(pdf["table"], pdf["n_buckets"]):
            if b is not None:
                blob, nb = np.frombuffer(b, dtype=np.uint16), int(n)
                break
        if blob is not None:
            out = _lookup(blob, pdf["uh48"].to_numpy(), nb)
        res = pdf.drop(columns=["table", "n_buckets"]).copy()
        res["maybe_seen"] = out
        return res

    keyed = candidates.withColumn(
        "bucket",
        (F.col("uh48") / F.lit(1 << shift)).cast("long"))
    joined = keyed.join(cuckoo, "bucket", "left")
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in keyed.schema.fields) + ", maybe_seen boolean"
    return joined.groupBy("bucket").applyInPandas(test, schema) \
        .drop("bucket")


def cuckoo_delete(cuckoo: DataFrame, deletes: DataFrame,
                  partition_bits: int = 6) -> DataFrame:
    """Apply negative keys (Rdb annihilation, SURVEY §2.H8) to the filter
    IN PLACE per partition: each partition's blob drops one fingerprint
    copy per deleted uh48.  → same (bucket, n_buckets, table) schema.
    Partitions with no deletes pass through untouched."""
    shift = 48 - partition_bits
    dels = deletes.select(
        "uh48",
        (F.col("uh48") / F.lit(1 << shift)).cast("long").alias("bucket"))

    def apply_del(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf[pdf["table"].notna()]
        if not len(rows):
            return pd.DataFrame(
                {"bucket": [], "n_buckets": [], "table": []}).astype(
                {"bucket": "int64", "n_buckets": "int64", "table": object})
        row = rows.iloc[0]
        table = np.frombuffer(row["table"], dtype=np.uint16).copy()
        uh = pdf.loc[pdf["del_uh48"].notna(), "del_uh48"] \
            .to_numpy(dtype=np.uint64)
        if len(uh):
            _delete(table, np.unique(uh), int(row["n_buckets"]))
        return pd.DataFrame({"bucket": [int(row["bucket"])],
                             "n_buckets": [int(row["n_buckets"])],
                             "table": [table.tobytes()]})

    joined = cuckoo.join(
        dels.withColumnRenamed("uh48", "del_uh48"), "bucket", "left")
    return joined.groupBy("bucket").applyInPandas(
        apply_del, "bucket long, n_buckets long, table binary")
