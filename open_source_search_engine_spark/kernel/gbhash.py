"""Deterministic tabulation (Zobrist) hashing, bit-compatible with the
reference engine's identity scheme.

The reference seeds glibc ``srand(1945687)`` and fills a 256x256 table of
``uint64`` (reference: hash.cpp:12-53), self-checked against
``g_hashtab[0][0] == 6720717044602784129``.  All URL/host/domain identity in
the crawl tier derives from this table:

- ``hash64b(s)``  — XOR of ``tab[i & 0xff][byte]`` per byte (hash.h:87-95)
- ``uh48``        — ``hash64b(url) & 0xffffffffffff`` (Spider.h:412-413,791-794)
- probable docid  — ``hash64b(url) & DOCID_MASK`` with bits 6..13 replaced by
                    ``hash8(domain) << 6`` (Titledb.h:56-69)
- ``hash32/hash32h`` — 32-bit variants (hash.cpp:106-175); ``hash32h`` keys the
                    frontier shard: ``hash32h(firstIp, 0x123456)``
                    (Hostdb.cpp:2522-2541)

We reproduce glibc ``rand()`` (TYPE_3 additive feedback generator) in pure
Python once at import, build the table as a NumPy array, and vectorize the
string hashes for Arrow/pandas UDF use.  No reference code is copied; the
generator is the published glibc algorithm.
"""

from __future__ import annotations

import numpy as np

HASHTAB_PIN = 6720717044602784129
DOCID_MASK = (1 << 38) - 1  # 38-bit docids (Titledb.h:22 DOCID_MASK)
UH48_MASK = (1 << 48) - 1


def _glibc_rand_stream(seed: int, n: int) -> np.ndarray:
    """First ``n`` outputs of glibc rand() (TYPE_3, 31-word additive FG).

    Published algorithm: r[0]=seed; r[i]=16807*r[i-1] mod 2^31-1 for i<31
    (computed via Schrage to match 32-bit int overflow behaviour);
    r[31..33]=r[0..2]; r[i]=r[i-31]+r[i-3] mod 2^32 onward; first 34..343
    values are warm-up; output is (r[i] >> 1) for i>=344.
    """
    total = 344 + n
    r = [0] * total
    x = seed % 2147483647
    if x == 0:
        x = 1
    r[0] = x
    for i in range(1, 31):
        # Schrage: 16807*x mod 2^31-1 without overflow
        hi, lo = divmod(x, 127773)
        x = 16807 * lo - 2836 * hi
        if x < 0:
            x += 2147483647
        r[i] = x
    for i in range(31, 34):
        r[i] = r[i - 31]
    for i in range(34, total):
        r[i] = (r[i - 31] + r[i - 3]) & 0xFFFFFFFF
    out = np.array(r[344:], dtype=np.uint64)
    return out >> np.uint64(1)


def _build_hashtab() -> np.ndarray:
    """Replicates the reference table-fill loop (hash.cpp:27-47).

    Per entry, in order: a=rand(); b=rand(); c=rand(); d=rand();
    hi32 = a | (0x80000000 if b > 0x7fffffff/2); lo32 likewise from c,d;
    value = hi32<<32 | lo32.
    """
    stream = _glibc_rand_stream(1945687, 256 * 256 * 4)
    s = stream.reshape(256 * 256, 4)
    half = np.uint64(0x7FFFFFFF // 2)
    hi = s[:, 0] | np.where(s[:, 1] > half, np.uint64(0x80000000), np.uint64(0))
    lo = s[:, 2] | np.where(s[:, 3] > half, np.uint64(0x80000000), np.uint64(0))
    tab = (hi << np.uint64(32)) | lo
    tab = tab.reshape(256, 256)
    if int(tab[0, 0]) != HASHTAB_PIN:
        raise RuntimeError(
            f"g_hashtab self-check failed: {int(tab[0,0])} != {HASHTAB_PIN}"
        )
    return tab


G_HASHTAB: np.ndarray = _build_hashtab()
# low-8-bit view for hash8 (hash.cpp:56-66 casts each entry to unsigned char)
_G_HASHTAB8: np.ndarray = (G_HASHTAB & np.uint64(0xFF)).astype(np.uint8)
_G_HASHTAB32: np.ndarray = (G_HASHTAB & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def hash64(data: bytes, start: int = 0) -> int:
    """hash64 / hash64b over a byte string (index wraps at 256 via the
    ``(unsigned char)i`` cast in the reference)."""
    h = start
    for i, b in enumerate(data):
        h ^= int(G_HASHTAB[i & 0xFF, b])
    return h & 0xFFFFFFFFFFFFFFFF


def hash64b(s: str, start: int = 0) -> int:
    """NUL-terminated variant: hashes the UTF-8 bytes of ``s``."""
    return hash64(s.encode("utf-8", "surrogateescape"), start)


def hash32(data: bytes, start: int = 0) -> int:
    h = start
    for i, b in enumerate(data):
        h ^= int(_G_HASHTAB32[i & 0xFF, b])
    return h & 0xFFFFFFFF


def hash32s(s: str, start: int = 0) -> int:
    return hash32(s.encode("utf-8", "surrogateescape"), start)


def hash8(data: bytes) -> int:
    h = 0
    for i, b in enumerate(data):
        h ^= int(_G_HASHTAB8[i & 0xFF, b])
    return h & 0xFF


def hash32h(h1: int, h2: int) -> int:
    """Combine two 32-bit hashes byte-wise (hash.cpp:162-175); shards the
    frontier: shard = hash32h(first_ip, 0x123456) % nshards."""
    h = 0
    b1 = int(h1 & 0xFFFFFFFF).to_bytes(4, "little")
    b2 = int(h2 & 0xFFFFFFFF).to_bytes(4, "little")
    for i in range(4):
        h ^= int(_G_HASHTAB32[i, b1[i]])
    for i in range(4):
        h ^= int(_G_HASHTAB32[4 + i, b2[i]])
    return h & 0xFFFFFFFF


def uh48(url: str) -> int:
    """URL-seen key: hash64b(canonical_url) & 48 bits (Spider.h:791-794)."""
    return hash64b(url) & UH48_MASK


def probable_docid(url: str, domain: str) -> int:
    """38-bit probable docid with domain-hash clustering (Titledb.h:56-69)."""
    d = hash64b(url) & DOCID_MASK
    d &= 0xFFFFFFFFFFFFC03F
    d |= (hash8(domain.encode("utf-8", "surrogateescape")) << 6) & 0x3FC0
    return d


# ---------------------------------------------------------------------------
# Vectorized (NumPy) batch variants for Arrow / pandas-UDF hot paths.
# ---------------------------------------------------------------------------

def hash64_batch(values: "list[bytes] | np.ndarray") -> np.ndarray:
    """Vectorized hash64 over a batch of byte strings.

    Packs the batch into one flat uint8 buffer, gathers table entries with a
    single fancy-index, and XOR-reduces per string via ``np.bitwise_xor.reduceat``.
    This keeps the per-row Python out of the UDF hot path (north rule).
    """
    if len(values) == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = np.fromiter((len(v) for v in values), dtype=np.int64, count=len(values))
    flat = np.frombuffer(b"".join(values), dtype=np.uint8)
    if flat.size == 0:
        return np.zeros(len(values), dtype=np.uint64)
    # position index within each string, wrapping at 256
    starts = np.zeros(len(values), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = (np.arange(flat.size, dtype=np.int64)
           - np.repeat(starts, lens)) & 0xFF
    gathered = G_HASHTAB[pos, flat]
    # reduceat needs non-empty segments: handle zero-length strings after
    nonzero = lens > 0
    out = np.zeros(len(values), dtype=np.uint64)
    if nonzero.any():
        seg_starts = starts[nonzero]
        out[nonzero] = np.bitwise_xor.reduceat(gathered, seg_starts)
        # reduceat on a single trailing segment handles end-of-array fine
    return out


def uh48_batch(urls) -> np.ndarray:
    vals = [u.encode("utf-8", "surrogateescape") for u in urls]
    return hash64_batch(vals) & np.uint64(UH48_MASK)
