"""Golden tests for the tabulation-hash kernel (reference hash.cpp/hash.h).

The table pin g_hashtab[0][0]==6720717044602784129 is the reference's own
self-check (hash.cpp:48) — if it matches, every derived hash (uh48, docid,
shard) is bit-exact by construction.
"""

import numpy as np

from open_source_search_engine_spark.kernel import gbhash


def test_hashtab_pin():
    assert int(gbhash.G_HASHTAB[0, 0]) == gbhash.HASHTAB_PIN


def test_hash64b_xor_structure():
    # hash64b("a") must equal tab[0][ord('a')]
    assert gbhash.hash64b("a") == int(gbhash.G_HASHTAB[0, ord("a")])
    # two-char hash = xor of positional entries
    expect = int(gbhash.G_HASHTAB[0, ord("a")]) ^ int(
        gbhash.G_HASHTAB[1, ord("b")])
    assert gbhash.hash64b("ab") == expect


def test_position_wrap_at_256():
    # byte 256 uses table row 0 again ((unsigned char)i cast, hash.h:91)
    s = "x" * 257
    base = gbhash.hash64b("x" * 256)
    assert gbhash.hash64b(s) == base ^ int(gbhash.G_HASHTAB[0, ord("x")])


def test_uh48_masks_to_48_bits():
    for u in ["http://a.com/", "http://b.com/x?y=1"]:
        assert gbhash.uh48(u) == gbhash.hash64b(u) & ((1 << 48) - 1)
        assert gbhash.uh48(u) < (1 << 48)


def test_probable_docid_domain_clustering():
    # bits 6..13 must equal hash8(domain)<<6 (Titledb.h:56-69)
    d = gbhash.probable_docid("http://www.example.com/page", "example.com")
    h8 = gbhash.hash8(b"example.com")
    assert (d >> 6) & 0xFF == h8
    assert d < (1 << 38)


def test_batch_matches_scalar():
    urls = ["", "a", "http://www.example.com/", "x" * 300,
            "http://foo.bar/baz?q=1"]
    batch = gbhash.hash64_batch([u.encode() for u in urls])
    scalar = [gbhash.hash64b(u) for u in urls]
    assert [int(x) for x in batch] == scalar
    ub = gbhash.uh48_batch(urls)
    assert [int(x) for x in ub] == [gbhash.uh48(u) for u in urls]


def test_hash32h_deterministic():
    a = gbhash.hash32h(0x01020304, 0x123456)
    assert a == gbhash.hash32h(0x01020304, 0x123456)
    assert 0 <= a < (1 << 32)
    # shard mapping is stable
    assert gbhash.hash32h(12345, 0x123456) % 128 == \
        gbhash.hash32h(12345, 0x123456) % 128


def test_batch_is_vectorized_dtype():
    out = gbhash.hash64_batch([b"abc"] * 10)
    assert isinstance(out, np.ndarray) and out.dtype == np.uint64
