"""Tests: WARC ingest, charset detection, url flags, title/summary."""

import pytest

from open_source_search_engine_spark.kernel import charset, urlflags
from open_source_search_engine_spark.sources import warc


def test_warc_roundtrip(spark, tmp_path):
    pages = [
        ("http://a.com/", "2020-01-01T00:00:00Z",
         b"<html><title>A</title><body>hello</body></html>"),
        ("http://b.com/x", "2020-01-01T00:01:00Z",
         b"<html><body>world</body></html>"),
    ]
    p = str(tmp_path / "test.warc")
    warc.write_test_warc(p, pages)
    df = warc.read_warc(spark, p)
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {"http://a.com/", "http://b.com/x"}
    assert bytes(rows["http://a.com/"].html) == pages[0][2]
    assert rows["http://a.com/"].http_status == 200
    assert rows["http://b.com/x"].record_type == "response"


def test_warc_parse_gzip(tmp_path):
    import gzip
    pages = [("http://c.com/", "2020-01-01T00:00:00Z", b"<html>x</html>")]
    raw = str(tmp_path / "t.warc")
    warc.write_test_warc(raw, pages)
    gz = str(tmp_path / "t.warc.gz")
    with open(raw, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    with open(gz, "rb") as f:
        recs = warc.parse_warc_bytes(f.read())
    assert recs[0]["url"] == "http://c.com/"
    assert recs[0]["html"] == b"<html>x</html>"


def test_charset_detection():
    assert charset.detect_charset(b"\xef\xbb\xbfhello") == "utf-8-sig"
    assert charset.detect_charset(b"plain ascii text") == "utf-8"
    assert charset.detect_charset(
        b'<html><meta charset="ISO-8859-1"><body>') == "latin-1"
    assert charset.detect_charset(
        b'<meta http-equiv="Content-Type" content="text/html; '
        b'charset=windows-1252">') == "cp1252"
    assert charset.detect_charset(b"x", "text/html; charset=utf-8") == \
        "utf-8"
    # invalid utf-8 falls back to latin-1
    assert charset.detect_charset(b"caf\xe9") == "latin-1"
    assert charset.to_utf8(b"caf\xe9") == "café"
    assert charset.to_utf8("日本語".encode()) == "日本語"


def test_charset_full_iana_roundtrips():
    """E1: the IANA name space real web HTML declares (shift-jis, gb2312,
    koi8, euc-kr, iso-8859-*, windows-125x) must round-trip through the
    codecs-registry resolution (iana_charset.cpp analog)."""
    cases = [
        ("shift_jis", "Shift_JIS", "日本語のテキスト"),
        ("shift_jis", "x-sjis", "カタカナ"),
        ("euc_jp", "EUC-JP", "日本語"),
        ("gb2312", "GB2312", "中文文本"),
        ("gbk", "GBK", "简体中文"),
        ("big5", "Big5", "繁體中文"),
        ("cp949", "ks_c_5601-1987", "한국어 텍스트"),
        ("euc_kr", "EUC-KR", "한국어"),
        ("koi8-r", "KOI8-R", "русский текст"),
        ("cp1251", "windows-1251", "кириллица"),
        ("iso-8859-2", "ISO-8859-2", "čeština šťastný"),
        ("iso-8859-7", "ISO-8859-7", "ελληνικά"),
        ("cp874", "windows-874", "ข้อความไทย"),
        ("iso-8859-9", "ISO-8859-9", "Türkçe metin"),
    ]
    for codec, iana, text in cases:
        body = f'<html><meta charset="{iana}"><body>{text}</body>'
        raw = body.encode(codec)
        assert charset.to_utf8(raw) == body, (iana, codec)
    # header beats meta; unknown name falls through to heuristic
    raw = "héllo".encode("cp1252")
    assert charset.to_utf8(b"<meta charset='x-not-a-charset'>" + raw) \
        .endswith("héllo")


def test_link_loop():
    assert urlflags.is_link_loop(
        "http://x.com/a/letters/send/archive/letters/send/archive/"
        "letters/send/b/")
    assert not urlflags.is_link_loop("http://x.com/a/b/c/d/e/")
    assert not urlflags.is_link_loop("http://x.com/")


def test_spam_url():
    assert urlflags.is_spam_url("http://buy-viagra.example.com/")
    assert not urlflags.is_spam_url("http://news.example.com/politics")


def test_title_and_summary():
    html = ("<html><head><title> My   &amp; Title </title></head>"
            "<body><p>alpha beta gamma delta epsilon zeta</p>"
            "<script>junk()</script></body></html>")
    assert urlflags.get_title(html) == "My & Title"
    # summary over visible text (entities undecoded — getText semantics)
    assert "gamma" in urlflags.make_summary(html, ["gamma"])
    s = urlflags.make_summary(html, ["delta"], max_len=30)
    assert "delta" in s
    assert urlflags.make_summary("<body>lead text here</body>") == \
        "lead text here"
