"""Golden tests for the Url::set canonicalizer (Url.cpp:141-840) including
the Url::unitTests IDN cases (Url.cpp:2551-2590)."""

import pytest

from open_source_search_engine_spark.kernel.urlnorm import (
    canonicalize, get_domain, get_host, get_path_cgi, get_tld,
    resolve_relative,
)

CASES = [
    # scheme/host basics
    ("http://www.Example.COM/Path", "http://www.example.com/Path"),
    ("HtTpS://UPPER.example.com./", "https://upper.example.com/"),
    ("example.com/path", "http://example.com/path"),
    ("//slashdot.org/story", "http://slashdot.org/story"),
    ("http://http://example.com/x", "http://example.com/x"),
    # default ports dropped, others kept
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/", "https://example.com/"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # path cleanup
    ("http://a.com//x///y", "http://a.com/x/y"),
    ("http://a.com/b/../c/./d.html", "http://a.com/c/d.html"),
    ("http://a.com/x\\y\\z", "http://a.com/x/y/z"),
    ("http://a.com", "http://a.com/"),
    # fragment stripped, hash-bang kept
    ("http://a.com/p#frag", "http://a.com/p"),
    ("http://a.com/p#!state", "http://a.com/p#!state"),
    # session ids
    ("http://www.b.com/?PHPSESSID=737aec14eb7b360983d4fe39395&p=1",
     "http://www.b.com/?p=1"),
    ("http://www.b.com/p.jhtml;jsessionid=J4QMFWBG1SPRVWCKUUXCJ0W?pp=1",
     "http://www.b.com/p.jhtml?pp=1"),
    ("http://x.com/a.php?s=8af9d6d0d59e8a3108f3bf3f64166f5a&b=2",
     "http://x.com/a.php?b=2"),
    # too-short session value kept (b-(a+x) < 5, Url.cpp:506)
    ("http://x.com/?sessionid=abc", "http://x.com/?sessionid=abc"),
    # && collapsed in query
    ("http://b.com/q?a=1&&b=2&&&c=3", "http://b.com/q?a=1&b=2&c=3"),
    # leading junk stripped
    ("  \t http://a.com/x", "http://a.com/x"),
    # whitespace truncates
    ("https://pypi.python\n\n\t\t\t\t.org/packages/x.tar.gz#md5=8747",
     "https://pypi.python/"),
    # IDN → punycode (Url::unitTests cases)
    ("http://topbeskæring.dk/velkommen",
     "http://xn--topbeskring-g9a.dk/velkommen"),
    ("http://сацминэнерго.рф/robots.txt",
     "http://xn--80agflthakqd0d1e.xn--p1ai/robots.txt"),
    ("http://www.example.com/xn--fooled-you-into-trying-to-decode-this",
     "http://www.example.com/xn--fooled-you-into-trying-to-decode-this"),
    # non-ascii path chars %-encoded upper-hex (fctypes.cpp:1538)
    ("http://a.org.rw/index.php/Category:Officiel_Communiqués",
     "http://a.org.rw/index.php/Category:Officiel_Communiqu%C3%A9s"),
]


@pytest.mark.parametrize("raw,expect", CASES)
def test_canonicalize(raw, expect):
    assert canonicalize(raw) == expect


def test_idempotent():
    # Url::set self-stabilization check (Url.cpp:817-830)
    for raw, expect in CASES:
        once = canonicalize(raw)
        assert canonicalize(once) == once


def test_common_file_strip_only_when_asked():
    u = "http://a.com/dir/index.html"
    assert canonicalize(u) == u
    assert canonicalize(u, strip_common_file=True) == "http://a.com/dir/"
    assert canonicalize("http://a.com/default.aspx",
                        strip_common_file=True) == "http://a.com/"


def test_tld_and_domain():
    assert get_tld("www.example.com") == "com"
    assert get_tld("www.example.co.uk") == "co.uk"
    assert get_domain("www.example.co.uk") == "example.co.uk"
    assert get_domain("a.b.example.com") == "example.com"
    assert get_domain("example.com") == "example.com"
    # pure-alpha unknown label is a TLD per isTLD pcount==0 rule
    assert get_tld("host.weird") == "weird"
    assert get_tld("host.123") == ""


def test_host_path_helpers():
    assert get_host("http://a.b.com:81/x?q=1") == "a.b.com"
    assert get_path_cgi("http://a.b.com/x/y?q=1") == "/x/y?q=1"
    assert get_path_cgi("http://a.b.com/") == "/"


def test_resolve_relative():
    base = "http://a.com/dir/page.html"
    assert resolve_relative(base, "x.html") == "http://a.com/dir/x.html"
    assert resolve_relative(base, "/root.html") == "http://a.com/root.html"
    assert resolve_relative(base, "../up.html") == "http://a.com/up.html"
    assert resolve_relative(base, "//cdn.b.com/x") == "http://cdn.b.com/x"
    assert resolve_relative(base, "http://c.com/y") == "http://c.com/y"
    assert resolve_relative(base, "?q=2") == "http://a.com/dir/page.html?q=2"
    assert resolve_relative(base, "javascript:void(0)") == ""
    assert resolve_relative(base, "mailto:a@b.c") == ""
    https_base = "https://s.com/d/"
    assert resolve_relative(https_base, "//cdn.c.com/z") == \
        "https://cdn.c.com/z"
