"""Golden tests for robots.txt semantics (XmlDoc.cpp:14817-15004)."""

from open_source_search_engine_spark.kernel.robots import (
    DEFAULT_USER_AGENT, check, final_crawl_delay_ms,
)


def test_missing_or_empty_allows():
    assert check(None, "/x", http_status=404) == (True, -1)
    assert check("", "/x") == (True, -1)
    assert check("User-agent: *\nDisallow: /", "/x",
                 http_status=500) == (True, -1)


def test_star_group_prefix_disallow():
    r = "User-agent: *\nDisallow: /cgi-bin/\n"
    assert not check(r, "/cgi-bin/x").allowed
    assert not check(r, "/cgi-bin/").allowed
    assert check(r, "/cgi-binx").allowed  # trailing-/ boundary
    assert check(r, "/other").allowed


def test_plain_prefix_substring_disallow():
    # "just do the substring match" (XmlDoc.cpp:14966-14975)
    r = "User-agent: *\nDisallow: /priv\n"
    assert not check(r, "/priv").allowed          # exact
    assert not check(r, "/private/x").allowed     # prefix
    assert check(r, "/pri").allowed               # shorter than value


def test_case_insensitive_match():
    r = "User-agent: *\nDisallow: /Private\n"
    assert not check(r, "/private/x").allowed
    assert not check(r, "/PRIVATE").allowed


def test_allow_lines_do_not_whitelist():
    r = "User-agent: *\nDisallow: /a/\nAllow: /a/ok\n"
    assert not check(r, "/a/ok").allowed


def test_empty_disallow_is_noop():
    r = "User-agent: *\nDisallow:\n"
    assert check(r, "/anything").allowed


def test_specific_ua_substring_match():
    # left-anchored case-insensitive substring (XmlDoc.cpp:15253 comment)
    r = "User-agent: gigablast\nDisallow: /only\n"
    assert not check(r, "/only/x", user_agent=DEFAULT_USER_AGENT).allowed
    # shorter group name than UA also matches (min-length compare)
    r2 = "User-agent: giga\nDisallow: /only\n"
    assert not check(r2, "/only/x").allowed
    # non-matching group falls back to * (absent → allowed)
    r3 = "User-agent: googlebot\nDisallow: /\n"
    assert check(r3, "/x").allowed


def test_specific_group_shadows_star():
    r = ("User-agent: GigablastOpenSource\nDisallow: /g\n"
         "User-agent: *\nDisallow: /\n")
    v = check(r, "/other")
    assert v.allowed          # our group allows /other; * not consulted
    assert not check(r, "/g/x").allowed


def test_empty_specific_group_falls_back_to_star():
    # wikihow case (XmlDoc.cpp:15273-15277): UA group with only crawl-delay
    r = ("User-agent: giga\nCrawl-delay: 10\n"
         "User-agent: *\nDisallow: /x\n")
    v = check(r, "/x/y")
    assert not v.allowed
    # but the specific group's crawl-delay survives (savedCrawlDelay)
    assert v.crawl_delay_ms == 10_000


def test_crawl_delay_parsing():
    assert check("User-agent: *\nCrawl-delay: 2.5\nDisallow: /z\n",
                 "/a").crawl_delay_ms == 2500
    assert check("User-agent: *\nCrawl-delay: .5\nDisallow: /z\n",
                 "/a").crawl_delay_ms == 500
    # garbage value ignored (must start with digit or '.')
    assert check("User-agent: *\nCrawl-delay: fast\nDisallow: /z\n",
                 "/a").crawl_delay_ms == -1


def test_comments_stripped():
    r = "# header\nUser-agent: * # everyone\nDisallow: /a\n"
    assert not check(r, "/a/b").allowed


def test_value_stops_at_whitespace():
    r = "User-agent: *\nDisallow: /a stuff-after-space\n"
    assert not check(r, "/a/b").allowed


def test_final_crawl_delay():
    assert final_crawl_delay_ms(-1) == 250   # default (XmlDoc.cpp:15003)
    assert final_crawl_delay_ms(0) == 0
    assert final_crawl_delay_ms(2500) == 2500
    assert final_crawl_delay_ms(10**9) == 60_000  # Spider.cpp:6020 cap
