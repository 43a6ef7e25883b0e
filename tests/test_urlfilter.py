"""Tests for the URL-filter rule language and default web profile
(Spider.cpp:11577-13510, Collectiondb.cpp:2309-2624)."""

from open_source_search_engine_spark.kernel.urlfilter import (
    DEFAULT_WEB_PROFILE, ERR_NOT_FOUND, ERR_TCP_TIMEDOUT, build_context,
    evaluate, is_media_url, parse_expression,
)


def req(url="http://www.a.com/", hop=1, **kw):
    base = dict(url=url, host=url.split("://")[1].split("/")[0],
                hop_count=hop, added_time=1000, discovery_time=1000,
                is_addurl=False, is_injected=False, is_reindex=False,
                page_num_inlinks=0, same_dom=False, same_host=False,
                parent_is_rss=False, parent_is_sitemap=False)
    base.update(kw)
    return base


def rule_of(request, reply=None, now=2000):
    ctx = build_context(request, reply, now)
    idx = evaluate(DEFAULT_WEB_PROFILE, ctx)
    return DEFAULT_WEB_PROFILE[idx]


def test_parse():
    terms = parse_expression("hopcount==0 && iswww && isnew")
    assert [(t.keyword, t.op, t.value) for t in terms] == [
        ("hopcount", "==", "0"), ("iswww", None, None),
        ("isnew", None, None)]
    assert parse_expression("default") == []
    neg = parse_expression("!ismanualadd && !insitelist")
    assert all(t.negate for t in neg)


def test_media_urls():
    assert is_media_url("http://a.com/x.jpg")
    assert is_media_url("http://a.com/x.JPEG")
    assert is_media_url("http://a.com/s.css?v=2")
    assert not is_media_url("http://a.com/x.html")
    assert not is_media_url("http://a.com/noext")


def test_priority_bands():
    # root www new → 50
    assert rule_of(req("http://www.a.com/", hop=0)).priority == 50
    # root non-www new → 49
    assert rule_of(req("http://a.com/", hop=0)).priority == 49
    # hop1 new → 40
    assert rule_of(req(hop=1)).priority == 40
    # hop2 new → 30; hop3+ new → 20
    assert rule_of(req(hop=2)).priority == 30
    assert rule_of(req(hop=7)).priority == 20
    # media deleted at priority 100
    r = rule_of(req("http://www.a.com/x.png", hop=0))
    assert r.priority == 100 and r.force_delete


def test_reply_changes_band():
    reply = dict(err_code=0, err_count=0, http_status=200,
                 is_indexed=True, spidered_time=1500)
    # not new anymore: hop1 → 39
    assert rule_of(req(hop=1), reply).priority == 39
    assert rule_of(req("http://www.a.com/", hop=0), reply).priority == 48


def test_error_bands():
    tmp = dict(err_code=ERR_TCP_TIMEDOUT, err_count=1, http_status=0,
               is_indexed=False, spidered_time=1500)
    r = rule_of(req(hop=1), tmp)
    assert r.priority == 45 and not r.force_delete
    tmp3 = dict(tmp, err_count=3)
    r3 = rule_of(req(hop=1), tmp3)
    assert r3.priority == 100 and r3.force_delete
    perm = dict(err_code=ERR_NOT_FOUND, err_count=1, http_status=404,
                is_indexed=False, spidered_time=1500)
    rp = rule_of(req(hop=1), perm)
    assert rp.priority == 2 and rp.force_delete


def test_addurl_and_reindex():
    assert rule_of(req(is_addurl=True)).priority == 85
    assert rule_of(req(is_reindex=True)).priority == 80


def test_inlink_promotion():
    assert rule_of(req(hop=5, page_num_inlinks=8)).priority == 52


def test_parent_rss():
    assert rule_of(req(hop=4, parent_is_rss=True)).priority == 45


def test_default_band():
    # hopcount bands cover everything with hop>=0; force a gap via hop=-1?
    # default fires for e.g. hop_count<0 (docid-based)
    r = rule_of(req(hop=-1))
    assert r.priority == 1


def test_first_match_wins_order():
    # isaddurl beats numinlinks/hopcount rules
    r = rule_of(req(hop=0, is_addurl=True, page_num_inlinks=50))
    assert r.priority == 85
