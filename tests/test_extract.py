"""Golden tests for tokenizer / getText / link extraction
(Xml.cpp:231-843, XmlNode.cpp, Linkdb.cpp:4980-5372)."""

from open_source_search_engine_spark.kernel.extract import (
    dedup_links, extract_links, get_attr, get_text, html_decode, tokenize,
)


def test_tokenize_basic():
    nodes = tokenize("<p>hello <b>world</b></p>")
    kinds = [(n.kind, n.name, n.is_front) for n in nodes]
    assert kinds == [
        ("tag", "p", True), ("text", "", True), ("tag", "b", True),
        ("text", "", True), ("tag", "b", False), ("tag", "p", False),
    ]


def test_script_body_is_single_invisible_node():
    html = '<script>var s = "</div>"; stuff\n</script>after'
    nodes = tokenize(html)
    kinds = [n.kind for n in nodes]
    assert kinds == ["tag", "scripttext", "tag", "text"]
    # quote-aware: the "</div>" inside quotes did not end the script
    body = html[nodes[1].start: nodes[1].end]
    assert "</div>" in body


def test_script_end_in_line_comment_still_ends():
    # '//' comments do NOT shield </script (Xml.cpp:625-628: comment1 only
    # clears the escape flag, it does not skip the end-tag check)
    html = "<script>var x = 1; // </script>after"
    nodes = tokenize(html)
    assert [n.kind for n in nodes] == ["tag", "scripttext", "tag", "text"]
    assert html[nodes[3].start: nodes[3].end] == "after"


def test_script_end_inside_quotes_ignored():
    html = '<script>x("</script>")</script>rest'
    nodes = tokenize(html)
    # the quoted </script> is skipped (version>120 rules, Xml.cpp:585-588)
    body = html[nodes[1].start: nodes[1].end]
    assert body == 'x("</script>")'


def test_get_text_breaking_and_invisible():
    # every breaking tag (front or back) emits "\n\n" once buf non-empty
    assert get_text("<p>a</p><p>b</p>") == "a\n\n\n\nb"
    assert get_text("a<br>b") == "a\n\nb"
    assert get_text("a <b>bold</b> c") == "a bold c"  # b non-breaking
    # leading tags emit nothing until buffer non-empty (Xml.cpp:731)
    assert get_text("<div><p>x</p></div>") == "x"
    # invisible subtree suppressed, but its breaking tags still emit \n\n
    assert get_text("a<script>hidden()</script>b") == "a\n\n\n\nb"
    assert get_text("a<style>.c{}</style>b") == "a\n\n\n\nb"
    assert get_text("a<select><option>x</select>b") == "a\n\n\n\n\n\nb"
    assert get_text("<marquee>junk</marquee>stuff") == "stuff"


def test_get_text_entities_not_decoded_and_trailing_strip():
    assert get_text("x &amp; y") == "x &amp; y"
    assert get_text("word   \n\t ") == "word"
    assert get_text("a<br>b") == "a\n\nb"


def test_get_text_comment_is_breaking():
    assert get_text("a<!-- hidden -->b") == "a\n\nb"
    # <![if ...]> form is non-breaking (setCommentNode2)
    assert get_text("a<![if gt IE 6]>b") == "ab"


def test_attr_parser():
    assert get_attr('<a href="x.html">', "href") == "x.html"
    assert get_attr("<a href='x.html'>", "href") == "x.html"
    assert get_attr("<a href=x.html>", "href") == "x.html"
    # reference quirk: only an *alnum* before the name blocks a match, so
    # data-href matches href (XmlNode.cpp:552)
    assert get_attr('<a data-href="no" href="yes">', "href") == "no"
    assert get_attr('<a xhref="no" href="yes">', "href") == "yes"
    assert get_attr('<a HREF="x">', "href") == "x"
    assert get_attr('<a rel = "nofollow" >', "rel") == "nofollow"
    assert get_attr('<a name="z">', "href") is None


def test_html_decode():
    assert html_decode("a&amp;b&lt;c&gt;") == "a&b<c>"
    assert html_decode("&#65;&#x42;") == "AB"
    assert html_decode("&bogus;stays") == "&bogus;stays"


BASE = "http://base.com/dir/page.html"


def links(html):
    return dedup_links(extract_links(html, BASE))


def test_link_relative_resolution():
    ls = links('<a href="x.html">x</a><a href="/root">r</a>')
    assert [l.url for l in ls] == [
        "http://base.com/dir/x.html", "http://base.com/root"]


def test_base_href_overrides():
    ls = links('<base href="http://other.com/sub/"><a href="y.html">y</a>')
    assert ls[0].url == "http://other.com/sub/y.html"


def test_nofollow_flagged_not_dropped():
    ls = links('<a rel="nofollow" href="/nf">x</a>')
    assert ls[0].nofollow is True


def test_javascript_and_mailto_and_fragment_skipped():
    assert links('<a href="javascript:void(0)">j</a>') == []
    assert links('<a href="mailto:a@b.com">m</a>') == []
    assert links('<a href="#top">t</a>') == []


def test_onclick_popup_salvage():
    ls = links("""<a href="javascript:po()" onclick="w('/pop.html','x')">p</a>""")
    assert [l.url for l in ls] == ["http://base.com/pop.html"]


def test_bad_protocol_skipped():
    assert links('<a href="callto:+123456">c</a>') == []
    assert links('<a href="ftp://f.com/x">f</a>') == []


def test_common_file_stripped_in_links():
    ls = links('<a href="/sub/index.html">i</a>')
    assert ls[0].url == "http://base.com/sub/"


def test_session_id_stripped_in_links():
    ls = links('<a href="/p?PHPSESSID=737aec14eb7b360983d4fe39395&q=1">s</a>')
    assert ls[0].url == "http://base.com/p?q=1"


def test_entity_decoded_links():
    ls = links('<a href="/p?a=1&amp;b=2">e</a>')
    assert ls[0].url == "http://base.com/p?a=1&b=2"


def test_space_fixup():
    ls = links('<a href="/a b/c?q=x y">s</a>')
    assert ls[0].url == "http://base.com/a%20b/c?q=x+y"


def test_link_tag_body_and_rss():
    ls = links('<link rel="alternate" type="application/rss+xml" '
               'href="/feed.xml">')
    assert ls[0].is_rss and ls[0].tag == "link"
    ls2 = links("<link>http://feed.com/rss</link>")
    assert ls2[0].url == "http://feed.com/rss"
    ls3 = links("<link><![CDATA[http://feed.com/rss2]]></link>")
    assert ls3[0].url == "http://feed.com/rss2"


def test_area_and_loc_tags():
    ls = links('<area href="/map1"><loc>http://s.com/page</loc>')
    assert {l.url for l in ls} == {"http://base.com/map1",
                                   "http://s.com/page"}


def test_per_page_dedup():
    ls = links('<a href="/x">1</a><a href="/x">2</a>')
    assert len(ls) == 1


def test_no_tld_host_dropped():
    assert links('<a href="http://localhost123/x">l</a>') == []
    ls = links('<a href="http://127.0.0.1/x">ip</a>')
    assert ls[0].url == "http://127.0.0.1/x"
