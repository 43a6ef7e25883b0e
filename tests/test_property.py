"""Property-based tests (hypothesis) for the parity kernels — the
reference has no randomized testing (SURVEY §5.5); these pin the
stability invariants the crawl depends on."""

from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_search_engine_spark.kernel import (
    extract, gbhash, robots, urlnorm,
)

# printable-ish url-ish strings incl. unicode, control chars, separators
url_text = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
    min_size=0, max_size=120)


@settings(max_examples=300, deadline=None)
@given(url_text)
def test_canonicalize_never_crashes_and_is_idempotent(raw):
    out = urlnorm.canonicalize(raw)
    assert isinstance(out, str)
    # Url::set self-stabilization (Url.cpp:817-830)
    assert urlnorm.canonicalize(out) == out
    if out:
        assert out.split("://")[0] in ("http", "https", "ftp") or \
            "://" in out


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_hash64_batch_matches_scalar(data):
    batch = gbhash.hash64_batch([data])
    assert int(batch[0]) == gbhash.hash64(data)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400), st.text(max_size=60))
def test_robots_never_crashes(body, path):
    v = robots.check(body, "/" + path.replace("\x00", ""))
    assert isinstance(v.allowed, bool)
    assert v.crawl_delay_ms >= -1


@settings(max_examples=150, deadline=None)
@given(st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
    max_size=500))
def test_tokenizer_covers_input_exactly(html):
    """Tokenizer invariant: nodes tile the input with no gaps/overlaps."""
    nodes = extract.tokenize(html)
    pos = 0
    for nd in nodes:
        assert nd.start == pos
        assert nd.end > nd.start
        pos = nd.end
    # the only permissible shortfall is the trailing-empty-node trim
    assert pos == len(html) or pos == len(html)


@settings(max_examples=150, deadline=None)
@given(st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
    max_size=500))
def test_get_text_never_crashes_no_trailing_ws(html):
    out = extract.get_text(html)
    assert not out or out[-1] not in " \t\n\v\f\r"


@settings(max_examples=100, deadline=None)
@given(url_text, url_text)
def test_extract_links_never_crashes(html, base):
    links = extract.extract_links(html, "http://h.com/" + base[:40])
    for ln in links:
        assert ln.url == "" or "://" in ln.url
