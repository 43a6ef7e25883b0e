"""Deterministic synthetic web — the simulated crawl corpus.

Generates the FIXTURES.md tables: ``pages(url, warc_ts, html, text, lang)``,
``hostmeta(host, first_ip, robots_txt, robots_status)``, and ``seeds``.
Everything is a pure function of (n_hosts, seed) so tests, the oracle and
the Spark pipeline all see byte-identical inputs.

Design intent mirrors the reference's QA harness (qa.cpp qaspider1/2 crawl a
small controlled site): pages exercise the tag table (invisible SCRIPT/
STYLE/SELECT/MARQUEE, breaking vs non-breaking tags, CDATA link bodies,
entities, rel=nofollow, javascript+onclick links, base href, relative
links, ../ paths, session-id params) and hosts exercise robots variety +
IP-sharing for politeness skew (one hot "mega IP").

``pages.text`` is the byte-identical extraction golden: it is defined as
``kernel.extract.get_text(html)`` — the Spark UDF must reproduce it exactly
(tests/test_spark_udfs.py asserts equality on every page).
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timezone

import numpy as np
import pandas as pd

from ..kernel import extract

# fixed epoch so runs are bit-reproducible (no wall clock anywhere)
T0_MS = 1_600_000_000_000  # 2020-09-13T12:26:40Z


def _rng(seed: int, *salts) -> np.random.Generator:
    h = hashlib.sha256(("|".join([str(seed)] + [str(s) for s in salts])
                        ).encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))


ROBOTS_TEMPLATES = [
    None,  # 404 → fully allowed
    "",    # empty → allowed
    "User-agent: *\nDisallow: /private/\n",
    "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n",
    ("User-agent: GigablastOpenSource\nDisallow: /gb-only/\n"
     "Crawl-delay: 0.5\n\nUser-agent: *\nDisallow: /\n"),
    "# all welcome\nUser-agent: *\nDisallow:\n",
    ("User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
     "Crawl-delay: 1\n"),
    "User-agent: other-bot\nDisallow: /\n",  # not us → allowed
]


def make_hostmeta(n_hosts: int, seed: int = 42) -> pd.DataFrame:
    """Hosts host000.com..; ~4 hosts share each IP; hosts 0-4 share one hot
    IP (the skew axis the reference handles via one-host-per-IP,
    Spider.cpp:6171)."""
    rows = []
    for i in range(n_hosts):
        host = f"www.host{i:03d}.com" if i % 3 == 0 else f"host{i:03d}.com"
        if i < 5:
            ip = 0x0A000101  # hot IP 10.0.1.1
        else:
            # one /24 per IP so parent C-block inlink counting
            # (Spider.cpp:4290) sees distinct blocks
            ip = 0x0A000001 + ((2 + (i - 5) // 4) << 8)
        tmpl = ROBOTS_TEMPLATES[i % len(ROBOTS_TEMPLATES)]
        rows.append({
            "host": host,
            "first_ip": ip,
            "robots_txt": "" if tmpl is None else tmpl,
            "robots_status": 404 if tmpl is None else 200,
            # tagdb siteNumInlinks analog (F4) — deterministic per host
            "site_num_inlinks": (i * 7 + 3) % 50,
            # tagdb ingoogle site tag (Spider.cpp:12182-12205, set from
            # the TagRec): some sites tagged in (True), some tagged out
            # (False), some with NO tag at all (None → the valid bit is
            # off and ingoogle rules are SKIPPED for them)
            "in_google": (True if i % 5 == 0
                          else None if i % 5 == 1 else False),
        })
    df = pd.DataFrame(rows)
    df["in_google"] = df["in_google"].astype("boolean")
    return df


_PAGE_TEMPLATE = """<html><head><title>{title}</title>
<script>var t = "</div>"; track({pid});</script>
<style>.m {{ color: red }}</style>
{basetag}</head>
<body>
<h1>Page {pid} of {host} &amp; friends</h1>
<p>Lorem ipsum {words} dolor sit amet, consectetur «adipiscing» elit.</p>
<select><option>one<option>two</select>
<marquee>invisible scrolling text {pid}</marquee>
<!-- comment node -->
{contact}{links}
<p>Tail paragraph with entity &copy; {pid}.</p>
</body></html>"""


def _page_links(host: str, pid: int, n_pages: int, hosts: list[str],
                host_sizes: list[int],
                rng: np.random.Generator) -> list[str]:
    out = []
    # intra-host ring + skip links (relative)
    out.append(f'<a href="p{(pid + 1) % n_pages}.html">next</a>')
    if n_pages > 2:
        out.append(f'<a href="/p{(pid * 7 + 3) % n_pages}.html">skip</a>')
    # occasional deeper path with ../
    if pid % 5 == 1:
        out.append(f'<a href="sub/../p{(pid + 2) % n_pages}.html">up</a>')
    # cross-host links (deterministic targets within the target's pages)
    k = int(rng.integers(1, 4))
    for j in range(k):
        ti = int(rng.integers(0, len(hosts)))
        t = hosts[ti]
        tp = int(rng.integers(0, host_sizes[ti]))
        out.append(f'<a href="http://{t}/p{tp}.html">x{j}</a>')
    # root links (hop-0 targets)
    if pid % 4 == 0:
        t = hosts[int(rng.integers(0, len(hosts)))]
        out.append(f'<a href="http://{t}/">root</a>')
    # filter-exercising links
    if pid % 6 == 0:
        out.append('<a rel="nofollow" href="/nofollow-target.html">nf</a>')
    if pid % 7 == 0:
        out.append(f'<a href="/img{pid}.jpg">media</a>')
    if pid % 8 == 0:
        out.append(
            f'<a href="/p{(pid + 3) % n_pages}.html'
            f'?PHPSESSID=737aec14eb7b360983d4fe39395&ref={pid}">sess</a>')
    if pid % 9 == 0:
        out.append('<a href="javascript:void(0)" '
                   'onclick="open(\'/onclick.html\',\'w\')">oc</a>')
    if pid % 10 == 0:
        out.append('<a href="mailto:a@b.com">mail</a><a href="#top">top</a>')
    if pid % 11 == 0:
        out.append('<a href="/private/secret.html">priv</a>')
    # permalink-shaped path (isPermalinky: 3+ digits / 2+ hyphens in a
    # component, Url.cpp:2236) and rss-ext feed (Url.cpp:2268)
    if pid % 9 == 2:
        out.append(f'<a href="/2020/0{pid % 9}/long-story-{pid}-part-2.html"'
                   f'>perma</a>')
    if pid % 10 == 3:
        out.append(f'<a href="/feed{pid}.xml">feed</a>')
    return out


LANGS = ["en", "de", "fr", "es", "it"]


def make_pages(hostmeta: pd.DataFrame, mean_pages: int = 10,
               seed: int = 42) -> pd.DataFrame:
    """Zipfian pages-per-host; every host has a root page '/' linking to its
    first few pages."""
    hosts = hostmeta["host"].tolist()
    host_sizes = [max(3, int(mean_pages * 5 / (1 + hi % 17)))
                  for hi in range(len(hosts))]
    rows = []
    for hi, host in enumerate(hosts):
        rng = _rng(seed, "host", host)
        # zipf-ish page count: host rank drives size
        n_pages = host_sizes[hi]
        lang = LANGS[hi % len(LANGS)]
        # root page
        root_links = [f'<a href="/p{j}.html">p{j}</a>'
                      for j in range(min(n_pages, 8))]
        if hi % 2 == 0:
            other = hosts[(hi * 13 + 7) % len(hosts)]
            root_links.append(f'<a href="http://{other}/">peer</a>')
        pages = [("/", root_links)]
        for pid in range(n_pages):
            pages.append((f"/p{pid}.html",
                          _page_links(host, pid, n_pages, hosts,
                                      host_sizes, rng)))
        for path, links in pages:
            pid = 0 if path == "/" else int(path[2:-5]) + 1
            basetag = ""
            if pid % 13 == 5:
                basetag = f'<base href="http://{host}/deep/">\n'
            # deterministic contact-info / street-address snippets so the
            # hascontactinfo/hasaddress rule keywords (kernel/contact.py)
            # see both truth values in every corpus
            contact = ""
            if pid % 3 == 0:
                contact = (f"<p>Contact us: info@{host} or call "
                           f"(555) 123-4567.</p>\n")
            elif pid % 4 == 1:
                contact = (f"<p>Visit {100 + pid} Evergreen Street, "
                           f"Springfield.</p>\n")
            html = _PAGE_TEMPLATE.format(
                title=f"{host}{path}",
                pid=pid,
                host=host,
                words=" ".join(f"w{(pid * 31 + k) % 97}" for k in range(12)),
                links="\n".join(links),
                basetag=basetag,
                contact=contact,
            )
            url = f"http://{host}{path}"
            ts = T0_MS - 86_400_000 + (hi * 1000 + pid) * 1000
            rows.append({
                "url": url,
                "warc_ts": datetime.fromtimestamp(ts / 1000.0,
                                                  tz=timezone.utc),
                "html": html.encode("utf-8"),
                "text": extract.get_text(html),
                "lang": lang,
            })
    return pd.DataFrame(rows)


def make_seeds(hostmeta: pd.DataFrame, n_seeds: int = 5,
               seed: int = 42) -> pd.DataFrame:
    hosts = hostmeta["host"].tolist()
    picks = [hosts[(i * 7) % len(hosts)] for i in range(n_seeds)]
    return pd.DataFrame({
        "url": [f"http://{h}/" for h in dict.fromkeys(picks)],
        "added_time_ms": T0_MS,
    })


def write_corpus(out_dir: str, n_hosts: int = 8, mean_pages: int = 10,
                 n_seeds: int = 5, seed: int = 42) -> dict[str, str]:
    """Write pages/hostmeta/seeds parquet; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    hm = make_hostmeta(n_hosts, seed)
    pages = make_pages(hm, mean_pages, seed)
    seeds = make_seeds(hm, n_seeds, seed)
    paths = {}
    for name, df in [("hostmeta", hm), ("pages", pages), ("seeds", seeds)]:
        p = os.path.join(out_dir, f"{name}.parquet")
        # microsecond timestamps: Spark cannot read parquet NANOS
        df.to_parquet(p, index=False, coerce_timestamps="us",
                      allow_truncated_timestamps=True)
        paths[name] = p
    return paths
