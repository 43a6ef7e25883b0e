"""Straight-line Python oracle crawler — the crawl-order/URL-seen golden.

Implements the batch-round restatement of the reference scheduling loop
(SURVEY §3.1) with dict state.  The Spark pipeline (plans/scheduler.py) must
reproduce its (round, seq, url) schedule and final url_seen set exactly —
that IS the parity gate of the north rule.

Round semantics (shared spec — both implementations follow this literally):

each round r has now_ms = t0 + r*round_ms; then
1. latest reply per uh48 = max spidered_time_ms        (Spider.cpp:3993-4004)
2. collapse duplicate requests per uh48: min (hop_count, added_time_ms);
   OR the is_addurl/parent flags                       (dedupSpiderdbList,
                                                        Spider.cpp:13582)
3. url-filter: first matching rule → priority/freq/ipwait/harvest/delete;
   drop force_delete rows                              (getUrlFilterNum)
4. robots: disallowed urls are dropped (never fetched); crawl_delay =
   robots delay, default 250ms, cap 60s                (XmlDoc isAllowed2)
5. spider_time_ms = max(added_time_ms,
                        last_ip_download + ip_wait_ms,
                        last_ip_download + crawl_delay_ms,
                        last_spidered_ms + freq_days*86400e3)
                                                       (getSpiderTimeMS,
                                                        Spider.cpp:5978)
6. due := spider_time_ms <= now_ms; per-IP winners = top-K ordered by
   (priority desc, hop_count asc, spider_time_ms asc, uh48 asc)
                                                       (makeWinnerTreeKey +
                                                        tie chain
                                                        Spider.cpp:4864-4902)
7. per-IP spacing: j-th winner of an IP gets fetch_time = now_ms +
   j*eff_delay, eff_delay = max(ip_wait_ms, crawl_delay_ms); rows whose
   fetch_time >= now_ms+round_ms wait for a later round (batch analog of
   the hammer queue, Msg13.cpp:3070)
8. global order: (priority desc, fetch_time asc, uh48 asc) limit budget →
   the round's crawl order                             (doledb priority
                                                        scan Spider.cpp:6758)
9. fetch = lookup in pages: hit → reply(http 200, indexed); miss → reply
   (err ERR_NOT_FOUND, err_count+1)
10. harvest outlinks (nofollow/self skipped, unknown hosts skipped =
    failed-DNS analog), hop+1, dedup against url_seen  (XmlDoc.cpp:27415)
11. update per-IP last_download = max fetch_time; append replies; commit
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from ..kernel import extract, gbhash, robots, urlfilter, urlnorm


@dataclass
class CrawlConfig:
    round_ms: int = 600_000          # 10 min simulated rounds
    budget: int = 300                # MAX_SPIDERS analog (Spider.h:1502)
    winner_k: int = 2000             # MAX_WINNER_NODES (Spider.cpp:61)
    user_agent: str = robots.DEFAULT_USER_AGENT
    rules: tuple = urlfilter.DEFAULT_WEB_PROFILE
    rounds: int = 5
    t0_ms: int = 1_600_000_000_000
    use_bloom: bool = False  # C5 pre-filter routing (parity-neutral)


@dataclass
class Request:
    url: str
    uh48: int
    first_ip: int
    host: str
    hop_count: int
    added_time_ms: int
    discovery_time_ms: int
    is_addurl: bool = False
    is_injected: bool = False
    is_reindex: bool = False
    same_dom: bool = False
    same_host: bool = False
    parent_is_rss: bool = False
    parent_is_sitemap: bool = False
    page_num_inlinks: int = 0


@dataclass
class Reply:
    uh48: int
    first_ip: int
    spidered_time_ms: int
    err_code: int
    err_count: int
    http_status: int
    is_indexed: bool
    lang: str = ""


@dataclass
class OracleState:
    requests: list = field(default_factory=list)
    replies: list = field(default_factory=list)
    ip_last_download_ms: dict = field(default_factory=dict)
    url_seen: dict = field(default_factory=dict)  # uh48 → first_seen_round
    schedule: list = field(default_factory=list)  # (round, seq, url, ...)
    metrics: list = field(default_factory=list)
    # F3: uh48 → set of parent C-blocks (ip>>8), capped at 20 at eval time
    # (Spider.cpp:4290-4332)
    inlink_cblocks: dict = field(default_factory=dict)


class OracleCrawler:
    def __init__(self, pages: pd.DataFrame, hostmeta: pd.DataFrame,
                 seeds: pd.DataFrame, cfg: CrawlConfig | None = None):
        self.cfg = cfg or CrawlConfig()
        self.pages = {r.url: r for r in pages.itertuples()}
        self.hostmeta = {r.host: r for r in hostmeta.itertuples()}
        self.state = OracleState()
        self._robots_cache: dict[str, tuple[str, int]] = {}
        for r in seeds.itertuples():
            self.add_request(r.url, hop=0, added_ms=int(r.added_time_ms),
                             rnd=0, is_addurl=True)

    # ------------------------------------------------------------------
    def add_request(self, raw_url: str, hop: int, added_ms: int, rnd: int,
                    is_addurl: bool = False, parent_host: str = "",
                    parent_domain: str = "") -> bool:
        url = urlnorm.canonicalize(raw_url)
        if not url:
            return False
        host = urlnorm.get_host(url)
        hm = self.hostmeta.get(host)
        if hm is None:
            return False  # DNS-failure analog: unknown host skipped
        h = gbhash.uh48(url)
        if h in self.state.url_seen:
            return False  # url-seen dedup (C1/C5)
        self.state.url_seen[h] = rnd
        dom = urlnorm.get_domain(host)
        self.state.requests.append(Request(
            url=url, uh48=h, first_ip=int(hm.first_ip), host=host,
            hop_count=hop, added_time_ms=added_ms,
            discovery_time_ms=added_ms, is_addurl=is_addurl,
            same_host=(host == parent_host),
            same_dom=(dom != "" and dom == parent_domain),
        ))
        return True

    def _robots(self, host: str) -> tuple[str, int]:
        hm = self.hostmeta[host]
        return hm.robots_txt, int(hm.robots_status)

    # ------------------------------------------------------------------
    def run_round(self, rnd: int) -> int:
        cfg = self.cfg
        now_ms = cfg.t0_ms + rnd * cfg.round_ms
        # 1. latest reply per uh48
        latest: dict[int, Reply] = {}
        for rep in self.state.replies:
            cur = latest.get(rep.uh48)
            if cur is None or rep.spidered_time_ms > cur.spidered_time_ms:
                latest[rep.uh48] = rep
        # 2. dedup requests per uh48
        by_uh: dict[int, Request] = {}
        for rq in self.state.requests:
            cur = by_uh.get(rq.uh48)
            if cur is None or (rq.hop_count, rq.added_time_ms) < \
                    (cur.hop_count, cur.added_time_ms):
                if cur is not None:
                    rq.is_addurl = rq.is_addurl or cur.is_addurl
                by_uh[rq.uh48] = rq
            elif cur is not None:
                cur.is_addurl = cur.is_addurl or rq.is_addurl
        # 3-6. evaluate + politeness + due + winners per IP
        per_ip: dict[int, list] = {}
        for rq in by_uh.values():
            # B1 corruption filter: reject far-future added times
            # (Spider.cpp:4495-4512)
            if rq.added_time_ms > now_ms + 86_400_000:
                continue
            rep = latest.get(rq.uh48)
            ctx = urlfilter.build_context(
                dict(url=rq.url, host=rq.host, hop_count=rq.hop_count,
                     added_time=rq.added_time_ms // 1000,
                     discovery_time=rq.discovery_time_ms // 1000,
                     is_addurl=rq.is_addurl, is_injected=rq.is_injected,
                     is_reindex=rq.is_reindex, same_dom=rq.same_dom,
                     same_host=rq.same_host,
                     parent_is_rss=rq.parent_is_rss,
                     parent_is_sitemap=rq.parent_is_sitemap,
                     page_num_inlinks=min(
                         20, len(self.state.inlink_cblocks.get(rq.uh48,
                                                               ()))),
                     tld=urlnorm.get_tld(rq.host)),
                None if rep is None else dict(
                    err_code=rep.err_code, err_count=rep.err_count,
                    http_status=rep.http_status, is_indexed=rep.is_indexed,
                    spidered_time=rep.spidered_time_ms // 1000),
                now_ms // 1000)
            idx = urlfilter.evaluate(cfg.rules, ctx)
            rule = cfg.rules[idx]
            if rule.force_delete or rule.max_spiders == 0:
                continue
            # 4. robots
            txt, status = self._robots(rq.host)
            verdict = robots.check(txt, urlnorm.get_path_cgi(rq.url),
                                   cfg.user_agent, status)
            if not verdict.allowed:
                continue
            cd_ms = robots.final_crawl_delay_ms(verdict.crawl_delay_ms)
            # 5. spider time
            last_dl = self.state.ip_last_download_ms.get(rq.first_ip, 0)
            st = rq.added_time_ms
            if not (rep is None and (rq.is_injected or rq.is_reindex)):
                st = max(st, last_dl + rule.ip_wait_ms, last_dl + cd_ms)
                if rep is not None and rep.spidered_time_ms > 0:
                    wait_ms = int(rule.spider_freq_days * 86400.0 * 1000)
                    st = max(st, rep.spidered_time_ms + wait_ms)
            if st > now_ms:
                continue  # not due
            per_ip.setdefault(rq.first_ip, []).append(
                (rule.priority, rq.hop_count, st, rq.uh48, rq, rule, cd_ms))
        # 6-7. winners + spacing
        candidates = []
        for ip, rows in per_ip.items():
            rows.sort(key=lambda t: (-t[0], t[1], t[2], t[3]))
            rows = rows[: cfg.winner_k]
            t = now_ms
            for (pri, hop, st, uh, rq, rule, cd_ms) in rows:
                eff = max(rule.ip_wait_ms, cd_ms)
                if t >= now_ms + cfg.round_ms:
                    break
                candidates.append((pri, t, uh, rq, rule, cd_ms))
                t += eff
        # 8. global order + budget
        candidates.sort(key=lambda c: (-c[0], c[1], c[2]))
        scheduled = candidates[: cfg.budget]
        # 9-11. fetch + harvest + state updates
        n_ok = n_err = n_new = 0
        ip_max_fetch: dict[int, int] = {}
        for seq, (pri, ftime, uh, rq, rule, cd_ms) in enumerate(scheduled):
            self.state.schedule.append(dict(
                round=rnd, seq=seq, url=rq.url, uh48=uh,
                first_ip=rq.first_ip, priority=pri,
                hop_count=rq.hop_count, fetch_time_ms=ftime))
            page = self.pages.get(rq.url)
            prev = latest.get(uh)
            prev_errs = prev.err_count if prev is not None else 0
            if page is None:
                n_err += 1
                self.state.replies.append(Reply(
                    uh48=uh, first_ip=rq.first_ip, spidered_time_ms=ftime,
                    err_code=urlfilter.ERR_NOT_FOUND,
                    err_count=prev_errs + 1, http_status=404,
                    is_indexed=False))
            else:
                n_ok += 1
                self.state.replies.append(Reply(
                    uh48=uh, first_ip=rq.first_ip, spidered_time_ms=ftime,
                    err_code=0, err_count=0, http_status=200,
                    is_indexed=True, lang=page.lang))
                if rule.harvest_links:
                    html = page.html.decode("utf-8") \
                        if isinstance(page.html, (bytes, bytearray)) \
                        else page.html
                    links = extract.dedup_links(
                        extract.extract_links(html, rq.url))
                    pdom = urlnorm.get_domain(rq.host)
                    for ln in links:
                        if ln.nofollow:
                            continue
                        luh = gbhash.uh48(ln.url)
                        if luh == uh:
                            continue  # self link
                        # F3: record parent C-block for every surviving
                        # link (known hosts only — DNS-fail analog), even
                        # when the url was already seen
                        lhost = urlnorm.get_host(ln.url)
                        if lhost in self.hostmeta:
                            self.state.inlink_cblocks.setdefault(
                                luh, set()).add(rq.first_ip >> 8)
                        if self.add_request(
                                ln.url, hop=rq.hop_count + 1,
                                added_ms=ftime, rnd=rnd,
                                parent_host=rq.host, parent_domain=pdom):
                            n_new += 1
            ip_max_fetch[rq.first_ip] = max(
                ip_max_fetch.get(rq.first_ip, 0), ftime)
        for ip, t in ip_max_fetch.items():
            self.state.ip_last_download_ms[ip] = t
        self.state.metrics.append(dict(
            round=rnd, scheduled=len(scheduled), fetched_ok=n_ok,
            fetch_errors=n_err, new_urls=n_new,
            frontier_size=len(self.state.requests),
            seen_size=len(self.state.url_seen)))
        return len(scheduled)

    def run(self, rounds: int | None = None) -> OracleState:
        for r in range(rounds if rounds is not None else self.cfg.rounds):
            self.run_round(r)
        return self.state
