"""robots.txt allow/deny + crawl-delay with the reference's exact semantics.

Reference: XmlDoc.cpp:14817-14981 (isAllowed2), XmlDoc.cpp:15244-15296
(two-pass UA matching), XmlDoc.cpp:14985-15004 (getFinalCrawlDelay),
Mime.cpp:34-95 (line parser).  Key quirks reproduced:

- line parse: field starts at first alnum; ``#`` starts a comment line;
  lines without ``:`` ignored; value trimmed of leading space/tab only
- UA match pass 1: **left-anchored case-insensitive substring** (either
  direction — compare min(len) chars) against the configured agent
- UA match pass 2 (only if pass 1 found no group or the group had no
  allow/disallow lines): **exact** match against ``*``
- a crawl-delay found in pass 1 survives pass 2 (savedCrawlDelay logic)
- ``Allow:`` lines do NOT whitelist — they only mark the group non-empty
- ``Disallow:`` is a case-insensitive **prefix** match on path+query; value
  stops at first whitespace; empty value is a no-op; a value not starting
  with ``/`` is matched against the path minus its leading ``/``
- consecutive ``User-agent`` lines after a match are ignored until the group
  has seen a rule line (flag semantics), then a new UA line re-dispatches
- ``Crawl-delay: <float>`` seconds → ms, clamped to [0, 2^31-1], only
  honoured if the value starts with a digit or ``.``
- missing robots (HTTP != 200) or empty file ⇒ fully allowed, delay -1
- final crawl-delay defaults to 250 ms when unspecified; the scheduler caps
  at 60 s (Spider.cpp:6020)
"""

from __future__ import annotations

from typing import NamedTuple

DEFAULT_USER_AGENT = "GigablastOpenSource/1.0"  # Parms.cpp:10087
DEFAULT_CRAWL_DELAY_MS = 250  # XmlDoc.cpp:15003
MAX_CRAWL_DELAY_MS = 60_000  # Spider.cpp:6020 cap

_SPACE = " \t\n\v\f\r"


class RobotsVerdict(NamedTuple):
    allowed: bool
    crawl_delay_ms: int  # -1 = unspecified


def _parse_lines(text: str):
    """Mime::getLine behaviour: yield (field_lower, value) tuples."""
    out = []
    for rawline in text.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        # skip leading non-alnum (Mime.cpp:47); '#' → comment line
        i = 0
        n = len(rawline)
        while i < n and not rawline[i].isalnum():
            if rawline[i] == "#":
                i = n
                break
            i += 1
        if i >= n:
            continue
        rest = rawline[i:]
        colon = rest.find(":")
        if colon < 0:
            continue
        field = rest[:colon]
        value = rest[colon + 1:].lstrip(" \t")
        out.append((field.lower(), value))
    return out


def _ua_matches(value: str, ua: str, substring: bool) -> bool:
    v = value
    # strip trailing '#' comment then trailing whitespace (XmlDoc.cpp:14862-68)
    hashpos = v.find("#")
    if hashpos >= 0:
        v = v[:hashpos]
    v = v.rstrip(_SPACE)
    if not substring and len(v) != len(ua):
        return False
    m = min(len(v), len(ua))
    return v[:m].lower() == ua[:m].lower()


def _collect_pass(lines, ua: str, substring: bool, crawl_delay: int):
    """One isAllowed2 pass, collecting the effective Disallow prefixes
    instead of matching a path.  Returns (patterns, ua_found, had_rules,
    delay).  Equivalent to the reference's per-url pass because Disallow
    matches only ever flip allowed→False — the verdict for any path is
    "no collected prefix matches" regardless of rule order."""
    patterns: list[str] = []
    ua_found = False
    had_rules = False
    delay = crawl_delay
    i = 0
    n = len(lines)
    while i < n:
        field, value = lines[i]
        i += 1
        if field != "user-agent":
            continue
        if not _ua_matches(value, ua, substring):
            continue
        ua_found = True
        flag = False
        # group scan
        while i < n:
            field, value = lines[i]
            i += 1
            if flag and field == "user-agent":
                # re-dispatch: outer loop must reconsider this line
                i -= 1
                break
            if field == "crawl-delay":
                flag = True
                if value and (value[0].isdigit() or value[0] == "."):
                    try:
                        num = value.split()[0]
                        # atof stops at first non-numeric char
                        j = 0
                        seen_dot = False
                        while j < len(num) and (
                            num[j].isdigit() or (num[j] == "." and not seen_dot)
                        ):
                            if num[j] == ".":
                                seen_dot = True
                            j += 1
                        vv = int(float(num[:j] or "0") * 1000)
                        delay = min(max(vv, -1), 0x7FFFFFFF)
                    except ValueError:
                        pass
                continue
            if field == "allow":
                had_rules = True
                flag = True
                continue
            if field == "sitemap":
                flag = True
                continue
            if field != "disallow":
                continue
            had_rules = True
            flag = True
            # value stops at first whitespace
            v = value
            for k, ch in enumerate(v):
                if ch in _SPACE:
                    v = v[:k]
                    break
            if not v:
                continue
            patterns.append(v)
    return patterns, ua_found, had_rules, delay


def effective_rules(
    robots_txt: str | None,
    user_agent: str = DEFAULT_USER_AGENT,
    http_status: int = 200,
) -> tuple[list[str], int]:
    """Parse ONCE per (robots body, UA): the effective Disallow-prefix list
    + raw crawl delay after the reference's two-pass UA dispatch
    (XmlDoc.cpp:15244-15296).  This is the per-host robots cache unit —
    the reference caches parsed robots per host for 24h (Msg13.cpp:590);
    the Spark pipeline materializes this per distinct host so the per-URL
    check is prefix matching only, never re-parsing."""
    if http_status != 200 or robots_txt is None or len(robots_txt) == 0:
        return [], -1
    lines = _parse_lines(robots_txt)
    patterns, ua_found, had_rules, delay = _collect_pass(
        lines, user_agent, True, -1
    )
    saved_delay = delay
    if not ua_found or not had_rules:
        patterns, _, _, delay = _collect_pass(lines, "*", False, delay)
    if saved_delay != -1:
        delay = saved_delay
    return patterns, delay


def match_path(patterns: list[str], path_cgi: str) -> bool:
    """Disallow prefix match (case-insensitive; a value not starting with
    ``/`` matches against the path minus its leading ``/``).  True =
    allowed."""
    for v in patterns:
        subject = path_cgi
        if v[0] != "/":
            subject = subject[1:]
        if len(v) > len(subject):
            continue
        if subject[: len(v)].lower() == v.lower():
            return False
    return True


def check(
    robots_txt: str | None,
    path_cgi: str,
    user_agent: str = DEFAULT_USER_AGENT,
    http_status: int = 200,
) -> RobotsVerdict:
    """Two-pass allow check + crawl delay (XmlDoc.cpp:15244-15296)."""
    patterns, delay = effective_rules(robots_txt, user_agent, http_status)
    return RobotsVerdict(match_path(patterns, path_cgi), delay)


def final_crawl_delay_ms(raw_delay_ms: int) -> int:
    """Scheduler-facing delay: default 250 ms, cap 60 s."""
    d = raw_delay_ms if raw_delay_ms >= 0 else DEFAULT_CRAWL_DELAY_MS
    return min(d, MAX_CRAWL_DELAY_MS)
