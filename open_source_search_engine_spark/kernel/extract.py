"""HTML tokenization, visible-text extraction, and link harvesting with the
reference engine's exact semantics.

Reference behaviours reimplemented (not copied):
- tokenizer        Xml::set (Xml.cpp:231-655) + XmlNode::set
                   (XmlNode.cpp:212-335), getTagLen (XmlNode.cpp:337-430),
                   comment/CDATA nodes (XmlNode.cpp:430-530), isTagStart
                   (XmlNode.h:102-142); quote/comment-aware <script> body
                   scan producing a single invisible scriptText node
                   (Xml.cpp:428-640, version>120 rules)
- tag property table  g_nodes[] (XmlNode.cpp:16-300): (hasBackTag,
                   isBreaking, isVisible) per tag; unknown tags behave as
                   breaking/visible/back-tagged (XmlNode.cpp:713-719)
- visible text     Xml::getText (Xml.cpp:665-843), includeTags=false,
                   filter-spaces off: breaking tags emit "\\n\\n" once the
                   buffer is non-empty (even inside invisible sections —
                   the tag branch runs before the notVisible check), text
                   inside SCRIPT/STYLE/SELECT/MARQUEE/NOSCRIPT/ITEM/ENTRY/
                   CHANNEL/ENCLOSURE suppressed via a front/back counter,
                   entities NOT decoded, trailing ASCII whitespace stripped
- links            Links::set (Linkdb.cpp:4980-5372) + addLink: tags
                   A/LINK/LOC/AREA/ENCLOSURE/WEBLOG/URLFROM/FBORIGLINK,
                   rel=nofollow flagging, javascript: onclick-popup salvage,
                   mailto:/#-skip, <link>url</link> + CDATA bodies, RSS type
                   detection, entity decode, space→%20/+ fixups, resolution
                   against <base href> with stripCommonFile=true
- attributes       XmlNode::getFieldValue (XmlNode.cpp:531-610)

All functions are pure (str in → values out) so they can be wrapped in
Arrow-batched pandas UDFs (functions/udfs.py).  Byte parity is asserted by
tests/test_extract.py fixtures.
"""

from __future__ import annotations

from typing import NamedTuple

from . import urlnorm

# (hasBackTag, isBreaking, isVisible) extracted facts from g_nodes[]
# (XmlNode.cpp:16-300); names lowercased for lookup.
TAG_PROPS: dict[str, tuple[bool, bool, bool]] = {
    "a": (1, 0, 1), "abbrev": (1, 1, 1), "acronym": (1, 1, 1),
    "address": (1, 1, 1), "applet": (1, 1, 1), "area": (0, 1, 1),
    "au": (1, 1, 1), "author": (1, 1, 1), "b": (1, 0, 1),
    "banner": (1, 1, 1), "base": (0, 1, 1), "basefont": (0, 1, 1),
    "bgsound": (0, 1, 1), "big": (1, 0, 1), "blink": (1, 0, 1),
    "blockquote": (1, 1, 1), "bq": (1, 1, 1), "body": (1, 1, 1),
    "br": (0, 1, 1), "caption": (1, 1, 1), "center": (1, 1, 1),
    "cite": (1, 1, 1), "code": (1, 1, 1), "col": (1, 1, 1),
    "colgroup": (1, 1, 1), "credit": (1, 1, 1), "del": (1, 1, 1),
    "dfn": (1, 1, 1), "dir": (1, 1, 1), "div": (1, 1, 1),
    "dl": (1, 1, 1), "dt": (1, 1, 1), "dd": (1, 1, 1), "em": (1, 0, 1),
    "embed": (0, 1, 1), "fig": (1, 1, 1), "fn": (1, 1, 1),
    "font": (1, 0, 1), "form": (1, 1, 1), "frame": (1, 1, 1),
    "frameset": (1, 1, 1), "h1": (1, 1, 1), "h2": (1, 1, 1),
    "h3": (1, 1, 1), "h4": (1, 1, 1), "h5": (1, 1, 1), "h6": (1, 1, 1),
    "head": (1, 1, 1), "hr": (0, 1, 1), "html": (1, 1, 1), "i": (1, 0, 1),
    "iframe": (1, 1, 1), "img": (0, 1, 1), "input": (0, 1, 1),
    "ins": (1, 1, 1), "isindex": (0, 1, 1), "kbd": (1, 1, 1),
    "lang": (1, 1, 1), "lh": (1, 1, 1), "li": (1, 1, 1), "link": (0, 1, 1),
    "listing": (1, 1, 1), "map": (1, 1, 1), "marquee": (1, 1, 0),
    "math": (1, 1, 1), "menu": (1, 1, 1), "meta": (0, 1, 1),
    "multicol": (0, 1, 1), "nobr": (1, 0, 1), "noframes": (1, 1, 1),
    "note": (1, 1, 1), "ol": (1, 1, 1), "overlay": (0, 1, 1),
    "p": (0, 1, 1), "param": (0, 1, 1), "person": (1, 1, 1),
    "plaintext": (1, 1, 1), "pre": (1, 1, 1), "q": (1, 1, 1),
    "range": (0, 1, 1), "samp": (1, 1, 1), "script": (1, 1, 0),
    "select": (1, 1, 0), "small": (1, 0, 1), "spacer": (0, 1, 1),
    "spot": (0, 1, 1), "strike": (1, 1, 1), "strong": (1, 0, 1),
    "sub": (1, 0, 1), "sup": (1, 0, 1), "tab": (0, 1, 1),
    "table": (1, 1, 1), "tbody": (1, 1, 1), "td": (1, 1, 1),
    "textarea": (1, 1, 1), "textflow": (0, 1, 1), "tfoot": (0, 1, 1),
    "th": (1, 1, 1), "thead": (0, 1, 1), "title": (1, 1, 1),
    "tr": (1, 1, 1), "tt": (1, 1, 1), "u": (1, 0, 1), "ul": (1, 0, 1),
    "var": (1, 1, 1), "wbr": (0, 1, 1), "xmp": (1, 1, 1),
    "option": (0, 1, 1), "style": (1, 1, 0), "doctype": (0, 1, 1),
    "xml": (0, 1, 1), "start": (0, 1, 1), "stop": (0, 1, 1),
    "span": (1, 0, 1), "legend": (1, 1, 1), "s": (1, 1, 1),
    "abbr": (1, 0, 1), "noscript": (1, 1, 0), "fieldset": (1, 1, 1),
    "feedburner:origlink": (0, 1, 1), "rdf:rdf": (0, 1, 1),
    "rss": (0, 1, 1), "feed": (0, 1, 1), "item": (1, 1, 0),
    "entry": (1, 1, 0), "channel": (1, 1, 0), "enclosure": (1, 1, 0),
    "weblog": (0, 1, 0), "gbframe": (1, 1, 1), "tc": (1, 1, 1),
    "button": (1, 1, 1), "urlfrom": (0, 1, 1), "loc": (0, 1, 1),
}

LINK_TAGS = frozenset(
    ["a", "link", "loc", "area", "enclosure", "weblog", "urlfrom",
     "feedburner:origlink"]
)

_SPACE = " \t\n\v\f\r"

# common named entities for htmlDecode parity (Entities.cpp subset; the
# synthetic corpus only uses these + numeric forms)
_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "copy": "©", "reg": "®", "trade": "™",
    "mdash": "—", "ndash": "–", "hellip": "…",
    "lsquo": "‘", "rsquo": "’", "ldquo": "“",
    "rdquo": "”", "eacute": "é", "egrave": "è",
    "agrave": "à", "uuml": "ü", "ouml": "ö",
    "auml": "ä", "szlig": "ß", "ccedil": "ç",
    "ntilde": "ñ", "pound": "£", "euro": "€",
    "cent": "¢", "sect": "§", "para": "¶",
    "middot": "·", "laquo": "«", "raquo": "»",
    "times": "×", "divide": "÷", "deg": "°",
}


class Node(NamedTuple):
    kind: str           # 'text' | 'tag' | 'comment' | 'comment2' | 'cdata'
                        # | 'scripttext'
    name: str           # lowercase tag name ('' for text/scripttext)
    is_front: bool
    has_back: bool
    breaking: bool
    visible: bool
    start: int
    end: int            # exclusive


def _is_alnum(c: str) -> bool:
    return ("a" <= c <= "z") or ("A" <= c <= "Z") or ("0" <= c <= "9")


def _is_tagname_char(c: str) -> bool:
    return _is_alnum(c) or c in "-_:"


def _is_tag_start(s: str, i: int) -> bool:
    """isTagStart (XmlNode.h:102-142)."""
    n = len(s)
    if s[i] != "<" or i + 1 >= n:
        return False
    c1 = s[i + 1]
    if _is_alnum(c1) and c1.isascii():
        return True
    if c1 == "/":
        if i + 2 < n and (_is_alnum(s[i + 2]) or s[i + 2] == ">"):
            return True
        return False
    if c1 == "?":
        return i + 2 < n and _is_alnum(s[i + 2])
    if c1 == "!":
        if i + 2 < n and _is_alnum(s[i + 2]):
            return True
        if s[i + 2: i + 9] == "[CDATA[":
            return True
        if s[i + 2: i + 4] == "--":
            return True
        if i + 2 < n and s[i + 2] == "[":
            return True
    return False


def _tag_len(s: str, i: int) -> int:
    """getTagLen (XmlNode.cpp:337-430): quote-aware scan for '>'."""
    n = len(s)
    j = i + 1
    while j < n:
        c = s[j]
        if c == "<":
            break
        if c == ">":
            break
        if c == '"':
            # quote only honoured if preceded (modulo spaces) by '='
            k = j - 1
            while k > i + 1 and s[k] in _SPACE:
                k -= 1
            if k <= i + 1 or s[k] != "=":
                j += 1
                continue
            j += 1
            while j < n and s[j] != '"':
                if s[j] == ">" and s[j - 1] == '"':
                    j -= 1
                    break
                if s[j] == ">" and s[j - 1] == " " and j >= 2 and \
                        s[j - 2] == '"':
                    j -= 1
                    break
                j += 1
            if j >= n:
                return j - i
            if j + 1 < n and s[j + 1] == '"':
                j += 1
            j += 1
            continue
        if c == "'":
            if s[j - 1] != "=" and s[j - 1] not in _SPACE:
                j += 1
                continue
            j += 1
            while j < n and s[j] != "'":
                j += 1
            j += 1
            continue
        j += 1
    if j < n and s[j] == ">":
        return j + 1 - i
    # no closure outside quotes: stringent rescan
    j = i + 1
    while j < n and s[j] != ">" and s[j] != "<":
        j += 1
    if j < n and s[j] == ">":
        j += 1
    return j - i


def _comment_len(s: str, i: int) -> int:
    """setCommentNode: scan for '-->' (XmlNode.cpp:430-458)."""
    n = len(s)
    j = i + 3
    while j < n:
        if s[j] == ">" and s[j - 1] == "-" and s[j - 2] == "-":
            return j + 1 - i
        j += 1
    return n - i


def _comment2_len(s: str, i: int) -> int:
    """setCommentNode2: '<![if ...]>' → ']>' or '-->' (XmlNode.cpp:460-489)."""
    n = len(s)
    j = i + 2
    while j < n:
        if s[j] == ">" and (s[j - 1] == "]" or
                            (s[j - 1] == "-" and j >= 2 and s[j - 2] == "-")):
            return j + 1 - i
        j += 1
    return n - i


def _cdata_len(s: str, i: int) -> int:
    """setCDATANode: scan for ']]>' (XmlNode.cpp:491-529)."""
    n = len(s)
    j = i + 8
    while j < n:
        if s[j] == "]" and s[j + 1: j + 3] == "]>":
            return j + 3 - i
        j += 1
    return n - i


def _script_body_len(s: str, i: int) -> int:
    """Quote/comment-aware scan for </script>, <script, or </gbframe
    (Xml.cpp:428-640, version>120)."""
    n = len(s)
    p = i
    in_d = in_s = c1 = c2 = c3 = c4 = escaped = False
    while p < n:
        c = s[p]
        if c in "\n\r":
            c1 = False
        if c == "\\":
            escaped = not escaped
            p += 1
            continue
        if c == "<" and s[p + 1: p + 4] == "!--" and not (
            in_s or in_d or c1 or c2 or c4
        ):
            c3 = True
        if c == "-" and s[p + 1: p + 3] == "->" and c3:
            c3 = False
        if c == "/" and p + 1 < n and s[p + 1] == "/" and not (
            in_s or in_d or c2 or c3 or c4
        ):
            c1 = True
        if c == "/" and p + 1 < n and s[p + 1] == "*" and not (
            in_s or in_d or c1 or c3 or c4
        ):
            c2 = True
        if c == "<" and s[p + 1: p + 9] == "![CDATA[":
            c4 = True
        if c == "]" and s[p + 1: p + 3] == "]>":
            c4 = False
        if c == "*" and p + 1 < n and s[p + 1] == "/" and not c4:
            c2 = False
        if c1:
            escaped = False
        if c2 or c3 or c4:
            escaped = False
            p += 1
            continue
        if c == '"' and not escaped and not in_s and not c1:
            in_d = not in_d
        if c == "'" and not escaped and not in_d and not c1:
            in_s = not in_s
        escaped = False
        if c != "<":
            p += 1
            continue
        nxt = s[p + 1: p + 8].lower()
        if s[p + 1: p + 2] == "/":
            nxt2 = s[p + 2: p + 8].lower()
            if nxt2.startswith("script"):
                if (in_d or in_s):
                    p += 1
                    continue
                break
            if nxt2.startswith("gbfram"):
                break
        if nxt.startswith("script"):
            if in_d or in_s:
                p += 1
                continue
            break
        p += 1
    return p - i


def tokenize(html: str) -> list[Node]:
    """Xml::set node loop (html mode, current version)."""
    nodes: list[Node] = []
    n = len(html)
    i = 0
    while i < n:
        c = html[i]
        if html.startswith("<![CDATA[", i):
            ln = _cdata_len(html, i)
            nodes.append(Node("cdata", "![cdata[", True, False, True, True,
                              i, i + ln))
            i += ln
            continue
        if c != "<" or not _is_tag_start(html, i):
            j = i + 1
            while j < n and not (html[j] == "<" and _is_tag_start(html, j)):
                j += 1
            nodes.append(Node("text", "", True, False, False, True, i, j))
            i = j
            continue
        if html[i + 1: i + 2] == "!":
            if html[i + 2: i + 4] == "--":
                ln = _comment_len(html, i)
                nodes.append(Node("comment", "!--", True, False, True, True,
                                  i, i + ln))
                i += ln
                continue
            if html[i + 2: i + 3] == "[":
                ln = _comment2_len(html, i)
                nodes.append(Node("comment2", "![", True, False, False,
                                  False, i, i + ln))
                i += ln
                continue
        ln = _tag_len(html, i)
        # tag name: skip one non-alnum char after '<' ('/', '?', '!')
        ts = i + 1
        if ts < i + ln and not _is_alnum(html[ts]):
            ts += 1
        te = ts
        while te < i + ln and _is_tagname_char(html[te]):
            te += 1
        name = html[ts:te].lower()
        props = TAG_PROPS.get(name)
        if props is None:
            has_back, breaking, visible = True, True, True  # xmlTag default
        else:
            has_back, breaking, visible = (bool(props[0]), bool(props[1]),
                                           bool(props[2]))
        # '/>' or '?>' ending → no back tag
        if ln >= 2 and html[i + ln - 2] in "/?":
            has_back = False
        is_front = html[i + 1] != "/"
        nodes.append(Node("tag", name, is_front, has_back, breaking,
                          visible, i, i + ln))
        i += ln
        # script front tag → consume raw body as one scriptText node
        if name == "script" and is_front:
            bl = _script_body_len(html, i)
            if bl > 0:
                nodes.append(Node("scripttext", "", True, False, False,
                                  False, i, i + bl))
                i += bl
    # trim trailing empty node (Xml.cpp:643-645)
    if nodes and nodes[-1].start == nodes[-1].end:
        nodes.pop()
    return nodes


def get_text(html: str) -> str:
    """Xml::getText, includeTags=false, filterSpaces=false (Xml.cpp:665-843).

    Byte-identical target for the `text` column of the pages table.
    """
    out: list[str] = []
    size = 0
    not_visible = 0
    for nd in tokenize(html):
        is_tag = nd.kind in ("tag", "comment", "comment2", "cdata",
                             "scripttext")
        if nd.kind == "tag" and not nd.visible and nd.has_back:
            if nd.is_front:
                not_visible += 1
            else:
                not_visible = max(0, not_visible - 1)
        if is_tag:
            if size == 0:
                continue
            if not nd.breaking:
                continue
            out.append("\n\n")
            size += 2
            continue
        if not_visible:
            continue
        out.append(html[nd.start: nd.end])
        size += nd.end - nd.start
    text = "".join(out)
    return text.rstrip(_SPACE)


def html_decode(s: str) -> str:
    """htmlDecode, doSpecial=false (fctypes.cpp:1217-1300): decode known
    named + numeric entities; unknown '&' copied verbatim."""
    if "&" not in s:
        return s
    out: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c != "&":
            out.append(c)
            i += 1
            continue
        # numeric?
        if s[i + 1: i + 2] == "#":
            j = i + 2
            if s[j: j + 1] in ("x", "X"):
                k = j + 1
                while k < n and s[k] in "0123456789abcdefABCDEF":
                    k += 1
                if k > j + 1 and s[k: k + 1] == ";":
                    out.append(chr(int(s[j + 1: k], 16)))
                    i = k + 1
                    continue
            else:
                k = j
                while k < n and s[k].isdigit():
                    k += 1
                if k > j and s[k: k + 1] == ";":
                    out.append(chr(int(s[j: k])))
                    i = k + 1
                    continue
            out.append(c)
            i += 1
            continue
        j = i + 1
        k = j
        while k < n and k < j + 10 and s[k].isalnum():
            k += 1
        name = s[j: k]
        if s[k: k + 1] == ";" and name.lower() in _ENTITIES:
            out.append(_ENTITIES[name.lower()])
            i = k + 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def get_attr(tag_text: str, field: str) -> str | None:
    """XmlNode::getFieldValue (XmlNode.cpp:531-610)."""
    n = len(tag_text)
    flen = len(field)
    fl = field.lower()
    in_q = ""
    i = 1
    found = -1
    while i + flen < n:
        c = tag_text[i]
        if in_q:
            if c == in_q:
                in_q = ""
            i += 1
            continue
        if c in "\"'":
            in_q = c
            i += 1
            continue
        if _is_alnum(tag_text[i - 1]):
            i += 1
            continue
        after = tag_text[i + flen: i + flen + 1]
        if after != "=" and after not in _SPACE:
            i += 1
            continue
        if tag_text[i: i + flen].lower() != fl:
            i += 1
            continue
        found = i
        break
    if found < 0:
        return None
    i = found + flen
    while i < n and tag_text[i] in _SPACE:
        i += 1
    if i >= n or tag_text[i] != "=":
        return None
    i += 1
    while i < n and tag_text[i] in _SPACE:
        i += 1
    in_q = ""
    if i < n and tag_text[i] in "\"'":
        in_q = tag_text[i]
        i += 1
    start = i
    if in_q:
        while i < n and tag_text[i] != in_q:
            i += 1
    else:
        while i < n and tag_text[i] not in _SPACE and tag_text[i] != ">":
            i += 1
    return tag_text[start:i]


class Link(NamedTuple):
    url: str
    nofollow: bool
    tag: str
    is_rss: bool


def _fix_spaces(link: str) -> str:
    """addLink space fixup: %20 before '?', '+' after (Linkdb.cpp)."""
    if " " not in link or ">" in link:
        return link
    out: list[str] = []
    hit_q = False
    for c in link:
        if c == "?":
            hit_q = True
        if c != " ":
            out.append(c)
        elif hit_q:
            out.append("+")
        else:
            out.append("%20")
    return "".join(out)


def extract_links(html: str, base_url: str) -> list[Link]:
    """Links::set semantics over the tokenized page."""
    nodes = tokenize(html)
    # find <base href> (Xml/XmlDoc pass it in as baseUrl)
    base = base_url
    for nd in nodes:
        if nd.kind == "tag" and nd.name == "base" and nd.is_front:
            b = get_attr(html[nd.start: nd.end], "href")
            if b:
                rb = urlnorm.canonicalize(html_decode(b))
                if rb:
                    base = rb
            break
    links: list[Link] = []
    for idx, nd in enumerate(nodes):
        if nd.kind != "tag" or nd.name not in LINK_TAGS or not nd.is_front:
            continue
        tag_text = html[nd.start: nd.end]
        urlattr = "url" if nd.name == "weblog" else "href"
        nofollow = False
        rel = get_attr(tag_text, "rel")
        if rel is not None and rel.lower() == "nofollow":
            nofollow = True
        link = get_attr(tag_text, urlattr) or ""
        if not link and nd.name in ("link", "loc", "urlfrom",
                                    "feedburner:origlink"):
            # <link> url </link> body form (Linkdb.cpp:5170-5198)
            if tag_text[-2:-1] == "/":
                continue
            if idx + 2 >= len(nodes):
                continue
            back = nodes[idx + 2]
            if back.kind != "tag" or back.name != nd.name or back.is_front:
                continue
            mid = nodes[idx + 1]
            link = html[mid.start: mid.end]
            if mid.kind == "cdata" or (
                len(link) > 12 and link[:9].lower() == "<![cdata["
            ):
                link = link[9:-3]
        if not link:
            continue
        link = link.lstrip(_SPACE)
        if not link:
            continue
        if link[:11].lower() == "javascript:":
            # onclick-popup salvage (Linkdb.cpp:5210-5238)
            oc = get_attr(tag_text, "onclick")
            if not oc:
                continue
            pos = oc.find("'/")
            if pos < 0:
                continue
            end = oc.find("'", pos + 1)
            if end < 0:
                end = len(oc)
            link = oc[pos + 1: end]
        if not link or link[0] == "#":
            continue
        if link[:7].lower() == "mailto:":
            continue
        # protocol check: only http/https pass (Linkdb.cpp:5250-5276)
        p = 0
        pmax = min(20, len(link))
        while p < pmax and (_is_alnum(link[p]) or link[p] == "-"):
            p += 1
        if p < pmax and link[p] == ":":
            proto = link[:p].lower()
            if proto not in ("http", "https"):
                continue
        if len(link) > urlnorm.MAX_URL_LEN:
            continue
        # RSS type detection
        is_rss = False
        ltype = get_attr(tag_text, "type")
        if ltype:
            tl = ltype.lower()
            if tl.startswith("application/atom+xml") or \
                    tl.startswith("application/rss+xml") or \
                    tl.startswith("text/xml"):
                is_rss = True
        if is_rss and rel is not None and not rel.lower().startswith(
            "alternate"
        ):
            is_rss = False
        if rel is not None and (rel.lower().startswith("replies") or
                                rel.lower().startswith("edit")):
            continue
        link = html_decode(link)
        link = _fix_spaces(link)
        # resolve + canonicalize with stripCommonFile=true (addLink)
        if link[:7].lower() in ("http://", "https:/") or \
                link[:6].lower() == "ftp://":
            resolved = urlnorm.canonicalize(
                link, strip_common_file=True
            )
        else:
            resolved = _resolve_with_common_strip(base, link)
        if not resolved:
            continue
        host = urlnorm.get_host(resolved)
        if not host:
            continue
        if not urlnorm._looks_like_ip(host) and not urlnorm.get_tld(host):
            continue
        links.append(Link(resolved, nofollow, nd.name, is_rss))
    return links


def _resolve_with_common_strip(base: str, href: str) -> str:
    resolved = urlnorm.resolve_relative(base, href)
    if not resolved:
        return ""
    return urlnorm.canonicalize(resolved, strip_common_file=True)


def dedup_links(links: list[Link]) -> list[Link]:
    """Per-page outlink dedup by link hash (XmlDoc.cpp:27682-27688)."""
    seen: set[str] = set()
    out: list[Link] = []
    for ln in links:
        if ln.url in seen:
            continue
        seen.add(ln.url)
        out.append(ln)
    return out
