"""Contact-info / street-address page predicates.

The reference's `hascontactinfo` / `hasaddress` url-filter keywords
(Spider.cpp:11770,11787) read bits the indexer sets from page content:
`XmlDoc::getHasContactInfo` (XmlDoc.cpp:12985) counts contact addresses
and "official" e-mail addresses (`getNumOfficialEmails`,
XmlDoc.cpp:13366, which scans mailto: links and text e-mails), and
`m_hasAddress` comes from the Address.cpp US-street-address parser
(number + street word + suffix).

This rebuild models both as DETERMINISTIC REGEX PREDICATES over the
extracted page text, defined ONCE here with patterns restricted to the
regex subset that behaves identically in Python `re` and Java
(Spark `rlike`): character classes, bounded repetition, alternation —
no lookaround, no unicode classes.  The Python functions are the oracle
twins of functions/filters.py's Column versions; tests assert row-level
equality on the synthetic web corpus.

Deviation from the reference (documented in COVERAGE.md): the reference
additionally consults tagdb (`hascontactinfo` site tags) and restricts
the scan to "contacty" pages (getIsContacty link-text hashes,
XmlDoc.cpp:13068+); with no tagdb in this rebuild the bits are derived
from page content alone, on every fetched page.
"""

from __future__ import annotations

import re

# e-mail: local@domain.tld — ASCII subset (the reference scans for '@'
# runs with alnum boundaries, XmlDoc.cpp:13699-13740 mailto handling)
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,6}"

# phone: NANP-ish 3-3-4 with separators, optional +1 / (area)
PHONE_RE = (r"(\+?1[-. ])?(\([0-9]{3}\)[-. ]?|[0-9]{3}[-. ])"
            r"[0-9]{3}[-. ][0-9]{4}")

# mailto: link target in the raw html/text; (?i) inline flag — identical
# spelling in Python `re` and Java regex (rlike takes no flag argument)
MAILTO_RE = r"(?i)mailto:"

# street address: house number + 1-2 words + street-suffix word
# (Address.cpp suffix table subset: the common US suffixes)
_SUFFIXES = ("street|st|avenue|ave|road|rd|boulevard|blvd|drive|dr|"
             "lane|ln|way|court|ct|suite|plaza|place|pl|parkway|pkwy")
ADDRESS_RE = (r"(?i)[0-9]{1,5} ([a-zA-Z]+ ){1,2}(" + _SUFFIXES + r")\b")

_EMAIL = re.compile(EMAIL_RE)
_PHONE = re.compile(PHONE_RE)
_MAILTO = re.compile(MAILTO_RE)
_ADDRESS = re.compile(ADDRESS_RE)


def has_contact_info(text: str | None) -> bool:
    """m_hasContactInfo analog (XmlDoc.cpp:12985): the page carries an
    e-mail address, a mailto: link, or a phone number."""
    if not text:
        return False
    return bool(_EMAIL.search(text) or _MAILTO.search(text)
                or _PHONE.search(text))


def has_address(text: str | None) -> bool:
    """m_hasAddress analog (Address.cpp parser, bit consumed at
    Spider.cpp:11787): the page carries a street-address-shaped run."""
    if not text:
        return False
    return bool(_ADDRESS.search(text))
