"""HTML → (title, text) extraction kernels (SURVEY.md §2.2 M1/M2).

The reference uses BeautifulSoup: drop <script>/<style>, ``soup.get_text()``,
title from ``<title>`` else the URL (crawler.py:200-202, 412-418).
BeautifulSoup is not in this container and the needed subset is regular, so
this is a regex implementation with the same observable behavior on
well-formed pages: script/style/comment removal, tag stripping, entity
decoding, and the reference's exact whitespace normalization (lines →
double-space phrase split → join non-empty chunks with a single space).
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import Optional, Tuple

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
# block-level tags become newlines so get_text()-style line structure survives
_BLOCK_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|footer)\b[^>]*>",
    re.IGNORECASE,
)


def extract_title(html: str, fallback: Optional[str] = None) -> str:
    m = _TITLE_RE.search(html or "")
    if m:
        t = _htmllib.unescape(_TAG_RE.sub("", m.group(1))).strip()
        if t:
            return t
    return fallback or ""


def extract_text(html: str) -> str:
    """Visible text with the reference's whitespace normalization
    (crawler.py:412-418): per line, split on double spaces, keep non-empty
    chunks, join with single spaces."""
    s = _COMMENT_RE.sub(" ", html or "")
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    lines = (line.strip() for line in s.splitlines())
    chunks = (phrase.strip() for line in lines for phrase in line.split("  "))
    return " ".join(chunk for chunk in chunks if chunk)


def parse_page(url: str, html: str) -> Tuple[str, str]:
    """(title, text) — title falls back to the URL (crawler.py:200-202)."""
    return extract_title(html, fallback=url), extract_text(html)
