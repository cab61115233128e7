"""HTML → (title, text) extraction kernels (SURVEY.md §2.2 M1/M2).

The reference parses with BeautifulSoup's "html.parser" backend, decomposes
<script>/<style>, calls ``soup.get_text()`` and normalizes whitespace
(crawler.py:200-202, 412-418).  ``get_text()`` flattens the tree into the
concatenation of its text nodes, so tree SHAPE never matters for the result
— only the stream of data events does.  This implementation therefore runs
the same stdlib ``html.parser.HTMLParser`` that bs4 wraps and concatenates
its ``handle_data`` events directly, skipping script/style CDATA content,
comments and declarations; malformed input (unclosed <script>, stray close
tags, tag-soup nesting, bogus comments) yields the same event stream — and
hence the same text — as the reference, without needing bs4 installed.

Deliberate deviations from ``soup.title.string`` (both pinned by tests):
the title is stripped, and a <title> whose ``.string`` would be ``None``
(missing / empty / element children inside) falls back to the URL — where
the reference would store ``None`` and crash its own log formatting
(crawler.py:204).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional, Tuple


class _TextExtractor(HTMLParser):
    """One-pass text + title extractor over html.parser events.

    ``convert_charrefs=True`` (the default) decodes entities inside data
    events exactly as bs4's NavigableStrings hold decoded text; script and
    style contents arrive as CDATA data events while ``_skip`` is set and
    are dropped (the reference decomposes those subtrees)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._chunks: List[str] = []
        self._title_chunks: List[str] = []
        # 0 = before first <title>, 1 = inside it, 2 = after it
        self._title_state = 0
        # bs4 .string is None unless the title has exactly one string child
        self._title_clean = True

    # -- tag events -------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in ("script", "style"):
            self._skip += 1
        if self._title_state == 0 and tag == "title":
            self._title_state = 1
        elif self._title_state == 1:
            self._title_clean = False  # element child inside <title>

    def handle_endtag(self, tag: str) -> None:
        if tag in ("script", "style") and self._skip:
            self._skip -= 1
        if tag == "title" and self._title_state == 1:
            self._title_state = 2

    # -- content events ---------------------------------------------------
    def handle_data(self, data: str) -> None:
        if not self._skip:
            self._chunks.append(data)
        if self._title_state == 1:
            self._title_chunks.append(data)

    # comments / doctype / bogus "<![CDATA[..]]>" declarations are not text
    # nodes in get_text() — ignore them (default handlers are no-ops)

    # -- results ----------------------------------------------------------
    def text(self) -> str:
        return "".join(self._chunks)

    def title(self) -> Optional[str]:
        if self._title_state == 0 or not self._title_clean:
            return None
        t = "".join(self._title_chunks).strip()
        return t or None


def _parse(html: str) -> _TextExtractor:
    p = _TextExtractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        # html.parser raises only on grossly invalid input; whatever was
        # fed before the error already produced its data events
        pass
    return p


def extract_title(html: str, fallback: Optional[str] = None) -> str:
    t = _parse(html).title()
    return t if t is not None else (fallback or "")


def _normalize(text: str) -> str:
    """The reference's whitespace normalization (crawler.py:412-418): per
    line, split on double spaces, keep non-empty chunks, join with single
    spaces."""
    lines = (line.strip() for line in text.splitlines())
    chunks = (phrase.strip() for line in lines for phrase in line.split("  "))
    return " ".join(chunk for chunk in chunks if chunk)


def extract_text(html: str) -> str:
    """Visible text with the reference's whitespace normalization."""
    return _normalize(_parse(html).text())


def parse_page(url: str, html: str) -> Tuple[str, str]:
    """(title, text) — title falls back to the URL (crawler.py:200-202);
    one parse serves both outputs."""
    parsed = _parse(html)
    t = parsed.title()
    return (t if t is not None else url, _normalize(parsed.text()))
