"""URL normalization / validation / link extraction kernels (SURVEY.md §2.2
M7-M11), re-expressed as pure functions for use inside map_batches / flat_map.

Semantics follow the reference:
  - normalize_url: crawler.py:384-397 — scheme://netloc/path, rstrip '/',
    lowercase; keep the query string only for .php/.aspx/.jsp paths or when it
    contains one of {id, article, page, p}.
  - strip_fragment_url: utils twin url_validator.py:27-38 (fragment + trailing
    slash removal, case-preserving).
  - is_allowed_domain: crawler.py:399-410 — netloc *contains* one of the
    allowed domains (the wired, permissive variant).
  - is_valid_url_strict: url_validator.py:40-93 — syntactic check + allowed
    domain suffix match (the stricter variant the reference tests target).
  - extract_links: crawler.py:240-256 — every <a href>, skip '#'/'mailto:',
    urljoin against the page URL, normalize, drop self-links, dedup.  Parsing
    uses a regex instead of BeautifulSoup (not available here, and the needed
    subset — href attributes — is regular).
"""

from __future__ import annotations

import re
from typing import List, Sequence
from urllib.parse import urljoin, urlparse

DEFAULT_ALLOWED_DOMAINS = (
    "uci.edu",
    "ics.uci.edu",
    "cs.uci.edu",
    "informatics.uci.edu",
    "stat.uci.edu",
)

STRICT_ALLOWED_SUFFIXES = (
    "ics.uci.edu",
    "cs.uci.edu",
    "informatics.uci.edu",
    "stat.uci.edu",
)

# the \s boundary before href stops matches on data-href/xlink:href
# attributes (which would capture the wrong URL and skip the real one)
_HREF_RE = re.compile(
    r"""<a\s(?:[^>]*?\s)?href\s*=\s*["']([^"']+)["']""", re.IGNORECASE
)
_URL_SYNTAX_RE = re.compile(r"^https?://[^\s/$.?#].[^\s]*$", re.IGNORECASE)


def normalize_url(url: str) -> str:
    parsed = urlparse(url)
    normalized = f"{parsed.scheme}://{parsed.netloc}{parsed.path}".rstrip("/").lower()
    if parsed.query and (
        any(parsed.path.endswith(ext) for ext in (".php", ".aspx", ".jsp"))
        or any(param in parsed.query for param in ("id", "article", "page", "p"))
    ):
        normalized += f"?{parsed.query}"
    return normalized


def strip_fragment_url(url: str) -> str:
    parsed = urlparse(url)
    base = f"{parsed.scheme}://{parsed.netloc}{parsed.path}".rstrip("/")
    if parsed.query:
        base += f"?{parsed.query}"
    return base


def is_allowed_domain(url: str, domains: Sequence[str] = DEFAULT_ALLOWED_DOMAINS) -> bool:
    netloc = urlparse(url).netloc
    return any(d in netloc for d in domains)


def is_valid_url_strict(
    url: str, suffixes: Sequence[str] = STRICT_ALLOWED_SUFFIXES
) -> bool:
    if not _URL_SYNTAX_RE.match(url or ""):
        return False
    netloc = urlparse(url).netloc.lower().split(":")[0]
    return any(netloc == s or netloc.endswith("." + s) for s in suffixes)


def extract_links(page_url: str, html: str) -> List[str]:
    """Ordered, deduped, normalized outgoing links of one page."""
    seen = set()
    out: List[str] = []
    src_norm = normalize_url(page_url)
    for href in _HREF_RE.findall(html or ""):
        if href.startswith("#") or href.startswith("mailto:"):
            continue
        absolute = urljoin(page_url, href)
        norm = normalize_url(absolute)
        if norm == src_norm or norm in seen:
            continue
        seen.add(norm)
        out.append(norm)
    return out


def canonical_doc_url(repo: str, path: str, commit: str) -> str:
    """Corpus analog of the reference's document URL: repo/path@commit."""
    return f"{repo}/{path}@{commit}"
