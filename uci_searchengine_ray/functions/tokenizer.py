"""Tokenizers.

Reference semantics (conformance contract, SURVEY.md §1.4):
  - canonical tokenizer: reference ``backend/app/api/tokenizer.py:5-9`` —
    lowercase, replace ``[^\\w\\s]`` with space, collapse whitespace, split.
  - crawler twin: reference ``backend/app/api/crawler.py:420-421`` —
    ``[w.lower() for w in re.findall(r"\\w+", text)]``.
  Both produce the identical token sequence (property-tested in
  tests/test_tokenizer.py); this module implements the shared semantics once as
  ``tokenize_reference`` (findall on the lowered text).

Code mode (north-star axes A+B, not in the reference): camelCase / snake_case /
digit-boundary sub-token splitting, lowercasing, stopword filtering.

All functions are pure; batch-level vectorized wrappers live in
stages/tokenize.py.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, List

# reference ``tokenize`` lowers first, then treats every \w run as a token.
_WORD_RE = re.compile(r"\w+", re.UNICODE)

# camelCase / UPPERCASE-run / lowercase / digit-run splitter applied to each
# raw \w token.  Handles:  camelCase -> camel Case;  HTTPServer -> HTTP Server;
# snake_case -> snake case (underscore is not matched);  abc123 -> abc 123.
# Non-ASCII word characters are kept together as one sub-token run.
_SUBTOKEN_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|\d+|[^\W\da-zA-Z_]+")

# Small fixed English/code stopword list for code mode (deterministic; keep in
# sync with oracle_sql()'s stopword list in __ray_entry__.py).
STOPWORDS = frozenset(
    """a an and are as at be by for from in is it of on or that the this to was
    with""".split()
)


def tokenize_reference(text: str) -> List[str]:
    """Exact reference tokenization (tokenizer.py:5-9 ≡ crawler.py:420-421)."""
    return _WORD_RE.findall(text.lower())


def tokenize_code(text: str) -> List[str]:
    """Code-mode tokenization: \\w tokens split at camelCase / snake_case /
    digit boundaries, lowercased, stopwords removed.

    ONE findall over the whole text is exactly the per-\\w-token split
    concatenated: every _SUBTOKEN_RE alternative matches only word
    characters (never ``_``), so no match can span a non-\\w gap, and the
    ``(?![a-z])`` lookahead sees a non-letter at every raw-token boundary
    either way (raw tokens are maximal \\w runs).  Equivalence is pinned by
    a hypothesis property test; the per-raw-token loop cost ~2/3 of the
    tokenize stage (one findall call per word)."""
    return [
        low
        for low in map(str.lower, _SUBTOKEN_RE.findall(text))
        if low not in STOPWORDS
    ]


TOKENIZERS = {
    "reference": tokenize_reference,
    "code": tokenize_code,
}


def tokenize(text: str, mode: str = "reference") -> List[str]:
    return TOKENIZERS[mode](text)


def get_token_frequencies(tokens: List[str]) -> Dict[str, int]:
    """Per-doc TF map (reference tokenizer.py:12-16; crawler.py:427-430)."""
    return dict(Counter(tokens))


def process_text(text: str, mode: str = "reference") -> Dict[str, int]:
    """tokenize ∘ count (reference tokenizer.py:19-21)."""
    return get_token_frequencies(tokenize(text, mode))
