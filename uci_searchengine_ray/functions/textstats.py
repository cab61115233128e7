"""Text-analysis kernels for the large-scale training-data extras: language-ID
(n-gram/marker heuristic), quality scoring, token counting, fingerprinting.

These do not exist in the reference (it indexes everything it crawls); they are
first-class extras required for a 100 TB training-data pipeline.  Every formula
here is deliberately RE2/SQL-expressible so the driver's DuckDB oracle can
verify it exactly (see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from .tokenizer import STOPWORDS

# Marker-word lists per language, deterministic and tiny.  Prediction =
# argmax over marker-hit counts, ties broken by language code ascending,
# "und" (undetermined) when no marker hits at all.
LANG_MARKERS: Dict[str, Tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "que", "de", "los", "una", "por", "como"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour"),
}

_WORD_RE = re.compile(r"[a-z0-9_]+")
_PUNCT_RE = re.compile(r"[^A-Za-z0-9_\s]")
_WS_RE = re.compile(r"\S+")
_BPE_ISH_RE = re.compile(r"[a-z]+|[0-9]|[^a-z0-9\s]")  # RE2-safe GPT-ish split


def word_tokens(text: str) -> List[str]:
    """The shared [a-z0-9_]+ token stream every metric below derives from —
    tokenize once per doc and pass the list through (lang_quality used to
    run this findall three times per doc)."""
    return _WORD_RE.findall(text.lower())


def lang_scores_from_tokens(toks: List[str]) -> Dict[str, int]:
    return {
        lang: sum(1 for t in toks if t in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_scores(text: str) -> Dict[str, int]:
    return lang_scores_from_tokens(word_tokens(text))


def predict_from_scores(scores: Dict[str, int]) -> str:
    top = max(scores.values())
    if top == 0:
        return "und"
    # deterministic tie-break: highest count, then language code ascending
    return min(l for l, c in scores.items() if c == top)


def predict_lang(text: str) -> str:
    return predict_from_scores(lang_scores(text))


def quality_stats_from_tokens(text: str, toks: List[str]) -> Dict[str, float]:
    """Per-doc quality metrics (all SQL-expressible)."""
    n_chars = len(text)
    n_tokens = len(toks)
    n_punct = len(_PUNCT_RE.findall(text))
    n_stop = sum(1 for t in toks if t in STOPWORDS)
    total_tok_chars = sum(len(t) for t in toks)
    return {
        "n_chars": float(n_chars),
        "n_tokens": float(n_tokens),
        "punct_ratio": n_punct / n_chars if n_chars else 0.0,
        "stopword_ratio": n_stop / n_tokens if n_tokens else 0.0,
        "mean_token_len": total_tok_chars / n_tokens if n_tokens else 0.0,
    }


def quality_stats(text: str) -> Dict[str, float]:
    return quality_stats_from_tokens(text, word_tokens(text))


def token_counts(text: str) -> Dict[str, int]:
    low = text.lower()
    return {
        "ws_tokens": len(_WS_RE.findall(text)),
        "word_tokens": len(_WORD_RE.findall(low)),
        "bpe_ish_tokens": len(_BPE_ISH_RE.findall(low)),
    }


def shingles(tokens: List[str], k: int) -> List[str]:
    """Word k-shingles (space-joined).  Docs with fewer than k tokens yield
    NO shingles — matching the SQL oracle's adjacency-join formulation (a
    rn/rn+1/rn+2 self-join emits zero rows for short docs)."""
    if len(tokens) < k:
        return []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0
